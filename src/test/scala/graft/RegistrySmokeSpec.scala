package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run end-to-end on sf0.001 and the flagship
  * entry must return rows (the driver's t1 smoke, run locally).
  */
class RegistrySmokeSpec extends AnyFunSuite with SparkFixture {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry keys are unique and oracle keys are a subset") {
    val keys = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(keys))
    assert(keys.size == SparkEntry.allQueries.size)
  }

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sf0001)
      assert(df.columns.nonEmpty)
      // Deterministic smoke: the query must execute without throwing.
      val n = df.count()
      assert(n >= 0)
    }
  }
}
