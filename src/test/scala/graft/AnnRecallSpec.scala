package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality invariants on the recall-evaluation operator: multi-probe
  * LSH dominates single-probe per query (its candidate pool is a strict
  * superset, so exact-cosine ranking can only keep or gain true top-3
  * hits), and all recalls are valid fractions.
  */
class AnnRecallSpec extends AnyFunSuite with SparkFixture {

  test("multi-probe recall@3 dominates single-probe per query") {
    val rows = SparkEntry.queries("sim_ann_recall")(spark, sf001)
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val lsh = r.getDouble(1); val mp = r.getDouble(2); val ivf = r.getDouble(3)
      assert(mp >= lsh, s"query ${r.getLong(0)}: mp=$mp < lsh=$lsh")
      Seq(lsh, mp, ivf).foreach(x => assert(x >= 0.0 && x <= 1.0))
    }
    // and multi-probe should actually help somewhere on this corpus
    val gain = rows.map(r => r.getDouble(2) - r.getDouble(1)).sum
    assert(gain > 0.0, "multi-probe never improved recall — probe set broken?")
  }
}
