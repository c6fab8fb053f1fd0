package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic spec for win_ewma_irregular: independent driver-side replay
  * of the decay recursion plus structural invariants.
  */
class Round13fSpec extends AnyFunSuite with SparkFixture {

  test("win_ewma_irregular: driver replay agrees, bounds hold") {
    val sp = spark
    val got = SparkEntry.queries("win_ewma_irregular")(sp, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val ev = Tables.events(sp, sf0001)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(e => (e._3, e._2))
      var st = 0L; var prev = 0L; var mx = 0L; var n = 0
      sorted.foreach { case (_, _, tus, v) =>
        val vq = math.floor(v * 10000).toLong
        val dq = if (n == 0) 0L
          else math.floor(
            math.exp(-(tus - prev).toDouble / 3.6e9) * 10000).toLong
        st = vq + (dq * st) / 10000
        if (st > mx) mx = st
        prev = tus; n += 1
      }
      u -> ((n.toLong, st, mx))
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
    got.values.foreach { case (n, sFinal, sMax) =>
      assert(sFinal <= sMax && sMax > 0 && n >= 1)
    }
  }
}
