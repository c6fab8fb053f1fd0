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

  test("ml_embedding_drift: Scala moment replay agrees on all 64 dims") {
    val sp = spark
    val rows = SparkEntry.queries("ml_embedding_drift")(sp, sf0001)
      .collect()
    assert(rows.length == 6 && rows.head.getLong(0) == 0L)
    val emb = Tables.embeddings(sp, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dims = 64
    val gaps = (0 until dims).map { d =>
      var sa = 0L; var sb = 0L; var na = 0L; var nb = 0L
      emb.foreach { case (id, e) =>
        val x = math.round(e(d).toDouble * 1000)
        if (id % 2 == 0) { sa += x; na += 1 } else { sb += x; nb += 1 }
      }
      (d + 1).toLong -> (1000L * math.abs(nb * sa - na * sb)) / (na * nb)
    }
    val expectedTot = gaps.map(g => g._2 * g._2).sum
    assert(rows.head.getLong(2) == expectedTot, "total gap^2 mismatch")
    val top5 = gaps.sortBy(g => (-g._2, g._1)).take(5)
    val gotTop = rows.tail.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotTop.sortBy(_._1) == top5.sortBy(_._1),
      s"top-5 drifted dims mismatch: got $gotTop expected $top5")
  }

  test("dq_pk_fk_discovery: true keys read 10000, planted non-key does not") {
    val rows = SparkEntry.queries("dq_pk_fk_discovery")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("containment_pm"))
      .toMap
    assert(rows.size == 6)
    Seq("lineitem.l_orderkey->orders.o_orderkey",
      "orders.o_custkey->customer.c_custkey",
      "lineitem.l_partkey->part.p_partkey",
      "customer.c_nationkey->nation.n_nationkey").foreach { k =>
      assert(rows(k) == 10000L, s"$k must be a full inclusion")
    }
    assert(rows("orders.o_custkey->nation.n_nationkey") < 10000L,
      "the planted non-dependency must not read as an FK")
    rows.values.foreach(v => assert(v >= 0 && v <= 10000))
  }
}
