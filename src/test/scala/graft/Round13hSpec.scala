package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic specs for win_target_encoding and agg_markov_stationary. */
class Round13hSpec extends AnyFunSuite with SparkFixture {

  test("win_target_encoding: LOO never sees its own label") {
    val sp = spark
    val rows = SparkEntry.queries("win_target_encoding")(sp, sf0001)
      .collect()
    assert(rows.length == Tables.events(sp, sf0001).count())
    // recompute group stats independently and check the LOO identity
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (_, rs) =>
      val gn = rs.length.toLong
      val gp = rs.map(_.getAs[Long]("y")).sum
      rs.foreach { r =>
        val expected = 10000L * (gp - r.getAs[Long]("y")) / (gn - 1)
        assert(r.getAs[Long]("loo_pm") == expected)
      }
      // the two distinct encodings per group differ iff the group is
      // not label-pure: y=1 rows see a strictly lower rate
      val e1 = rs.filter(_.getAs[Long]("y") == 1L)
        .map(_.getAs[Long]("loo_pm")).distinct
      val e0 = rs.filter(_.getAs[Long]("y") == 0L)
        .map(_.getAs[Long]("loo_pm")).distinct
      if (e1.nonEmpty && e0.nonEmpty) assert(e1.head < e0.head)
    }
  }

  test("agg_markov_stationary: a probability vector that power-steps fix") {
    val rows = SparkEntry.queries("agg_markov_stationary")(spark, sf0001)
      .collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("stationary_pm")).sum
    // floor losses compound: each of 4 steps loses <1 pm per element
    // AND inherits the P-row normalization shortfall (≤4 pm per row,
    // compounding ~0.2%/step) — a full distribution minus ~1% at most
    assert(total <= 10000 && total > 9900,
      s"stationary vector must stay a distribution: $total")
    rows.foreach(r => assert(r.getAs[Long]("stationary_pm") > 0))
    val again = SparkEntry
      .queries("agg_markov_stationary")(spark, sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
