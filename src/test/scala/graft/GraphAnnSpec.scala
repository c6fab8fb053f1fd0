package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the graph-ANN family (sim_ann_graph + recall audit). */
class GraphAnnSpec extends AnyFunSuite with SparkFixture {

  test("sim_ann_graph: ranked shape, no self-hits, deterministic") {
    val sp = spark
    val rows = SparkEntry.queries("sim_ann_graph")(sp, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rs.length))
      rs.foreach { r =>
        assert(r.getAs[Long]("cand_id") != q, "query must not hit itself")
      }
      // ranks ordered by quantized cosine descending
      val cs = rs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("cos_q6"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val again = SparkEntry.queries("sim_ann_graph")(sp, sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sim_ann_recall_graph: one row per query, beam search beats chance") {
    val sp = spark
    val rows = SparkEntry.queries("sim_ann_recall_graph")(sp, sf0001)
      .collect()
    val nq = Tables.embeddings(sp, sf0001)
      .filter(col("vec_id") < 50).count()
    assert(rows.length == nq)
    val mean = rows.map(_.getAs[Double]("graph_recall_at_3")).sum /
      rows.length
    // random top-3 of a 50-vector corpus would land ~6%; the graph
    // search must do far better even at this tiny scale
    assert(mean > 0.25, s"graph search no better than chance: $mean")
    rows.foreach { r =>
      val v = r.getAs[Double]("graph_recall_at_3")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("mm_image_ssim: same-class pairs dominate cross-class controls") {
    val rows = SparkEntry.queries("mm_image_ssim")(spark, sf0001)
      .collect()
    assert(rows.length == 40)
    val byKind = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("ssim_pm"))).toMap
    assert(byKind("same_class").forall(_ > 9900),
      "same interference pattern must read near-identical")
    assert(byKind("cross_class").forall(_ < 2000),
      "different pattern classes must read dissimilar")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == 32L * 28L, "full pixel alignment")
      assert(r.getAs[Long]("lum_pm") <= 10000)
      assert(r.getAs[Long]("ssim_pm") <= 10000)
    }
  }
}
