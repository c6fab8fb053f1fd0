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
}
