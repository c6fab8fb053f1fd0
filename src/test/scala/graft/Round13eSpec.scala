package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic specs for sim_centroid_classifier and mix_anneal_schedule. */
class Round13eSpec extends AnyFunSuite with SparkFixture {

  test("sim_centroid_classifier: census partitions the holdout, determinism") {
    val sp = spark
    val rows = SparkEntry.queries("sim_centroid_classifier")(sp, sf0001)
      .collect()
    val hold = Tables.embeddings(sp, sf0001)
      .filter(col("vec_id") % 7 === 0 && col("vec_id") < 3500).count()
    assert(rows.map(_.getAs[Long]("n")).sum == hold)
    rows.foreach { r =>
      assert(r.getAs[Int]("y_true") >= 0 && r.getAs[Int]("y_true") <= 9)
      assert(r.getAs[Int]("y_pred") >= 0 && r.getAs[Int]("y_pred") <= 9)
      assert(r.getAs[Long]("n") >= 1)
    }
    // (y_true, y_pred) cells are unique and ordered
    val cells = rows.map(r =>
      (r.getAs[Int]("y_true"), r.getAs[Int]("y_pred")))
    assert(cells.distinct.length == cells.length)
    assert(cells.sameElements(cells.sorted))
    val again = SparkEntry.queries("sim_centroid_classifier")(sp, sf0001)
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mix_anneal_schedule: phase 0 follows inventory, phase 3 is uniform") {
    val sp = spark
    val rows = SparkEntry.queries("mix_anneal_schedule")(sp, sf0001)
      .collect()
    val nSources = Tables.documents(sp, sf0001)
      .select("source").distinct().count().toInt
    assert(rows.length == 4 * nSources)
    (0L to 3L).foreach { p =>
      val ph = rows.filter(_.getAs[Long]("phase") == p)
      assert(ph.length == nSources)
      // floor division: weights sum to at most 10000, within nSources
      val sw = ph.map(_.getAs[Long]("w_pm")).sum
      assert(sw <= 10000 && sw > 10000 - nSources, s"phase $p sum $sw")
      val qt = ph.map(_.getAs[Long]("quota_tokens")).sum
      assert(qt <= 100000 && qt > 100000 - nSources)
    }
    // phase 3 is exactly uniform: every source gets the same weight
    val p3 = rows.filter(_.getAs[Long]("phase") == 3L)
      .map(_.getAs[Long]("w_pm")).distinct
    assert(p3.length == 1, s"phase 3 must be uniform, got $p3")
    // phase 0 is monotone in token inventory
    val p0 = rows.filter(_.getAs[Long]("phase") == 0L)
      .sortBy(_.getAs[Long]("n_tokens"))
    val ws = p0.map(_.getAs[Long]("w_pm"))
    assert(ws.sameElements(ws.sorted), "phase-0 weight follows inventory")
  }
}
