package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic specs for the round-13 third-session operator batch
  * (pack_length_buckets, text_ttr_segmented, ml_ndcg_eval,
  * ml_logreg_newton, ml_lift_curve). Each key is cross-checked through an
  * independent computation shape — Scala collections where the key used
  * SQL, exact identities where brute force is circular.
  */
class Round13cSpec extends AnyFunSuite with SparkFixture {

  test("pack_length_buckets: partition of the corpus, ordered, waste exact") {
    val sp = spark
    val rows = SparkEntry.queries("pack_length_buckets")(sp, sf0001)
      .collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (1 to 8))
    val nDocs = Tables.documents(sp, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // equal-height: bucket sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    // buckets are contiguous length ranges: next min >= previous max
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("min_tokens") >= a.getAs[Long]("max_tokens"))
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val mx = r.getAs[Long]("max_tokens")
      val mass = r.getAs[Long]("token_mass")
      assert(r.getAs[Long]("padded_mass") == n * mx)
      assert(r.getAs[Long]("waste_pm") ==
        10000L * (n * mx - mass) / (n * mx))
      assert(r.getAs[Long]("waste_pm") >= 0 &&
        r.getAs[Long]("waste_pm") < 10000)
    }
  }

  test("text_ttr_segmented: Scala-collections replay agrees per source") {
    val sp = spark
    val expected = Tables.documents(sp, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .flatMap { case (src, docs) =>
        val ttrs = docs.toSeq.flatMap { case (_, text) =>
          text.split(" ").grouped(25).filter(_.length == 25)
            .map(seg => 10000L * seg.distinct.length / 25)
        }
        if (ttrs.isEmpty) None
        else Some(src -> ((ttrs.size.toLong, ttrs.sum / ttrs.size,
          ttrs.min, ttrs.max)))
      }
    val got = SparkEntry.queries("text_ttr_segmented")(sp, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_segs"),
        r.getAs[Long]("mean_ttr_pm"), r.getAs[Long]("min_ttr_pm"),
        r.getAs[Long]("max_ttr_pm")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, src) }
  }

  test("ml_ndcg_eval: bounds, one row per query, zero-iff-zero") {
    val sp = spark
    val rows = SparkEntry.queries("ml_ndcg_eval")(sp, sf0001).collect()
    val nq = Tables.embeddings(sp, sf0001)
      .filter(col("vec_id") < 50).count()
    assert(rows.length == nq)
    rows.foreach { r =>
      val pm = r.getAs[Long]("ndcg_pm")
      assert(pm >= 0 && pm <= 10000)
      assert(r.getAs[Long]("n_ranked") <= 10)
      assert((pm == 0) == (r.getAs[Long]("dcg_mu") == 0))
    }
  }

  test("ml_logreg_newton: class census exact, determinism") {
    val sp = spark
    val rows = SparkEntry.queries("ml_logreg_newton")(sp, sf0001)
      .collect()
    assert(rows.map(_.getAs[Long]("y")).toSeq == Seq(0L, 1L))
    val emb = Tables.embeddings(sp, sf0001)
    val n0 = emb.filter(col("label") % 2 === 0).count()
    val n1 = emb.filter(col("label") % 2 === 1).count()
    assert(rows(0).getAs[Long]("n") == n0)
    assert(rows(1).getAs[Long]("n") == n1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pred_pos") <= r.getAs[Long]("n"))
      val acc = r.getAs[Long]("acc_pm")
      assert(acc >= 0 && acc <= 10000)
    }
    // adjugate arithmetic has no float: a second run is bit-identical
    val again = SparkEntry.queries("ml_logreg_newton")(sp, sf0001)
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("ml_lift_curve: partition of holdout, final cumulative lift = 1x") {
    val sp = spark
    val rows = SparkEntry.queries("ml_lift_curve")(sp, sf0001).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val hold = Tables.embeddings(sp, sf0001)
      .filter(col("vec_id") % 7 === 0 && col("vec_id") < 3500)
    assert(rows.map(_.getAs[Long]("n")).sum == hold.count())
    val totPos = hold.filter(col("label") % 2 === 1).count()
    assert(rows.map(_.getAs[Long]("n_pos")).sum == totPos)
    // the last decile closes the census: cum_pos = P, lift exactly 1x
    assert(rows.last.getAs[Long]("cum_pos") == totPos)
    assert(rows.last.getAs[Long]("cum_lift_pm") == 10000L)
    // cum_pos is the running sum of n_pos
    var run = 0L
    rows.foreach { r =>
      run += r.getAs[Long]("n_pos")
      assert(r.getAs[Long]("cum_pos") == run)
    }
  }
}
