package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic specs for the round-13 second-session operator batch. Each key
  * gets an independent cross-check through a DIFFERENT computation shape
  * than the key itself uses (the Round13Spec discipline).
  */
class Round13bSpec extends AnyFunSuite with SparkFixture {

  test("graph_clustering_coeff: corner counts sum to 3x the triangle census") {
    val sp = spark
    // tiny hand graph: triangle 1-2-3 plus pendant 4 on node 1
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val e = sp.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, 2L), org.apache.spark.sql.Row(1L, 3L),
      org.apache.spark.sql.Row(2L, 3L), org.apache.spark.sql.Row(1L, 4L)).asJava, schema)
    val lcc = graft.api.Graph.localClustering(e, col("u"), col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // nodes 2,3: degree 2, one triangle -> lcc = 10000
    assert(lcc(2L).getLong(2) == 1 && lcc(2L).getLong(3) == 10000)
    assert(lcc(3L).getLong(2) == 1 && lcc(3L).getLong(3) == 10000)
    // node 1: degree 3, one triangle -> 2*1*10000 / 6 = 3333
    assert(lcc(1L).getLong(2) == 1 && lcc(1L).getLong(3) == 3333)
    // pendant: degree 1, no triangle, lcc pinned 0
    assert(lcc(4L).getLong(2) == 0 && lcc(4L).getLong(3) == 0)
    assert(lcc.values.map(_.getLong(2)).sum == 3)
  }

  test("graph_clustering_coeff registry key: lcc_pm bounded, d>=1, ordered") {
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("lcc_pm") >= 0 && r.getAs[Long]("lcc_pm") <= 10000)
      assert(r.getAs[Long]("d") >= 1)
    }
    val tris = rows.map(_.getAs[Long]("n_tri"))
    assert(tris.sameElements(tris.sortBy(-_)), "ordered by n_tri desc")
  }

  test("join_spatial_knn: brute force agrees at sf0.001, every row exact") {
    val sp = spark
    val rows = SparkEntry.queries("join_spatial_knn")(sp, sf0001).collect()
    def pts(tbl: String, idc: String, salt: String) =
      (if (tbl == "customer") Tables.customer(sp, sf0001)
       else Tables.supplier(sp, sf0001))
        .select(col(idc).cast("long").as("id"),
          (conv(substring(md5(concat(lit(salt), col(idc).cast("string"),
            lit("lat"))), 1, 15), 16, 10).cast("long")
            % 120000000L - 60000000L).as("lat"),
          (conv(substring(md5(concat(lit(salt), col(idc).cast("string"),
            lit("lon"))), 1, 15), 16, 10).cast("long")
            % 340000000L - 170000000L).as("lon"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = pts("customer", "c_custkey", "kc")
    val supp = pts("supplier", "s_suppkey", "kf")
    assert(rows.length == cust.length, "one row per customer")
    val byCust = rows.map(r => r.getLong(0) -> r).toMap
    cust.foreach { case (cid, clat, clon) =>
      val best = supp.map { case (sid, slat, slon) =>
        val d2 = (clat - slat) * (clat - slat) + (clon - slon) * (clon - slon)
        (d2, sid)
      }.min
      val got = byCust(cid)
      assert(got.getLong(1) == best._2 && got.getLong(2) == best._1,
        s"cust $cid: got (${got.getLong(1)},${got.getLong(2)}), want $best")
    }
    // both phases should appear at a density of ~1 facility/cell... but at
    // sf0.001 (10 suppliers) the void tail may round to zero either way;
    // just require the tags to be internally consistent with eps
    val m = supp.length
    val eps = math.round(math.sqrt(4.08e16 / m))
    rows.foreach { r =>
      val grid = r.getString(3) == "grid"
      assert(grid == (r.getLong(2) < eps * eps))
    }
  }

  test("pipeline_lineage_manifest: manifest is a partition with a sound checksum") {
    val sp = spark
    val rows = SparkEntry.queries("pipeline_lineage_manifest")(sp, sf0001)
      .collect()
    val total = Tables.documents(sp, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // xor over the manifest == xor over all digests computed independently
    val manifestXor = rows.map(_.getAs[Long]("checksum")).reduce(_ ^ _)
    val independentXor = Tables.documents(sp, sf0001)
      .select(conv(substring(md5(concat(lit("ln"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
        .as("dig"))
      .collect().map(_.getLong(0)).reduce(_ ^ _)
    assert(manifestXor == independentXor)
    rows.foreach(r => assert(r.getAs[Long]("min_doc") <= r.getAs[Long]("max_doc")))
  }

  test("dq_sequential_gaps: a hand-replayed user matches") {
    val sp = spark
    val rows = SparkEntry.queries("dq_sequential_gaps")(sp, sf0001).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    val uid = top.getLong(0)
    val evs = Tables.events(sp, sf0001).filter(col("user_id") === uid)
      .select(col("event_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val regressions = evs.sliding(2).count {
      case Array((_, p), (_, c)) => c < p
      case _ => false
    }
    val maxBack = evs.sliding(2).collect {
      case Array((_, p), (_, c)) if c < p => p - c
    }.foldLeft(0L)(math.max)
    assert(top.getAs[Long]("n_events") == evs.length)
    assert(top.getAs[Long]("n_regressions") == regressions)
    assert(top.getAs[Long]("max_backstep_us") == maxBack)
    // ordering: non-increasing regression counts
    val regs = rows.map(_.getAs[Long]("n_regressions"))
    assert(regs.sameElements(regs.sortBy(-_)))
  }

  test("text_burstiness: top term's dispersion replayed independently") {
    val sp = spark
    val rows = SparkEntry.queries("text_burstiness")(sp, sf0001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val top = rows.head
    val term = top.getString(0)
    val n = Tables.documents(sp, sf0001).count()
    val counts = Tables.documents(sp, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === term)
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    val s1 = counts.sum; val s2 = counts.map(c => c * c).sum
    assert(top.getAs[Long]("total") == s1)
    assert(top.getAs[Long]("n_docs_with") == counts.length)
    assert(top.getAs[Long]("dispersion_pm") ==
      (10000L * (n * s2 - s1 * s1)) / (n * s1))
  }

  test("ml_naive_bayes: census covers the holdout; classifier beats chance") {
    val sp = spark
    val rows = SparkEntry.queries("ml_naive_bayes")(sp, sf0001).collect()
    val nTest = Tables.documents(sp, sf0001)
      .filter(col("doc_id") % 2 === 1).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nTest)
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("n_docs")).sum
    // 5 classes, chance ~20%. The corpus shares ALL 31 vocabulary words
    // across langs (verified in DuckDB) — only the per-lang frequency
    // profile differs, so NB's honest ceiling here is ~35%, not 90%.
    // The floor asserts the classifier extracts that frequency signal:
    // clearly above chance, measured 33.6% at sf0.001 / 36.8% at sf0.01.
    assert(correct * 100 >= nTest * 27,
      s"accuracy ${correct}/${nTest} below floor")
  }

  test("pack_mask_spans: per-bin accounting is internally consistent") {
    val rows = SparkEntry.queries("pack_mask_spans")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = r.getAs[Long]("bin_tokens")
      val masked = r.getAs[Long]("n_masked")
      val train = r.getAs[Long]("n_trainable")
      assert(masked + train == tok)
      assert(r.getAs[Long]("max_span") <= train)
      val share = r.getAs[Long]("mask_share_pm")
      // ceil(tc/4) >= tc/4 exactly => floor share is never below 2500
      assert(share >= 2500 && share <= 10000)
    }
  }
}
