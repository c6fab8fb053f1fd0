package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: data-quality auditing, Gopher quality rules,
  * C4 segment dedup, engine-portable MinHash, temperature mixing, and the
  * recursive-CTE-oracle packing invariants. Every assertion targets
  * structurally NON-trivial output (NOTES.md vacuous-demo lesson): the
  * corpus genuinely violates some rules and passes others, and the specs
  * pin both sides.
  */
class QualitySpec extends AnyFunSuite with SparkFixture {

  test("dq_expectations: tight rules find violations, clean rules find none") {
    val rows = SparkEntry.queries("dq_expectations")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = rows("l_shipdate_not_null")._1
    assert(n == 60000L)
    assert(rows.values.forall(_._1 == n), "one scan, one total per rule")
    // The corpus genuinely violates the tightened thresholds...
    assert(rows("l_discount_max_5pct")._2 > 0)
    assert(rows("l_quantity_max_45")._2 > 0)
    // ...and genuinely satisfies the structural ones.
    assert(rows("l_shipdate_not_null")._2 == 0)
    assert(rows("l_extendedprice_positive")._2 == 0)
  }

  test("dq_expectations evaluates all rules in a single scan of the input") {
    val df = graft.api.Quality.expectations(
      Tables.lineitem(spark, sf0001),
      Seq("a" -> (col("l_quantity") > 0), "b" -> col("l_shipdate").isNotNull))
    val scans = df.queryExecution.optimizedPlan.collectLeaves()
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("dq_expectations null semantics are fail-closed") {
    val sp = spark
    import sp.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 5L), (2L, null), (3L, -1L)).toDF("id", "v")
    val got = graft.api.Quality.expectations(df,
      Seq("v_positive" -> (col("v") > 0))).collect()(0)
    assert(got.getLong(1) == 3L) // checked
    assert(got.getLong(2) == 2L) // null AND negative both violate
  }

  test("dq_integrity: the corpus carries real PK duplicates, zero orphans") {
    val rows = SparkEntry.queries("dq_integrity")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("lineitem_pk_unique")._2 == 14168L) // measured defect mass
    assert(rows("lineitem_fk_orders")._2 == 0L)
    assert(rows("orders_status_accepted")._2 == 0L)
    assert(rows("customer_acctbal_nonneg")._2 == 122L)
  }

  test("text_gopher_quality: every rule is non-degenerate on the corpus") {
    val rows = SparkEntry.queries("text_gopher_quality")(spark, sf001)
      .collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == 500L)
    for (rule <- Seq("p_words", "p_wordlen", "p_stop", "p_dup", "p_all")) {
      val pass = rows.map(_.getAs[Long](rule)).sum
      assert(pass > 0 && pass < nDocs,
        s"$rule is degenerate: $pass of $nDocs pass")
    }
  }

  test("gopherQuality integer ratio bounds match their float definitions") {
    val sp = spark
    import sp.implicits._
    // mean word length 4.5 (in [4.3, 4.7]), stop ratio 1/9 >= 1/20,
    // 8 bigrams, 1 duplicate ('a b' twice) -> dup fraction 1/8 > 1/20.
    val doc = Seq((1L, "a b longword a b cc dd ee ff")).toDF("id", "text")
    val r = graft.api.Text.gopherQuality(doc, col("id"), col("text"),
      minWords = 2, maxWords = 20).collect()(0)
    assert(r.getAs[Long]("n_words") == 9L)
    assert(r.getAs[Boolean]("pass_words"))
    // 21 chars / 9 words = 2.33 -> outside [4.3, 4.7]
    assert(!r.getAs[Boolean]("pass_wordlen"))
    assert(r.getAs[Boolean]("pass_stop")) // 'a' twice: 2*20 >= 9
    assert(!r.getAs[Boolean]("pass_dup")) // (8-7)*20 > 8
    assert(!r.getAs[Boolean]("pass_all"))
  }

  test("text_segment_dedup: token accounting is internally consistent") {
    val rows = SparkEntry.queries("text_segment_dedup")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSeg, nBoil) = (r.getAs[Long]("n_segments"), r.getAs[Long]("n_boiler"))
      val (nTok, nKeep) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_tokens_retained"))
      assert(nBoil >= 1 && nBoil <= nSeg, r.toString) // output is filtered
      assert(nKeep < nTok, r.toString) // boilerplate removal really removed
      // retained >= tokens - 10*boiler (each segment is <= 10 words)
      assert(nKeep >= nTok - 10 * nBoil, r.toString)
    }
  }

  test("segmentDedup covers every token exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val audit = graft.api.Text.segmentDedup(
      docs, col("doc_id"), col("text"))
    val mismatch = audit
      .join(docs.select(col("doc_id").as("id"),
        size(split(col("text"), " ")).cast("long").as("true_tokens")), "id")
      .filter(col("n_tokens") =!= col("true_tokens"))
      .count()
    assert(mismatch == 0, "segment lengths must sum to the doc token count")
  }

  test("dedup_minhash_portable finds every planted near-duplicate pair") {
    // Same perturbation as dedup_minhash's planted set: drop the first
    // word of docs 0..9. All intermediates are deterministic (md5 + fixed
    // affine constants), so detection is stable, not probabilistic.
    val base = Tables.documents(spark, sf0001).select("doc_id", "text")
    val planted = base.unionByName(
      base.filter(col("doc_id") < 10).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val got = graft.api.Dedup.minhashPortableCandidates(
      planted, col("doc_id"), col("text"))
      .filter(col("id_b") === col("id_a") + 1000000L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 10L).foreach { id =>
      assert(got.contains(id), s"planted pair $id not detected")
      assert(got(id) >= 3L, s"pair $id shares only ${got(id)} bands")
    }
  }

  test("dedup_minhash_portable output is well-formed and non-trivial") {
    val rows = SparkEntry.queries("dedup_minhash_portable")(spark, sf001)
      .collect()
    assert(rows.length == 30) // genuine near-dups in the sf0.01 corpus
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val nb = r.getLong(2)
      assert(nb >= 1 && nb <= 4)
    }
  }

  test("mix_temperature: sqrt weighting flattens the mixture vs proportional") {
    val rows = SparkEntry.queries("mix_temperature")(spark, sf001)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_avail"),
        r.getAs[Long]("quota"), r.getAs[Long]("n_selected")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nAvail, quota, nSel) =>
      assert(quota <= nAvail, "no source is upsampled")
      assert(nSel == quota, "every quota is filled exactly")
    }
    // The corpus sources are equal-sized, so their quotas must be equal
    // (a fairness check in itself).
    assert(rows.map(_._3).distinct.length == 1)
  }

  test("temperatureMixture flattens unequal sources toward the small one") {
    val sp = spark
    import sp.implicits._
    // 100 vs 25 docs: w = (10000, 5000), budget = min(150, 75) = 75,
    // quotas = (50, 25) — the small source keeps 100% of itself, the
    // large one 50%. Proportional sampling would keep equal fractions.
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 125L).map(i => (i, "small"))).toDF("id", "src")
    val sel = graft.api.Pipeline.temperatureMixture(
      docs, col("src"), col("id"))
    val quotas = sel.groupBy("source")
      .agg(max("quota").as("q"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(quotas("big") == (50L, 50L))
    assert(quotas("small") == (25L, 25L))
  }

  test("cdc_snapshot_diff classifies all four change types, partitioned exactly") {
    val rows = SparkEntry.queries("cdc_snapshot_diff")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet ==
      Set("inserted", "deleted", "updated", "unchanged"))
    val ord = Tables.orders(spark, sf001)
    val nOrders = ord.count()
    // v1 keys partition into deleted + updated + unchanged; inserted is
    // the %101 re-keyed set minus nothing (fresh keys).
    assert(rows("deleted") + rows("updated") + rows("unchanged") == nOrders)
    assert(rows("inserted") ==
      ord.filter(col("o_orderkey") % 101 === 0).count())
    assert(rows("deleted") ==
      ord.filter(col("o_orderkey") % 97 === 0).count())
    // Updated = %13 rows that were NOT deleted.
    assert(rows("updated") ==
      ord.filter(col("o_orderkey") % 13 === 0 &&
        col("o_orderkey") % 97 =!= 0).count())
  }

  test("diffSnapshots round-trips: diffing a table against itself is all-unchanged") {
    val v = Tables.orders(spark, sf0001)
    val d = graft.api.Quality.diffSnapshots(v, v, col("o_orderkey"),
      Seq(col("o_custkey"), col("o_orderstatus")))
    assert(d.filter(col("change") =!= "unchanged").count() == 0)
    assert(d.count() == v.count())
  }

  test("sql_recursive_cte: binary-tree depths double until the key space ends") {
    val rows = SparkEntry.queries("sql_recursive_cte")(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Depths 0..5 are full binary-tree levels (1,2,4,8,16,32) over
    // suppkeys 1..99; the last level is the truncated remainder.
    (0 to 5).foreach(d => assert(rows(d) == (1L << d), s"depth $d"))
    assert(rows.values.sum == 99L) // every suppkey 1..99 reached once
  }

  test("stream_quality_gate audits every row exactly once across batches") {
    val rows = SparkEntry.queries("stream_quality_gate")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf0001)
    val total = ev.count()
    val errors = ev.filter(col("event_type") === "error").count()
    assert(rows.keySet ==
      Set("type_not_error", "user_present", "value_max_100"))
    rows.values.foreach { case (nBatches, nChecked, _) =>
      assert(nBatches == 3L, "one audit row per micro-batch per rule")
      assert(nChecked == total, "summed batch audits cover the whole table")
    }
    assert(rows("type_not_error")._3 == errors)
    assert(errors > 0, "the divert rule must have real traffic")
    assert(rows("user_present")._3 == 0L)
  }

  test("dq_volume_drift: the ±5% band fires on real daily noise, both sides") {
    val rows = SparkEntry.queries("dq_volume_drift")(spark, sf001).collect()
    assert(rows.length == 30)
    val lo = rows.count(_.getAs[Boolean]("below_band"))
    val hi = rows.count(_.getAs[Boolean]("above_band"))
    assert(lo == 6 && hi == 3, s"got $lo low / $hi high")
    // The first day has no trailing window and must never flag.
    val first = rows.minBy(_.getAs[Long]("day"))
    assert(first.getAs[Long]("n_prev") == 0L)
    assert(!first.getAs[Boolean]("below_band"))
    assert(!first.getAs[Boolean]("above_band"))
  }

  test("agg_incremental_merge: state + delta partials cover every row once") {
    val rows = SparkEntry.queries("agg_incremental_merge")(spark, sf001)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, s, d) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_state"), r.getAs[Long]("n_delta"))
      assert(s + d == n, r.toString)
      assert(s > 0 && d > 0, "the cutoff must split every group")
    }
  }

  test("pack_sequences fill invariant holds (the recursive oracle's claim)") {
    val rows = SparkEntry.queries("pack_sequences")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("fill_ok"), r.toString)
      assert(r.getAs[Long]("fill_after") >= r.getAs[Long]("n_tokens"))
    }
  }

  test("kAnonymity counts classes and rows below each threshold exactly") {
    val sp = spark
    import sp.implicits._
    // Classes by (city, age band): (a,1)x1, (a,2)x3, (b,1)x5 —
    // k=2 flags the singleton; k=4 also flags the 3-class; k=6 flags all.
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 2), ("a", 2),
      ("b", 1), ("b", 1), ("b", 1), ("b", 1), ("b", 1)
    ).toDF("city", "band")
    val out = graft.api.Quality.kAnonymity(
        df, Seq(col("city"), col("band")), ks = Seq(2, 4, 6))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, 3L, 1L, 1L), (4L, 3L, 2L, 4L), (6L, 3L, 3L, 9L)))
  }

  test("dq_k_anonymity: risk is monotone in k and bounded by the table") {
    val rows = SparkEntry.queries("dq_k_anonymity")(spark, sf001)
      .orderBy("k").collect()
    assert(rows.length == 3)
    val nRows = Tables.customer(spark, sf001).count()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_classes_below") <=
        hi.getAs[Long]("n_classes_below"))
      assert(lo.getAs[Long]("n_rows_at_risk") <=
        hi.getAs[Long]("n_rows_at_risk"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_classes_below") <= r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("n_rows_at_risk") <= nRows)
      assert(r.getAs[Long]("n_classes_below") > 0,
        "audit must be non-vacuous on the corpus")
    }
  }

  test("applyPatch reconstructs the target snapshot exactly") {
    val sp = spark
    import sp.implicits._
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // 1 unchanged, 2 updated, 3 deleted, 4 inserted.
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val recon = graft.api.Quality.applyPatch(
        before, after, col("id"), Seq(col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(recon == Map(1L -> "a", 2L -> "B", 4L -> "d"))
    // Patching a snapshot onto itself is the identity.
    val self = graft.api.Quality.applyPatch(
        before, before, col("id"), Seq(col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(self == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("schemaContract surfaces type drift, missing, and undeclared columns") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    val out = graft.api.Quality.schemaContract(df, Seq(
        "id" -> "BIGINT",       // clean pass
        "name" -> "VARCHAR",    // STRING must normalize to VARCHAR
        "score" -> "DECIMAL(9,4)", // type drift: actual DOUBLE
        "ts" -> "TIMESTAMP"))   // declared but missing
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out("id") == (("BIGINT", "BIGINT", true)))
    assert(out("name") == (("VARCHAR", "VARCHAR", true)))
    assert(out("score") == (("DECIMAL(9,4)", "DOUBLE", false)))
    assert(out("ts") == (("TIMESTAMP", "(missing)", false)))
    assert(out.size == 4)
    // An undeclared physical column must surface too, not pass silently.
    val extra = graft.api.Quality.schemaContract(df, Seq("id" -> "BIGINT"))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(extra("name") == false && extra("score") == false)
  }

  test("dq_skew_report: percentiles monotone, top1 = max, totals consistent") {
    val m = SparkEntry.queries("dq_skew_report")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size == 14)
    assert(m("p50_group") <= m("p90_group") &&
      m("p90_group") <= m("p99_group") &&
      m("p99_group") <= m("max_group"))
    assert(m("top1_n") == m("max_group"))
    assert(m("top1_n") >= m("top2_n") && m("top2_n") >= m("top3_n"))
    // avg_x1000 = 1000·rows/keys (floored); skew ratio ≥ 1000 permille.
    assert(m("avg_x1000") == 1000 * m("n_rows") / m("n_keys"))
    assert(m("skew_pm") >= 1000,
      "max group can never be below the mean group size")
  }

  test("quarantine routing conserves rows and the sink is re-ingestable") {
    val out = SparkEntry.queries("sink_quarantine_route")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Conservation: every input row lands in exactly one sink.
    val total = Tables.lineitem(spark, sf001).count()
    assert(out.values.sum == total,
      s"clean + quarantined (${out.values.sum}) must equal input ($total)")
    // The corpus's planted defect mass must actually route (non-vacuous).
    assert(out("duplicate_pk") > 0 && out("quantity_range") > 0)
    assert(out("clean") > out("quantity_range"))
  }

  test("driftPsi: zero on identical slices, flags a planted shift, stable") {
    val sp = spark
    import sp.implicits._
    def slice(offset: Double) = (0 until 1000)
      .map(i => ("t", offset + (i % 10) * 50.0 + 1.0)).toDF("g", "v")
    val same = graft.api.Quality.driftPsi(
      slice(0), slice(0), col("g"), col("v"), 50.0, 10).collect()(0)
    // Identical distributions: every bucket term is exactly 0.
    assert(same.getDouble(3) == 0.0 && !same.getBoolean(4), same.toString)
    // Shift the current slice up 5 buckets: mass moves from buckets 0-9
    // uniform to 5-9-heavy (clamped) — a gross drift the 0.2 line must
    // catch.
    val shifted = graft.api.Quality.driftPsi(
      slice(0), slice(250.0), col("g"), col("v"), 50.0, 10).collect()(0)
    assert(shifted.getDouble(3) > 0.2 && shifted.getBoolean(4),
      shifted.toString)
    // Mild drift scores strictly below gross drift (monotone in shift).
    val mild = graft.api.Quality.driftPsi(
      slice(0), slice(50.0), col("g"), col("v"), 50.0, 10).collect()(0)
    assert(mild.getDouble(3) > 0.0 && mild.getDouble(3) < shifted.getDouble(3))
    // Fixed-point terms: repartitioning cannot move the sum.
    val a = graft.api.Quality.driftPsi(
      slice(0).repartition(7), slice(250.0).repartition(3),
      col("g"), col("v"), 50.0, 10).collect()(0)
    assert(a.getDouble(3) == shifted.getDouble(3))
  }

  test("driftCusum: stationary stays quiet, a level shift alarms on day one") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-02-${d + 1}%02d 12:00:00")
    // 20 days x 10 events: flat mean 50 for 10 days, then +200 shift.
    val rows = for (d <- 0 until 20; i <- 0 until 10) yield {
      val base = 45.0 + i // mean 49.5
      val v = if (d >= 10) base + 200.0 else base
      ("t", day(d), v)
    }
    val df = rows.toDF("g", "ts", "v")
    val out = graft.api.Quality.driftCusum(
      df, col("g"), col("ts"), col("v"), thresholdMicro = 100000000L)
      .collect()(0)
    // mu0 = (10*49.5 + 10*249.5)/20 = 149.5; pre-shift days drift the
    // walk DOWN (reflected at 0), post-shift days add +100/day — the
    // first shifted day pushes S to 100.0, NOT > threshold 100; day two
    // reaches 200 and alarms. Alarm day = shift day + 1.
    val shiftDay = df.select(expr("unix_micros(ts) div 86400000000"))
      .collect().map(_.getLong(0)).sorted.apply(10 * 10 + 1)
    assert(out.getBoolean(5), out.toString)
    assert(out.getLong(4) == shiftDay + 1, s"$out vs shift=$shiftDay")
    assert(out.getDouble(3) > 900.0, out.toString) // 10 days x ~100
    // Repartitioning cannot move integer walk state.
    val b = graft.api.Quality.driftCusum(
      df.repartition(7), col("g"), col("ts"), col("v"), 100000000L)
      .collect()(0)
    assert(b == out)
  }

  test("dq_benford: hand histogram; zero/negative prices dropped") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    // Cents 100,150,1999,200,300,3000,999 → digit census 1:3, 2:1,
    // 3:2, 9:1, n=7; the 0.00 and -5.00 rows must not count.
    val prices = Seq(1.0, 1.5, 19.99, 2.0, 3.0, 30.0, 9.99, 0.0, -5.0)
    val li = prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, i.toLong, i.toLong, i, 1.0, p, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = graft.Scratch.fresh("benford_spec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("dq_benford")(sp, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1, 2, 3, 9))
    assert(out(1) == ((3L, 0.4286, 0.3010, 0.1275)), out(1).toString)
    assert(out(2) == ((1L, 0.1429, 0.1761, -0.0332)), out(2).toString)
    assert(out(3) == ((2L, 0.2857, 0.1249, 0.1608)), out(3).toString)
    assert(out(9) == ((1L, 0.1429, 0.0458, 0.0971)), out(9).toString)
  }

  test("text_jsd_sources: identical source ≈ 0, disjoint source = ln 2") {
    val sp = spark
    import sp.implicits._
    // s1 and s2 share the identical text; s3 is vocabulary-disjoint.
    // JSD(P‖Q) = ln 2 when P and the mixture's complement are disjoint…
    // exactly: s3's distribution is disjoint from 2/3 of the corpus, so
    // its divergence is large but < ln2; the sharp assertions are the
    // ORDERING and the near-zero twins (each twin still diverges
    // slightly from the mixture because s3's tokens dilute Q).
    val docs = Seq(
      (1L, "a b a b", "s1"), (2L, "a b a b", "s2"),
      (3L, "x y x y", "s3"))
      .map { case (i, t, src) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("jsd_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_jsd_sources")(sp, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("s1") == out("s2"), out.toString) // symmetric twins
    assert(out("s3") > out("s1"), out.toString)
    assert(out("s3") < math.log(2) + 1e-6, out.toString) // JSD ≤ ln 2
    assert(out("s1") < 0.2 && out("s1") > 0.0, out.toString)
  }

  test("text_jsd_sources: corpus sources are near-homogeneous") {
    val out = SparkEntry.queries("text_jsd_sources")(spark, sf001)
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= math.log(2) + 1e-6, r.toString)
      // sources draw from one shared vocabulary: divergences are small
      assert(j < 0.1, r.toString)
    }
    assert(out.map(_.getDouble(2)).distinct.length > 10,
      "divergences collapsed")
  }

  test("text_hill_tail: geometric counts give the closed-form alpha") {
    val sp = spark
    import sp.implicits._
    // Counts 2^10 .. 2^0 over 11 terms: Σ ln(f_i/f_11) over the top 10
    // = 55·ln2; α = 10/(55·ln2) = 0.2623 (quantized sum 38123095).
    val text = (1 to 11).flatMap(i =>
      Seq.fill(1 << (11 - i))(f"t$i%02d")).mkString(" ")
    val docs = Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("hill_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_hill_tail")(sp, dir).collect()(0)
    assert(r.getLong(0) == 10L, r.toString)
    assert(r.getLong(1) == 1L, r.toString) // xmin = f_11 = 2^0
    assert(r.getLong(2) == 38123095L, r.toString)
    assert(r.getDouble(3) == 0.2623, r.toString)
  }

  test("text_hill_tail: alpha is scale-free, xmin is not") {
    val sp = spark
    import sp.implicits._
    // Doubling every document leaves all frequency RATIOS unchanged, so
    // Hill's α must be bit-identical while xmin doubles — the
    // scale-freeness that makes the estimator comparable across corpus
    // sizes.
    val base = Tables.documents(sp, sf001)
    val dir1 = graft.Scratch.fresh("hill_scale1")
    val dir2 = graft.Scratch.fresh("hill_scale2")
    base.write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    base.unionAll(base.withColumn("doc_id", col("doc_id") + 100000L))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r1 = SparkEntry.queries("text_hill_tail")(sp, dir1).collect()(0)
    val r2 = SparkEntry.queries("text_hill_tail")(sp, dir2).collect()(0)
    assert(r2.getLong(1) == 2 * r1.getLong(1), s"$r1 vs $r2")
    // scale-free up to the 1e-6 ln quantization (each of the 11 ln
    // calls may shift the sum ±1 unit after doubling)
    assert(math.abs(r1.getDouble(3) - r2.getDouble(3)) < 0.01,
      s"$r1 vs $r2")
    // templated 31-word vocabulary: near-uniform frequencies → a tail
    // far LIGHTER than natural text's α ≈ 1 — the honest screen readout
    assert(r1.getDouble(3) > 3.0, r1.toString)
  }

  test("text_zipf: exact power-law corpus fits slope -1, r2 = 1") {
    val sp = spark
    import sp.implicits._
    // Term counts 12/6/4/3 = 12/rank exactly, so ln(freq) on ln(rank)
    // is a perfect line: slope -1, intercept ln(12) = 2.4849, r² = 1
    // (1e-6 quantization moves each moment < 1 unit — far inside the
    // 4-decimal rounding).
    val text1 = (Seq.fill(8)("a") ++ Seq.fill(4)("b")).mkString(" ")
    val text2 = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq((1L, text1, "en", "s1", text1.length.toLong),
      (2L, text2, "en", "s1", text2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("zipf_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_zipf")(sp, dir).collect()(0)
    assert(r.getLong(0) == 4L, r.toString)
    assert(r.getDouble(1) == -1.0, r.toString)
    assert(r.getDouble(2) == 2.4849, r.toString)
    assert(r.getDouble(3) == 1.0, r.toString)
  }

  test("text_heaps_law: all-new-vocab docs fit beta = 1 exactly") {
    val sp = spark
    import sp.implicits._
    // 10 docs of 10 doc-unique words each: every bigram is new, so
    // V(N) = N at every checkpoint -> ln V = ln N -> beta 1, r2 1.
    val docs = (0 until 10).map { d =>
      (d.toLong, (0 until 10).map(i => s"w${d}_$i").mkString(" "),
        "en", "s1", 60L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("heaps_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_heaps_law")(sp, dir).collect()(0)
    assert(r.getLong(0) == 10L, r.toString)
    assert(r.getLong(1) == 90L && r.getLong(2) == 90L, r.toString)
    assert(r.getDouble(3) == 1.0, r.toString)
    assert(r.getDouble(4) == 1.0, r.toString)
  }

  test("text_heaps_law: corpus diagnoses its own templated vocabulary") {
    val r = SparkEntry.queries("text_heaps_law")(spark, sf001)
      .collect()(0)
    assert(r.getLong(0) == 10L)
    assert(r.getLong(2) < 1000L) // closed bigram space
    // near-flat growth IS the template-spam signature — the honest read
    assert(r.getDouble(3) < 0.1 && r.getDouble(3) > 0.0, r.toString)
  }

  test("text_perplexity_bigram: hand LM, both docs score 1/0.875") {
    val sp = spark
    import sp.implicits._
    // Corpus 'a b a b' + 'a b': c(a,b)=3 of ctx(a)=3, c(b,a)=1 of
    // ctx(b)=1, unigrams a=b=3 of T=6 -> every transition scores
    // 0.75·1 + 0.25·0.5 = 0.875, so ppl = 1/0.875 = 1.1429 for both
    // docs regardless of length.
    val docs = Seq((1L, "a b a b", "en", "s1", 7L),
      (2L, "a b", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("bigram_ppl_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_perplexity_bigram")(sp, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 1.1429)), out.toString)
    assert(out(2L) == ((1L, 1.1429)), out.toString)
  }

  test("text_perplexity_bigram: context beats the unigram model") {
    val bi = SparkEntry.queries("text_perplexity_bigram")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uni = SparkEntry.queries("text_perplexity")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi.size == 500)
    assert(bi.values.forall(p => p > 1.0 && p < 1000.0))
    val meanBi = bi.values.sum / bi.size
    val meanUni = uni.values.sum / uni.size
    assert(meanBi < meanUni,
      s"bigram ppl $meanBi should beat unigram $meanUni")
  }

  test("text_readability: FORCAST arithmetic on a hand-counted doc") {
    val sp = spark
    import sp.implicits._
    // syllables (maximal [aeiouy]+ runs): a=1, tree=1 (ee), customer=3
    // (u,o,e), value=2 (a,ue) -> 4 words, 2 mono, 1 poly, syl sum 7.
    val docs = Seq((1L, "a tree customer value", "en", "s1", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Scratch.fresh("readability_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_readability")(sp, dir).collect()(0)
    assert(r.getLong(1) == 4L, r.toString)
    assert(r.getLong(2) == 2L, r.toString)
    assert(r.getLong(3) == 1L, r.toString)
    assert(r.getDouble(4) == 1.75, r.toString) // 7/4
    assert(r.getDouble(5) == 12.5, r.toString) // 20 - 15*2/4
  }

  test("text_readability: grades are non-degenerate across sources") {
    val rows = SparkEntry.queries("text_readability")(spark, sf001)
      .collect()
    assert(rows.length == 20)
    assert(rows.map(_.getDouble(5)).distinct.length > 1,
      "every source got the same grade — vacuous corpus signal")
    rows.foreach { r =>
      assert(r.getDouble(5) > 0 && r.getDouble(5) < 20, r.toString)
    }
  }

  test("text_pseudonymize: tokens keep referential integrity") {
    val rows = SparkEntry.queries("text_pseudonymize")(spark, sf001)
      .collect()
    assert(rows.length == 300)
    // 300 docs inject doc_id % 40 entities -> exactly 40 distinct tokens,
    // and the same entity must map to the same token in every document
    // (the property destructive [EMAIL] striking loses).
    val byEntity = rows.groupBy(r => r.getLong(0) % 40)
    assert(byEntity.size == 40)
    byEntity.foreach { case (ent, rs) =>
      assert(rs.map(_.getString(1)).distinct.length == 1,
        s"entity $ent got multiple tokens")
    }
    assert(rows.map(_.getString(1)).distinct.length == 40)
    rows.foreach { r =>
      val tail = r.getString(2)
      assert(tail.contains(r.getString(1)), tail) // token really substituted
      assert(!tail.contains("@"), tail) // no raw address survives
    }
  }
}
