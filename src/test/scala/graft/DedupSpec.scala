package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Near-dup detection behavior: planted near-duplicates must pair; random
  * docs must not; dedup must be idempotent (SURVEY.md §5.3 invariants).
  */
class DedupSpec extends AnyFunSuite with SparkFixture {

  test("dedup_minhash finds every planted near-duplicate pair") {
    val got = SparkEntry.queries("dedup_minhash")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { id =>
      assert(got.contains((id, id + 1000000L)),
        s"planted pair $id <-> ${id + 1000000L} not detected")
    }
  }

  test("dedup_pipeline removes exactly the planted copies, keeping originals") {
    val manifest = SparkEntry.queries("dedup_pipeline")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every planted perturbed copy (id + 1_000_000) is removed in favor of
    // its original. (The corpus also contains genuine near-dup pairs above
    // the 0.4 threshold — dedup_minhash returns 36 pairs — so the manifest
    // may legitimately contain more removals than the planted ten.)
    (0L until 10L).foreach(i => assert(manifest.get(i + 1000000L).contains(i)))
    // Keepers are cluster minima: never removed, always below the removed id.
    val removed = manifest.keySet
    assert(manifest.values.forall(k => !removed.contains(k)))
    assert(manifest.forall { case (r, k) => k < r })
  }

  test("dedup_simhash: planted pairs all within hamming 8 and LSH-detected") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Number]("hamming").longValue() <= 8, r.toString)
      assert(r.getAs[Boolean]("lsh_candidate"), r.toString)
    }
  }

  test("jaccard scores are within [0,1] and self-join identity holds") {
    val j = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf0001)
    val bad = j.filter(col("jaccard") < 0 || col("jaccard") > 1).count()
    assert(bad == 0)
  }

  test("exact dedup is idempotent and keeps the min doc_id") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, " A b C  ".toLowerCase.trim),
      (4L, "x y z")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_tiny")
    val dedup = docs.groupBy(lower(trim(col("text"))).as("norm"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    val once = dedup.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(once == Set(("a b c", 1L, 3L), ("x y z", 4L, 1L)))
  }

  test("sim_ann_ivf candidates come only from the query's probed clusters") {
    val rows = SparkEntry.queries("sim_ann_ivf")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // ≤ 3 results per query, ranks contiguous from 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), ranks.toString)
    }
    // clusters drawn from at most nprobe=2 distinct values per query
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("cluster")).toSet.size <= 2, s"query $q")
    }
  }

  test("embedding near-dup pairs are ordered by similarity descending") {
    val rows = SparkEntry.queries("dedup_embedding")(spark, sf0001)
      .select("cos_sim").collect().map(_.getDouble(0))
    assert(rows.length == 20)
    assert(rows.sliding(2).forall(w => w(0) >= w(1) - 1e-4))
  }

  test("exactJaccardPairs: hand corpus, integer permille, short docs") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d e"), // shingles {abc,bcd,cde}
      (2L, "a b c d x"), // shares {abc,bcd} → 2/4 = 500‰
      (3L, "p q r s t"), // disjoint — must not appear at all
      (4L, "a b"),       // short doc: one partial shingle "a b"
      (5L, "a b")        // identical short doc → 1000‰
    ).toDF("id", "t")
    val got = api.Dedup.exactJaccardPairs(
      docs, col("id"), col("t"), k = 3, minPermille = 350)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 2L, 500L), (4L, 5L, 1000L)))
    // below-threshold pair visible when the bar drops
    val loose = api.Dedup.exactJaccardPairs(
      docs, col("id"), col("t"), k = 3, minPermille = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 2L), (4L, 5L))) // overlap pairs only
  }

  test("containmentPairs: asymmetric — quote detected, reverse below bar") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // B contains all of A's text plus a long tail: C(A⊂B) = 1000‰,
    // C(B⊂A) well under the 500‰ bar. C is a disjoint bystander.
    val quote = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, quote),
      (2L, quote + " " + (1 to 20).map(i => s"tail$i").mkString(" ")),
      (3L, "zeta eta theta iota kappa")
    ).toDF("id", "t")
    val got = api.Dedup.containmentPairs(docs, col("id"), col("t"),
        k = 3, minPermille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1000L)),
      s"expected only the A-in-B direction at 1000‰, got $got")
  }

  test("dedup_source_priority: keeper is min (priority, doc_id) per group") {
    val rows = SparkEntry.queries("dedup_source_priority")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    // multi-copy groups exist in the corpus and every keeper's priority
    // is a valid tier
    assert(rows.exists(_.getAs[Long]("n_copies") > 1L),
      "expected at least one multi-copy prefix group")
    assert(rows.forall { r =>
      val p = r.getAs[Long]("keep_priority"); p >= 0L && p <= 2L
    })
    // group count equals distinct prefix count; keepers are unique docs
    val ids = rows.map(_.getAs[Long]("keep_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("ShingleArray matches the transform-lambda formulation bit-for-bit") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // Edge rows on purpose: empty text, single word, exactly k words,
    // k−1 words, repeated tokens (distinct NOT applied here — raw
    // positional output must match), long doc.
    val docs = Seq("", "solo", "a b c", "a b", "x x x x x",
      (1 to 40).map(i => s"w$i").mkString(" ")).toDF("t")
    Seq(1, 2, 3, 5).foreach { k =>
      val w = split(col("t"), " ")
      val lambdaForm = transform(
        sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
        i => array_join(slice(w, i, lit(k)), " "))
      val diff = docs.select(
        graft.functions.ShingleArray(w, k).as("fast"),
        lambdaForm.as("ref"))
        .filter(not(col("fast") === col("ref"))).count()
      assert(diff == 0, s"ShingleArray diverges from lambda form at k=$k")
    }
  }
}
