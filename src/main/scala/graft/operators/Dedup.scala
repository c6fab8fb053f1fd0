package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.I (dedup half) — training-data deduplication, from exact hashing to
  * MinHash/SimHash near-dup detection and exact n-gram Jaccard.
  *
  * Scale design: every near-dup operator is LSH-shaped — candidate pairs
  * come from an equi-join on a bucket key (band signature / bit chunk), never
  * from an all-pairs comparison. At 100 TB the all-pairs join is impossible;
  * the band join shuffles each doc a constant number of times (one row per
  * band) and only same-bucket docs meet. All hash seeds are fixed literals —
  * no RNG anywhere — so results are bit-stable across runs and cluster
  * layouts.
  *
  * The corpus has no true duplicates (500 distinct texts at sf0.01), so the
  * near-dup demos plant their own: each of docs 0..9 gets a perturbed copy
  * (first token dropped, id + 1_000_000) unioned in at query time. Detecting
  * exactly those planted pairs is what the spec asserts.
  */
object Dedup extends QueryModule {

  /** Corpus plus perturbed near-duplicate copies of docs 0..9. */
  private def withPlanted(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select("doc_id", "text")
    base.unionByName(
      base.filter(col("doc_id") < 10).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** Distinct 3-word shingles of a space-tokenized text column. */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("w", split(col("text"), " "))
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(1), greatest(size(col("w")) - 2, lit(1))),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2)))))

  /** 32-value MinHash signatures, fully codegen'd.
    *
    * Two prior shapes measured slow at sf0.1: nested HOF lambdas (14s —
    * interpreted, inner hash re-inlined under every salt) and
    * shingle-array building via transform/concat_ws (5s — interpreted
    * per-element lambda). This shape has no lambdas at all: posexplode the
    * tokens (codegen Generate), form each 3-shingle with window `lead`
    * (codegen), hash the shingle string once, then 32 salted
    * min-aggregates over the 8-byte value. MinHash is multiset-invariant,
    * so no distinct pass is needed. Partial aggregation means the shuffle
    * carries one 32-long row per (partition, doc) — the layout that holds
    * at any scale.
    */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
      // concat_ws skips the null leads at the tail, matching the shorter
      // tail shingles of the array formulation.
      .select(col("doc_id"), concat_ws(" ", col("tok"),
        lead("tok", 1).over(w), lead("tok", 2).over(w)).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
    val mins = (0 until 32).map(k => min(xxhash64(lit(k), col("h"))).as(s"m$k"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until 32).map(k => col(s"m$k")): _*).as("sig"))
  }

  def all: Seq[Q] = Seq(
    // Exact dedup by normalized-text hash: one keeper (min doc_id) per
    // normalization class. A single hash-shuffle on the normalized text.
    // Grouping on the 256-bit digest (not the raw text) keeps the shuffle
    // key at 64 bytes regardless of document size — at 100 TB the shuffle
    // moves hashes, never documents.
    Q(
      "dedup_exact",
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(sha2(lower(trim(col("text"))), 256).as("text_sha"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col("text_sha"))
          .orderBy("keep_id"),
      oracle = Some("""
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
               sha256(lower(trim(text))) AS text_sha
        FROM documents GROUP BY sha256(lower(trim(text))) ORDER BY keep_id""")),

    // MinHash + LSH banding: 32 minhashes → 8 bands of 4 → docs sharing any
    // band become candidates (equi-join on the band key — the LSH trick that
    // replaces the quadratic all-pairs comparison); candidates are then
    // scored by signature agreement and thresholded.
    Q(
      "dedup_minhash",
      (s, dir) => {
        // Persisted: the banded self-join would otherwise recompute the
        // whole shingle→hash→min pipeline on both build and probe sides.
        val sigs = minhashSigs(withPlanted(s, dir)).persist()
        val banded = sigs
          .select(col("doc_id"), col("sig"),
            explode(sequence(lit(0), lit(7))).as("band"))
          .withColumn("bsig", slice(col("sig"), col("band") * 4 + 1, lit(4)))
          .withColumn("bkey", xxhash64(col("band"), col("bsig")))
        val pairs = banded.alias("a")
          .join(banded.alias("b"),
            col("a.bkey") === col("b.bkey") &&
              col("a.bsig") === col("b.bsig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
          .distinct()
        pairs
          .withColumn("est_jaccard", round(
            aggregate(
              zip_with(col("sig_a"), col("sig_b"),
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, v) => acc + v) / 32.0, 4))
          .filter(col("est_jaccard") >= 0.4)
          .select("doc_a", "doc_b", "est_jaccard")
          .orderBy("doc_a", "doc_b")
      }),

    // SimHash: 64-bit signature from sign-aggregated token-hash bits
    // (explode tokens → per-bit ±count → reassemble), evaluated on the
    // planted pairs: true hamming distance plus whether 8×8-bit chunk
    // banding (pigeonhole: guarantees detection for hamming ≤ 7) would
    // surface the pair as a candidate.
    Q(
      "dedup_simhash",
      (s, dir) => {
        val tok = withPlanted(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
          .withColumn("h", xxhash64(col("token")))
        val sim = tok
          .select(col("doc_id"), posexplode(expr(
            """transform(sequence(0, 63),
               k -> CASE WHEN (shiftright(h, k) & 1) = 1
                    THEN CAST(cnt AS BIGINT) ELSE -cnt END)""")))
          .groupBy(col("doc_id"), col("pos")).agg(sum("col").as("bit_sum"))
          .groupBy("doc_id")
          .agg(sum(when(col("bit_sum") > 0,
            expr("shiftleft(CAST(1 AS BIGINT), pos)")).otherwise(0L))
            .as("simhash"))
        val a = sim.filter(col("doc_id") < 10)
          .select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
        val b = sim.filter(col("doc_id") >= 1000000L)
          .select((col("doc_id") - 1000000L).as("doc_a"),
            col("simhash").as("sh_b"))
        a.join(b, "doc_a")
          .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
          .withColumn("lsh_candidate", expr(
            """exists(sequence(0, 7),
               j -> (shiftright(sh_a, j * 8) & 255) =
                    (shiftright(sh_b, j * 8) & 255))"""))
          .select(col("doc_a"), (col("doc_a") + 1000000L).as("doc_b"),
            col("hamming"), col("lsh_candidate"))
          .orderBy("doc_a")
      }),

    // Exact n-gram Jaccard on bounded candidate pairs (same source, id
    // within 40): |shingles∩| / |shingles∪|. The candidate predicate is the
    // scale bound — at 100 TB you'd get candidates from LSH (above); here
    // the windowed self-join keeps the oracle exactly expressible.
    Q(
      "dedup_ngram_jaccard",
      (s, dir) => {
        val d = shingled(Tables.documents(s, dir)
            .select(col("doc_id"), col("text"), col("source")))
          .select(col("doc_id"), col("source"), col("shingles"))
        d.alias("a").join(d.alias("b"),
            col("a.source") === col("b.source") &&
              col("b.doc_id") > col("a.doc_id") &&
              col("b.doc_id") <= col("a.doc_id") + 40)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            round(
              size(array_intersect(col("a.shingles"), col("b.shingles"))) /
                size(array_union(col("a.shingles"), col("b.shingles")))
                  .cast("double"), 4).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, source,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
                   i -> concat_ws(' ', string_split(text,' ')[i],
                                  string_split(text,' ')[i+1],
                                  string_split(text,' ')[i+2]))) AS shingles
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.shingles, b.shingles)) /
                     CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                          AS DOUBLE), 4) AS jaccard
        FROM d a JOIN d b
          ON a.source = b.source
         AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 40
        ORDER BY doc_a, doc_b""")),

    // Embedding near-dup: top-20 most-cosine-similar vector pairs among
    // vec_id < 300. All math in double (elementwise cast first) with
    // sequential folds so Spark and DuckDB produce bit-identical sums;
    // ordering on round(cos, 6) with id tie-breaks.
    Q(
      "dedup_embedding",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .filter(col("vec_id") < 300)
          .select(col("vec_id"), col("embedding").as("e"))
        e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
            graft.functions.CosineSimilarity(col("a.e"), col("b.e"))
              .as("cos"))
          .orderBy(round(col("cos"), 6).desc, col("id_a"), col("id_b"))
          .limit(20)
          .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
          FROM embeddings WHERE vec_id < 300)
        SELECT id_a, id_b, round(cos, 4) AS cos_sim
        FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        ORDER BY round(cos, 6) DESC, id_a, id_b LIMIT 20"""))
  )
}
