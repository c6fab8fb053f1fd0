package graft

import org.scalatest.funsuite.AnyFunSuite

/** 100×-scale slope certification (r13 verdict task 1): the 12 heaviest
  * keys' linearity claims — adaptive-ε candidate degree, bounded-radius
  * frontier growth, hub caps, banded probing — are MEASURED to 100× by
  * `runMain graft.ScaleSlope --x100` and the per-key warm 10×→100×
  * slopes land in SLOPES_X100.json at the repo root. This spec is the
  * ceiling: it FAILS if any certified key's recorded slope exceeds its
  * documented bound, if a key is missing from the artifact, or if the
  * artifact recorded an error for it — so the linearity claims can
  * never silently regress to prose.
  *
  * Bounds rationale: data grows 10× per step, so a perfectly linear
  * operator on fixed parallelism reads ≤ 10; sub-linear readings happen
  * when the 10× point under-utilizes the 32 cores (fixed per-job
  * overhead amortizes). The bound is 10 × a per-key headroom factor for
  * documented super-linear terms (sort/log factors, candidate-pair
  * densification on the synthetic near-dup structure) plus measurement
  * noise on a shared box. A bound of 15 = "linear with 1.5× headroom";
  * keys with a documented extra factor carry more and say why.
  * `sim_ann_graph` is quadratic BY CONTRACT at fixture scale (exact
  * k-NN build; NN-descent is the corpus-scale path per its scaladoc) —
  * its 100× point is skipped by the harness and the asserted bound is
  * its 1×→10× slope instead.
  */
class SlopeSpec extends AnyFunSuite {

  /** (bound on warm slope_10_100, rationale). */
  private val bounds: Map[String, (Double, String)] = Map(
    "graph_pagerank" -> (15.0, "per-round share join linear in edges"),
    "graph_label_propagation" -> (15.0, "min-label rounds linear in edges"),
    "graph_betweenness" -> (20.0,
      "5-seed radius-4 frontier joins; frontier saturates to node set"),
    "graph_kcore" -> (15.0, "peel rounds linear in remaining edges"),
    "graph_modularity" -> (15.0, "community census linear in edges"),
    "ml_dbscan_grid" -> (20.0,
      "adaptive eps holds expected degree ~5; candidates linear in points"),
    "graph_random_walk" -> (15.0, "per-hop broadcast join linear in edges"),
    "dq_drift_psi" -> (15.0, "one scan + type-by-bucket aggregate"),
    "graph_sssp" -> (15.0, "frontier relaxation linear in touched edges"),
    "dedup_incremental" -> (15.0, "delta-only banded probing"),
    "graph_jaccard_capped" -> (25.0,
      "wedge volume capped at deg<=64 but synthetic densification " +
        "grows shared-neighbor overlap superlinearly below the cap"),
    "sim_ann_nndescent" -> (20.0,
      "rounds x n x k^2 scoring + one distinct per round; reverse cap " +
        "bounds candidates regardless of in-degree skew"),
    // quadratic-by-contract fixture build: 1x->10x warm slope asserted
    "sim_ann_graph" -> (120.0,
      "exact kNN graph build is O(n^2) BY CONTRACT at fixture scale"),
    // round 15 (VERDICT r14 task 1): the next cost tier, measured solo
    // at 48g heap (8g OOM'd the two heaviest graph fixpoints at the
    // 60M-row 100x point — protocol note in NOTES r15)
    "dedup_fuzzy_cluster" -> (15.0,
      "brand-blocked levenshtein pairs: block cardinality scales with " +
        "the corpus so blocks stay constant-size; CC is log-round"),
    "mix_dedup_weighted" -> (15.0,
      "LSH band-bucket candidates O(corpus x bands); confirm joins " +
        "touch candidates only; CC + weight rollup linear"),
    "graph_hits" -> (15.0,
      "per-round hub/auth share joins linear in purchase edges under " +
        "the quietRounds valve"),
    "graph_anf_hll" -> (15.0,
      "register-OR frontier folds linear in edges; HLL state is " +
        "per-node constant width"),
    "graph_closeness" -> (15.0,
      "bounded-radius BFS frontier joins; frontier saturates to the " +
        "seed set's reachable nodes"),
    // NOT an engine regression at 60: the synthetic corpus draws from a
    // FIXED 50-token vocabulary, so the 3-shingle space (125k combos)
    // saturates between 10x (mean df ~8.5) and 100x (mean df ~85, still
    // under the maxDf=256 stop-shingle cap) — candidate volume sum(df^2)
    // grows ~quadratically BY WORKLOAD in that window, while per-pair
    // throughput stays flat (t100_warm 142 s over ~9e8 candidate pairs).
    // Real corpora grow shingle DIVERSITY with size instead of
    // saturating, and the key's 100 TB contract is sample/LSH-bounded
    // with the cap as the boilerplate valve (scaladoc + SURVEY row).
    // r16 (VERDICT r15 task 2): bound tightened 60 -> 55 (just above the
    // measured 52.8) and the row is now explicitly the ADVERSARIAL
    // stress reading — the BINDING production-regime certificate is
    // dedup_containment_vocabscale directly below, measured on a corpus
    // whose vocabulary grows with size like real corpora do.
    "dedup_containment" -> (55.0,
      "sum(df^2) candidate densification on the saturating synthetic " +
        "shingle vocabulary — workload-quadratic window below the " +
        "maxDf cap; engine per-pair cost flat; production regime " +
        "certified by the _vocabscale row"),
    // Same operator, Heaps-law vocabulary-scaling corpus (ScaleSlope
    // --vocabscale): distinct shingles track token mass, mean df stays
    // O(1), candidate volume sum(df^2) stays linear — measured 5.8 at
    // 10x->100x (t100_warm 16.9 s vs the saturating corpus's 142 s on
    // the same row counts). This is the regime the key's scaladoc
    // claims for real corpora; the bound gives ~2x headroom over the
    // measurement.
    "dedup_containment_vocabscale" -> (12.0,
      "Heaps-law shingle diversity: mean df O(1) so the inverted-index " +
        "join is linear in sampled token mass; measured 5.8 (r16), " +
        "6.3 (r18 re-run after the shingle-index checkpoint revert)"),
    // r18 (VERDICT r17 task 8, the carried r16 weak): the SAME
    // production-regime certificate for the audit key — on the
    // Heaps-law corpus its exact-truth leg's candidate volume sum(df^2)
    // stays linear in sampled token mass (t100_warm 22.7 s vs 242.7 s
    // on the saturating corpus), so the 45-bound saturating row above is
    // confirmed as adversarial-workload stress, not engine curvature.
    "dedup_lsh_audit_vocabscale" -> (12.0,
      "Heaps-law shingle diversity: exact-truth leg linear in sampled " +
        "token mass, LSH leg linear by construction; measured 5.4"),
    "dedup_connected_components" -> (15.0,
      "pair volume bounded by the planted near-dup structure (one " +
        "pair per 10 docs); CC rounds log-diameter, labels broadcast"),
    // same densification window as dedup_containment: the ground-truth
    // leg is the key's self-declared audit-only quadratic tool (exact
    // inverted-index join on the 40% sample), and the synthetic
    // 50-token vocabulary saturates the shingle space between 10x and
    // 100x — sum(df^2) grows ~quadratically there. The LSH leg itself
    // (band-bucket candidates) is linear; production audits on a
    // bounded sample, which is this key's documented 100 TB contract.
    "dedup_lsh_audit" -> (45.0,
      "exact-truth leg is the declared audit-only quadratic join on " +
        "the saturating synthetic shingle vocabulary; LSH leg linear"),
    // round 16 (VERDICT r15 task 4): the remaining >= ~2 s keys, same
    // protocol (3 runs/scale, solo JVM, 48g heap)
    "graph_bfs" -> (15.0,
      "hop-capped (4) frontier joins linear in touched edges; " +
        "frontier saturates to the reachable set; measured 5.1"),
    "graph_walk_pairs" -> (15.0,
      "pair join is per-walk and window-bounded (<= w*len pairs per " +
        "walk, never cross-walk); census one hash agg; measured 2.0"),
    "text_lsa_topics" -> (15.0,
      "tf-idf postings linear in token mass, fixed-rank power " +
        "iteration per-round linear; measured 8.2"),
    "text_ngram_novelty" -> (15.0,
      "n-gram census + novelty join linear in token mass; measured 8.1"),
    "ml_confusion_matrix" -> (18.0,
      "one scan + label-pair census; 10.2 measured = linear once the " +
        "100x point saturates the 32 cores (1x/10x under-utilize), " +
        "small headroom for that knee"),
    "pipeline_corpus_prep" -> (15.0,
      "end-to-end prep composes per-stage linear passes (normalize, " +
        "LID, quality, dedup-lite, pack); measured 9.8, t100 150 s " +
        "is volume, not curvature"),
    // audit-scale exact tool, quadratic BY CONTRACT like sim_ann_graph:
    // wedge volume is sum(deg^2) with no cap (its scaladoc names
    // graph_jaccard_capped — 100x-certified, bound 25 — as the 100 TB
    // default and this key as the bounded-subgraph ground-truther).
    // 100x point skipped by the harness; the asserted bound is the
    // 1x->10x warm slope (11.6 measured: degree grows with corpus on
    // the synthetic generator, so the wedge join is super-linear
    // exactly as documented).
    "graph_jaccard" -> (20.0,
      "exact wedge join sum(deg^2), audit-only by contract; capped " +
        "at 10x, 1x->10x slope asserted"),
    // round 15 streaming extension (10M events at 100x; state_rows in
    // the artifact certify WHAT the state is keyed by)
    "stream_watermark_agg" -> (15.0,
      "state saturates at window x type cardinality (1205 rows at " +
        "100x, flat from 10x) — watermark-scoped, never event-sized"),
    "stream_dedup" -> (15.0,
      "state = distinct keys inside the watermark; grows with key " +
        "cardinality (1.9M at 100x) but per-event cost stays flat"),
    // NOT a store problem: the RocksDB A/B at 100x read 223.5 s vs the
    // HDFS-backed store's 244.8 (and RocksDB is WORSE at 10x, 13.7 vs
    // 10.3 — the JNI overhead BASELINE.md declines at fixture scale).
    // The dominant term is the session operator's per-batch merge-sort
    // over input + touched state, with state legitimately linear in
    // user cardinality (the generator scales users with events;
    // 3.4M session rows at 100x). The engine's 100 TB sessionization
    // path is the BATCH sessionize_gap operator (linear lag/cumsum);
    // streaming session windows are the low-latency tool, priced here.
    "stream_session_window" -> (30.0,
      "per-batch session merge-sort over input + state that is " +
        "linear in users by workload; both state stores measured " +
        "within 10% — inherent operator cost, batch path documented"))

  private lazy val artifact: Map[String, Map[String, String]] = {
    val p = java.nio.file.Paths.get("SLOPES_X100.json")
    assert(java.nio.file.Files.exists(p),
      "SLOPES_X100.json missing at repo root — run " +
        "`runMain graft.ScaleSlope --x100` and commit the artifact")
    val kv = """"([a-z0-9_]+)":\s*("?[^,"}]+"?)""".r
    scala.util.Using.resource(scala.io.Source.fromFile(p.toFile)) {
      _.getLines().filter(_.contains("\"key\"")).map { line =>
        val m = kv.findAllMatchIn(line)
          .map(x => x.group(1) -> x.group(2).stripPrefix("\"")
            .stripSuffix("\"")).toMap
        m("key") -> m
      }.toMap
    }
  }

  for ((key, (bound, why)) <- bounds.toSeq.sortBy(_._1)) {
    test(s"$key: warm 10x->100x slope within documented bound $bound") {
      val row = artifact.getOrElse(key,
        fail(s"$key missing from SLOPES_X100.json"))
      assert(!row.contains("error"), s"$key recorded error: $row")
      val slope =
        if (row.contains("slope_10_100")) row("slope_10_100").toDouble
        else {
          assert(row.get("x100").contains("capped-by-contract"),
            s"$key has neither a 100x point nor a documented cap: $row")
          row("warm_slope").toDouble
        }
      assert(slope <= bound,
        s"$key slope $slope exceeds documented bound $bound ($why)")
    }
  }
}
