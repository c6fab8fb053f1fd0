package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.scalatest.funsuite.AnyFunSuite

/** Stage/job budgets for the ITERATIVE keys — the regression class the
  * plan-shape census cannot see (round 11). PlanShapeSpec pins Exchange
  * counts in the final plan, but a missing per-round materialization
  * multiplies EXECUTED stages, not planned Exchanges: each round's
  * broadcast subtree silently re-executes rounds 1..k-1 (O(k²/2) stage
  * growth) while the top-level plan looks identical. That is exactly
  * the bug found in pagerank's undirected path this round (4.2 s →
  * 2.6 s at sf0.1 once materialized — api.Graph.pageRank scaladoc), so
  * the guard counts what the scheduler actually ran.
  *
  * Budgets are generous upper bounds (≈1.5× measured at sf0.001, where
  * the round structure is identical to any scale): a quadratic
  * re-execution roughly doubles-to-triples the stage count for these
  * round counts, so the bound trips on the bug class while ambient
  * retry/AQE jitter stays far below it. Measured baselines are noted
  * per key; re-measure with the printout below when a key's round
  * structure legitimately changes.
  */
class StageBudgetSpec extends AnyFunSuite with SparkFixture {

  /** (jobs, stages) the scheduler ran for one execution of `key`. The
    * listener bus is async — poll until the counters go quiet rather
    * than reaching into the private listenerBus API.
    */
  private def schedulerWork(key: String): (Int, Int) = {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit = {
        // Count first attempts only: a transient task/executor failure on
        // a loaded machine resubmits the SAME stage with attemptNumber>0,
        // which is environment noise, not a lineage regression (the bug
        // class this spec guards re-executes DISTINCT upstream stages).
        if (ss.stageInfo.attemptNumber() == 0) stages.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries(key)(spark, sf0001).count()
      var last = (-1, -1)
      var quietFor = 0
      while (quietFor < 3) {
        Thread.sleep(100)
        val now = (jobs.get, stages.get)
        if (now == last) quietFor += 1 else { quietFor = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    (jobs.get, stages.get)
  }

  // key -> (max jobs, max stages), ≈1.35× the measured baseline (noted
  // inline; AQE's per-shuffle jobs are included — jobs == stages when
  // every broadcast/checkpoint subtree is fully reused, which is itself
  // the healthy signature these baselines encode).
  private val budgets: Seq[(String, Int, Int)] = Seq(
    ("graph_pagerank", 48, 48), // measured 36/36 (5 rounds + AQE)
    ("graph_bfs", 55, 55), // measured 41/41 (frontier + exit probes)
    ("graph_sssp", 42, 42), // measured 31/31 (maxHops relaxations)
    ("dedup_connected_components", 98, 98), // measured 73/73
    ("ml_kmeans", 29, 29), // measured 21/21 (5 Lloyd rounds)
    ("graph_label_propagation", 19, 19), // measured 14/14 (adj build +
    // one single-job 3-round fixpoint — the no-per-round-checkpoint
    // signature; a jump toward ~40 means rounds re-materialized)
    ("graph_kcore", 53, 53) // measured 39/39 (4 × (deg + edge
    // checkpoint) + final census union)
  )

  budgets.foreach { case (key, maxJobs, maxStages) =>
    test(s"$key stays inside its scheduler budget " +
      s"(<=$maxJobs jobs, <=$maxStages stages)") {
      val (j, s) = schedulerWork(key)
      info(s"$key ran $j jobs / $s stages at sf0.001")
      assert(j <= maxJobs,
        s"$key ran $j jobs (> $maxJobs): a per-round materialization " +
          "was likely dropped, or a scalar probe loop regressed")
      assert(s <= maxStages,
        s"$key ran $s stages (> $maxStages): broadcast/checkpoint " +
          "subtrees are re-executing earlier rounds (the pagerank-bug " +
          "class) — check lineage cuts before raising this budget")
    }
  }
}
