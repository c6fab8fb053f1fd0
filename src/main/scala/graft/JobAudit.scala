package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Registry-wide SCHEDULER census: `runMain graft.JobAudit [sfDir]
  * [keys...]`. Companion to [[PlanAudit]] — that tool reads the PLANNED
  * shape (Exchange count), this one counts the jobs and stages the
  * scheduler actually RAN per key, which is where the
  * re-execution bug class lives: a broadcast or scalar-probe subtree
  * that replays earlier rounds multiplies executed stages while the
  * top-level plan stays identical (api.Graph.pageRank's undirected
  * path, fixed round 11 — 4.2 s → 2.6 s at sf0.1). Sorted descending;
  * a key whose stage count is far above its family's is the next
  * lineage-cut candidate. StageBudgetSpec pins the iterative five;
  * this is the sweep that finds the sixth.
  */
object JobAudit {

  /** (jobs, stages) one execution of `fn` costs. Listener events are
    * async — poll until quiet instead of touching the private bus API.
    */
  private def measure(body: => Unit, spark: SparkSession): (Int, Int) = {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try {
          val (j, s) = measure(fn(spark, sfDir).count(), spark)
          Some((name, j, s))
        } catch { case e: Throwable =>
          System.err.println(s"[jobaudit] $name failed: ${e.getMessage}")
          None
        }
      }
    rows.sortBy(-_._3).foreach { case (n, j, s) =>
      println(f"JOBAUDIT jobs=$j%3d stages=$s%3d $n")
    }
    // maxOption: if every key failed (e.g. a bad sfDir), an empty rows
    // list must not turn the per-key error output into a driver crash.
    println(s"JOBAUDIT total=${rows.length} " +
      s"maxStages=${rows.map(_._3).maxOption.getOrElse(0)} " +
      s"sumJobs=${rows.map(_._2).sum}")
    spark.stop()
  }
}
