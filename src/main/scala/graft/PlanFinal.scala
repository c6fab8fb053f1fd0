package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Post-execution diagnostics for one or more registry keys:
  * `runMain graft.PlanFinal <key>[,key...] [sfDir]` runs each key once
  * after the standard warmup and prints (a) per-job wall-clock lines and
  * (b) the AQE-FINAL executed plan — the two things PlanDump's
  * pre-execution explain cannot show (exchange reuse, AQE coalescing,
  * where the seconds actually went). Iteration tool only; never part of
  * the bench path.
  */
object PlanFinal {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanFinal <key>[,key...] [sfDir]")
    val keys = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.warmup(spark, sfDir)
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.remove(je.jobId).foreach { t0 =>
          lines.add(f"  job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        lines.add(f"    stage ${si.stageId}%4d ${ms / 1e3}%7.3f s " +
          f"tasks=${si.numTasks}%4d ${si.name.take(60)}")
      }
    }
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(s"=== PLANFINAL $key rows=$n wall=" + f"$wall%.2f s ===")
      lines.toArray.foreach(println)
      lines.clear()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
