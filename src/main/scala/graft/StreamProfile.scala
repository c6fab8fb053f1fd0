package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming fixed-cost profiler: `runMain graft.StreamProfile <key>...`.
  * Registers a StreamingQueryListener and runs the named streaming keys,
  * printing each micro-batch's durationMs breakdown (triggerExecution,
  * queryPlanning, walCommit, stateStore commit, addBatch) plus the
  * wall-clock around the whole key — the tool that tells harness
  * overhead (checkpoint churn, query start/stop) apart from per-batch
  * engine work, so optimization goes where the time actually is.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else Seq("stream_session_window")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        events.add(f"START ${System.nanoTime() / 1e9}%.3f")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        events.add(s"BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        events.add(f"END ${System.nanoTime() / 1e9}%.3f")
    })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.operators.Streaming.prepareInputs(spark, sfDir)
    try graft.operators.DsV2.topic(spark, sfDir) catch { case _: Throwable => () }
    keys.foreach { k =>
      (1 to 2).foreach { rep =>
        events.clear()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(k)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"== $k rep=$rep total=$dt%.3f s rows=$n")
        Thread.sleep(300) // let listener events drain
        events.forEach(e => println(s"   $e"))
      }
    }
    spark.stop()
  }
}
