package graft
import org.apache.spark.sql.SparkSession

/** Per-query micro-bench: `runMain graft.QBench <reps> <key> [<key>...]`.
  * Same session config as [[Bench]] (warmup + layout builds included) but
  * times only the named registry keys, `reps` times each, printing one
  * line per (key, rep) plus a median line — the tool for localizing a
  * regression that the full-registry run can only bound to ±10%.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QBench <reps> <key> [<key>...]")
    val reps = args(0).toInt
    val keys = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try {
      graft.operators.LayoutCache.partitionedLineitem(spark, sfDir)
      graft.operators.LayoutCache.zorderedLineitem(spark, sfDir)
      graft.operators.LayoutCache.bucketedTables(spark, sfDir)
      graft.operators.Streaming.prepareInputs(spark, sfDir)
      graft.operators.Similarity.warmIndexes(spark, sfDir)
      graft.operators.Pipeline.warmGraph(spark, sfDir)
      graft.operators.Dedup.warmDedup(spark, sfDir)
      graft.operators.DsV2.topic(spark, sfDir)
    } catch { case _: Throwable => () }
    val qs = SparkEntry.queries
    keys.foreach { k =>
      val fn = qs.getOrElse(k, sys.error(s"unknown key: $k"))
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"QBENCH $k rep=$r sec=$dt%.3f rows=$n")
        dt
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"QBENCH $k MEDIAN=$med%.3f over $reps")
    }
    spark.stop()
  }
}
