package graft
import org.apache.spark.sql.SparkSession

/** Batch formatted-plan capture for the optimization-round evidence files:
  * `runMain graft.PlanDump <outDir> <suffix> <key>[,key...] [sfDir]` writes
  * `<outDir>/<key>_<suffix>.txt` with each key's `explain("formatted")`
  * output — one JVM for the whole list (ExplainOne pays a session per key).
  * Same session config as Bench so the captured plan is the benched plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <key>[,key...] [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val keys = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    keys.foreach { key =>
      SparkEntry.queries.get(key) match {
        case None => System.err.println(s"[plandump] unknown key: $key")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            outDir.resolve(s"${key}_$suffix.txt"), txt)
          println(s"[plandump] wrote ${key}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
