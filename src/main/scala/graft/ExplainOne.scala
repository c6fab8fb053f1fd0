package graft
import org.apache.spark.sql.SparkSession

/** Print one registry key's formatted physical plan:
  * `runMain graft.ExplainOne <key> [sfDir]`. Companion to [[PlanAudit]]
  * (the census finds the outlier; this shows its plan).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainOne <key> [sfDir]")
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
