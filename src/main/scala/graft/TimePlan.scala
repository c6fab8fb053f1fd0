package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docsAll = spark.read.parquet(sfDir + "/documents.parquet")
    val docs = graft.api.Pipeline.sampleEntities(docsAll, col("doc_id"), pct = 40)
    val sh = docs
      .select(col("doc_id").as("id"), array_distinct(graft.api.Dedup.shingles(col("text"), 3)).as("shs"))
      .withColumn("nsh", size(col("shs")).cast("long"))
      .filter(col("nsh") > 0)
    val inv = sh
      .select(col("id"), col("nsh"), explode(col("shs")).as("g"))
      .select(col("id"), col("nsh"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
    (1 to 3).foreach { r =>
      var t0 = System.nanoTime()
      val ni = inv.count()
      val t1 = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      val invc = inv.localCheckpoint(true)
      val t2 = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      val nj = invc.alias("a").join(invc.alias("b"),
          col("a.gh") === col("b.gh") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.nsh").as("na"), col("b.nsh").as("nb"))
        .agg(count(lit(1)).as("inter")).count()
      val t3 = (System.nanoTime()-t0)/1e9
      println(f"TIMEPLAN rep=$r invCount=$t1%.2f($ni) invChk=$t2%.2f joinOnChk=$t3%.2f($nj)")
    }
    spark.stop()
  }
}
