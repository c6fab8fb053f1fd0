package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-floor probe (VERDICT r13 task 4): times bare count() over each
  * base table at SPARK_GRAFT_SF_DIR in the same JVM/session shape Bench
  * uses, so "key X is scan-bound" claims carry an A/B number instead of
  * an assertion. `runMain graft.ScanBaseline [keys...]` optionally also
  * times the named registry keys right after the floors, warm, for the
  * direct ratio.
  */
object ScanBaseline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def warmMin(f: => Unit): Double = {
      f // warm run not timed
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    // lineitem twice: bare count (footer-only row count) vs a count over
    // a projected+computed column set, which forces real column decode —
    // the honest floor for any operator that must LOOK at the values.
    val li = Tables.lineitem(spark, sfDir)
    val probes: Seq[(String, () => Unit)] = Seq(
      "lineitem_count" -> (() => { li.count(); () }),
      "lineitem_decode" -> (() => {
        li.select(col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
          .agg(sum("c")).head(); () }),
      "events_decode" -> (() => {
        Tables.events(spark, sfDir)
          .agg(sum(col("value")), count(col("event_type"))).head(); () }),
      "documents_decode" -> (() => {
        Tables.documents(spark, sfDir)
          .agg(sum(length(col("text")))).head(); () }),
      "embeddings_decode" -> (() => {
        Tables.embeddings(spark, sfDir)
          .agg(sum(element_at(col("embedding"), 1))).head(); () }))
    probes.foreach { case (name, f) =>
      println(f"""{"probe":"$name","warm_sec":${warmMin(f())}%.3f}""")
    }
    args.foreach { key =>
      SparkEntry.queries.get(key) match {
        case Some(fn) =>
          val t = warmMin { fn(spark, sfDir).count(); () }
          println(f"""{"key":"$key","warm_sec":$t%.3f}""")
        case None => System.err.println(s"[scanbaseline] unknown key $key")
      }
    }
    spark.stop()
  }
}
