package graft

import org.apache.spark.sql.SparkSession

/** Single-key wall-clock probe: `runMain graft.KeyTime <sfDir> <key>[,key…]
  * [reps]`. Runs each named registry key `reps` times (default 3) after the
  * same layout warmup Bench uses and prints per-rep seconds plus the warm
  * minimum — the number the cross-round per-key comparisons use. Exists so
  * a perf iteration on one key doesn't cost a 150 s full-registry sweep.
  */
object KeyTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.warmup(spark, sfDir)
    keys.foreach { key =>
      SparkEntry.queries.get(key) match {
        case None => System.err.println(s"[keytime] unknown key: $key")
        case Some(fn) =>
          val ts = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val s = (System.nanoTime() - t0) / 1e9
            (s, n)
          }
          val warm = ts.drop(1).map(_._1).minOption.getOrElse(ts.head._1)
          println(f"KEYTIME $key%s rows=${ts.head._2}%d " +
            f"reps=[${ts.map(t => f"${t._1}%.2f").mkString(",")}] warm=$warm%.2f")
      }
    }
    spark.stop()
  }
}
