package graft
import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan census: `runMain graft.PlanAudit [sfDir]`.
  * Prints, per key, the shuffle-Exchange count, plus flags for
  * CartesianProduct and non-broadcast nested-loop joins — the cheap sweep
  * that surfaces a lost broadcast or a redundant repartition across the
  * whole surface at once (PlanShapeSpec then pins the interesting ones).
  * Streaming/side-effecting queries execute their pipelines to build the
  * final frame; run on sf0.001 where that costs seconds.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ex = "Exchange (hash|range|SinglePartition|roundrobin)".r
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          Some((name, ex.findAllIn(p).length,
            p.contains("CartesianProduct"),
            p.contains("BroadcastNestedLoopJoin")))
        } catch { case e: Throwable =>
          System.err.println(s"[planaudit] $name failed: ${e.getMessage}")
          None
        }
    }
    rows.sortBy(-_._2).foreach { case (n, c, cart, bnlj) =>
      println(f"PLANAUDIT $c%3d ${if (cart) "CART " else ""}" +
        f"${if (bnlj) "BNLJ " else ""}$n")
    }
    println(s"PLANAUDIT total=${rows.length} " +
      s"cartesian=${rows.count(_._3)} maxExchanges=${rows.map(_._2).max}")
    spark.stop()
  }
}
