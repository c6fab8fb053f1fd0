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
  private val ex = "Exchange (hash|range|SinglePartition|roundrobin)".r

  /** Compact plan-class tag for one physical plan string: shuffle-Exchange
    * count plus cartesian / nested-loop flags (`"e3"`, `"e1,bnlj"`,
    * `"e0,cart"`). Bench embeds this per key in its artifact so
    * accepted-demo status (e.g. join_theta_range's by-design BNLJ) is
    * machine-readable instead of verdict folklore (VERDICT r10 task 8).
    */
  def planClass(plan: String): String = {
    val n = ex.findAllIn(plan).length
    val flags = Seq(
      if (plan.contains("CartesianProduct")) Some("cart") else None,
      if (plan.contains("BroadcastNestedLoopJoin")) Some("bnlj") else None
    ).flatten
    (s"e$n" +: flags).mkString(",")
  }

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
