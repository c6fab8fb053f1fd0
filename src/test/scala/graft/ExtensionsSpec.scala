package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: SQL-callable graft_cosine and the
  * self-cosine optimizer rule, exercised in a dedicated session built with
  * withExtensions (the deployment path: spark.sql.extensions=...).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would return the shared fixture session (ignoring
    // withExtensions); clear the active/default session so a NEW session —
    // with the extensions installed — is created on the same SparkContext,
    // then restore the fixture as default for the other suites.
    val prior = SparkFixture.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .getOrCreate()
    SparkSession.setDefaultSession(prior)
    SparkSession.setActiveSession(prior)
    s
  }

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                    array(CAST(0 AS FLOAT), CAST(1 AS FLOAT))) AS c
        |""".stripMargin).collect()
    assert(math.abs(r(0).getDouble(0)) < 1e-12)
  }

  test("graft_dot is callable from SQL and unnormalized") {
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |                 array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d
        |""".stripMargin).collect()
    assert(r(0).getDouble(0) == 11.0)
  }

  test("graft_qdot is callable from SQL and exact") {
    val r = spark.sql(
      "SELECT graft_qdot(array(1, 2, 3), array(4, 5, 6)) AS d").collect()
    assert(r(0).getLong(0) == 32L)
  }

  test("graft_sqdist is callable from SQL and exact") {
    val r = spark.sql(
      """SELECT graft_sqdist(array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)),
        |                    array(CAST(3 AS DOUBLE), CAST(4 AS DOUBLE)))
        |       AS d
        |""".stripMargin).collect()
    assert(r(0).getDouble(0) == 25.0)
  }

  test("graft_hll_register is callable from SQL and matches the API") {
    val r = spark.sql(
      "SELECT graft_hll_register(CAST(5 AS BIGINT)) AS pk").collect()
    val h = graft.functions.Hll.hash(5L)
    val expect = (h >>> 52) * 256L + math.min(
      java.lang.Long.numberOfLeadingZeros((h << 12) | 1L) + 1, 63)
    assert(r(0).getLong(0) == expect)
  }

  test("graft_zorder is callable from SQL and interleaves") {
    val r = spark.sql(
      "SELECT graft_zorder(CAST(3 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .collect()
    assert(r(0).getLong(0) == 15L)
  }

  test("graft_zorder coerces integral arguments without explicit casts") {
    // Bare INT literals (and int columns) must analyze: ImplicitCast
    // widens them to BIGINT like any built-in numeric expression.
    val r = spark.sql("SELECT graft_zorder(3, 3) AS z").collect()
    assert(r(0).getLong(0) == 15L)
    val err = intercept[Exception](
      spark.sql("SELECT graft_zorder(array(1), 3)").collect())
    assert(err.getMessage.toLowerCase.contains("graft_zorder"))
  }

  test("self-cosine folds to 1.0 for non-nullable input") {
    val df = spark.sql(
      """SELECT graft_cosine(v, v) AS c FROM (
        |  SELECT array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)) AS v)""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_cosine"), optimized)
    assert(df.collect()(0).getDouble(0) == 1.0)
  }

  test("nullable input is NOT rewritten (semantics preserved)") {
    val df = spark.sql(
      """SELECT graft_cosine(v, v) AS c FROM (
        |  SELECT IF(id % 2 = 0, array(CAST(id + 1 AS FLOAT)), NULL) AS v
        |  FROM range(4))""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    val rows = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.count(_.isEmpty) == 2)
    assert(rows.flatten.forall(v => math.abs(v - 1.0) < 1e-12 || v.isNaN == false))
  }
}
