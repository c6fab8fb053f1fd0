package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local session for all specs (one JVM-wide session, UTC, small
  * shuffle fan-out to keep tiny-data tests fast).
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: allow ONE task retry so fault-injection specs
      // (GraftLog commit protocol under a killed writer attempt) can
      // exercise the retry path; plain local[4] fails the job on the
      // first task failure. Specs that assert job failure still pass —
      // the injected error just throws once more before surfacing.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  def spark: SparkSession = SparkFixture.spark
  def sf0001: String = SparkFixture.sf0001
  def sf001: String = SparkFixture.sf001
}
