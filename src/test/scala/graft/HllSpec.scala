package graft

import graft.functions.HyperLogLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch HLL sketch: relative error within the theoretical
  * envelope (~1.04/sqrt(2^p) ≈ 1.6% at p=12; assert a loose 5%), and
  * merge-associativity via repartitioned recomputation.
  */
class HllSpec extends AnyFunSuite with SparkFixture {

  test("HLL estimate within 5% of exact on 100k distinct longs") {
    val sp = spark
    import sp.implicits._
    val hll = udaf(new HyperLogLog(12))
    val n = 100000L
    val est = sp.range(n).select(hll(col("id")).as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est")
  }

  test("estimate is partitioning-invariant (merge correctness)") {
    val hll = udaf(new HyperLogLog(12))
    val base = spark.range(20000)
    val a = base.repartition(1).select(hll(col("id"))).collect()(0).getLong(0)
    val b = base.repartition(7).select(hll(col("id"))).collect()(0).getLong(0)
    assert(a == b, s"$a != $b")
  }

  test("small-range linear counting is near-exact") {
    val hll = udaf(new HyperLogLog(12))
    val est = spark.range(50).select(hll(col("id"))).collect()(0).getLong(0)
    assert(est == 50, s"est=$est")
  }

  test("udaf_hll runs and estimates match exact within 10% per group") {
    SparkEntry.queries("udaf_hll")(spark, sf001).collect().foreach { r =>
      val est = r.getAs[Long]("hll_users")
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(est - exact).toDouble / exact < 0.1,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("sketch-as-column merge is bit-identical to direct sketching") {
    val sp = spark
    import sp.implicits._
    // 40k values split across 7 artificial day-groups: per-group sketches
    // unioned with hllMerge must equal the single-pass estimate EXACTLY
    // (register-max union is lossless).
    val df = sp.range(40000)
      .select(col("id"), (col("id") % 7).as("day"))
    val perDay = df.groupBy("day")
      .agg(graft.api.Sketches.hllSketch(col("id")).as("sk"))
    val merged = perDay.agg(graft.api.Sketches.hllMerge(col("sk")).as("e"))
      .collect()(0).getLong(0)
    val direct = df.agg(graft.api.Sketches.hllCountDistinct(col("id")).as("e"))
      .collect()(0).getLong(0)
    assert(merged == direct, s"merged=$merged direct=$direct")
    assert(math.abs(merged - 40000).toDouble / 40000 < 0.05)
  }
}
