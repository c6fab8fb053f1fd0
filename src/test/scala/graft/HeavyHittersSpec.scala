package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees on a synthetic skewed stream: items above the
  * n/(k+1) frequency threshold always survive, kept counts lower-bound the
  * truth, and the sketch merges correctly across partitions.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkFixture {

  test("MG keeps guaranteed-frequent items with valid lower bounds") {
    val sp = spark
    import sp.implicits._
    // 10k rows: "whale" 30%, "shark" 15%, long tail of 1k rare items.
    val data = sp.range(10000).select(
      when(col("id") % 10 < 3, "whale")
        .when(col("id") % 10 < 4, lit("shark"))
        .otherwise(concat(lit("tail_"), (col("id") % 1000).cast("string")))
        .as("item"))
    val hh = data.repartition(8) // force multi-partition merge path
      .agg(api.Sketches.heavyHitters(col("item"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // freq > n/(k+1) = 10000/17 ≈ 588 ⇒ whale (3000) and shark (1000) must
    // survive any arrival/merge order.
    assert(hh.contains("whale") && hh.contains("shark"))
    assert(hh("whale") <= 3000 && hh("shark") <= 1000) // lower bounds
    assert(hh("whale") > hh("shark")) // order preserved at this skew
    assert(hh.size <= 16)
    // error bound: lb >= true - n/(k+1)
    assert(hh("whale") >= 3000 - 10000 / 17)
  }

  test("single-partition sketch of distinct items caps at k counters") {
    val sp = spark
    import sp.implicits._
    val hh = sp.range(1000).select(col("id").cast("string").as("item"))
      .coalesce(1)
      .agg(api.Sketches.heavyHitters(col("item"), 8).as("hh"))
      .select(size(col("hh"))).collect()(0).getInt(0)
    assert(hh <= 8)
  }

  test("merge subtracts the (k+1)-th count and keeps positives") {
    val agg = new HeavyHitters(2)
    val a = Map("x" -> 10L, "y" -> 3L)
    val b = Map("z" -> 4L, "y" -> 1L)
    // sum = x:10, y:4, z:4 → cut = 3rd largest = 4 → x:6 survives only
    val m = agg.merge(a, b)
    assert(m == Map("x" -> 6L))
  }
}
