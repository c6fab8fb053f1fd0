package graft

import graft.functions.QuantizedDotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The integer dot-product codegen expression: exact values, null
  * semantics, and interpreted-vs-codegen agreement.
  */
class QuantizedDotSpec extends AnyFunSuite with SparkFixture {

  private def dot(a: Seq[Int], b: Seq[Int]): Option[Long] = {
    val sp = spark
    import sp.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(QuantizedDotProduct(col("a"), col("b")).as("d"))
      .collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }
  }

  test("exact integer dot products, incl. 64-bit accumulation") {
    assert(dot(Seq(1, 2, 3), Seq(4, 5, 6)).contains(32L))
    assert(dot(Seq(-127, 127), Seq(127, 127)).contains(0L))
    // would overflow int32: 46341^2 > 2^31
    assert(dot(Seq(46341, 46341), Seq(46341, 46341))
      .contains(2L * 46341L * 46341L))
  }

  test("null on length mismatch") {
    assert(dot(Seq(1, 2), Seq(1, 2, 3)).isEmpty)
  }

  test("matches the aggregate/zip_with formulation on a real column") {
    val sp = spark
    import sp.implicits._
    val df = Tables.embeddings(sp, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 127).cast("int")).as("q"))
      .limit(50)
    val both = df.select(
      QuantizedDotProduct(col("q"), col("q")).as("fused"),
      aggregate(zip_with(col("q"), col("q"),
        (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v).as("folded"))
      .collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
