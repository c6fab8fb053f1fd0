package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with SparkFixture {

  private def df(pairs: (Seq[Float], Seq[Float])*) = {
    val sp = spark
    import sp.implicits._
    pairs.toSeq.toDF("a", "b")
  }

  private def cos(pairs: (Seq[Float], Seq[Float])*): Seq[Option[Double]] =
    df(pairs: _*)
      .select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("orthogonal, identical, and opposite vectors") {
    val r = cos(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f), Seq(-1f, 0f)))
    assert(math.abs(r(0).get - 0.0) < 1e-12)
    assert(math.abs(r(1).get - 1.0) < 1e-12)
    assert(math.abs(r(2).get - (-1.0)) < 1e-12)
  }

  test("null on length mismatch and zero-norm") {
    val r = cos(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),
      (Seq(0f, 0f), Seq(1f, 2f)))
    assert(r == Seq(None, None))
  }

  test("matches the DataFrame aggregate/zip_with formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.alias("x").crossJoin(e.alias("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val dfSide = pairs.select(
      (aggregate(
        zip_with(
          transform(col("x.embedding"), v => v.cast("double")),
          transform(col("y.embedding"), v => v.cast("double")),
          (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate(transform(col("x.embedding"), v => v.cast("double")),
          lit(0.0), (acc, v) => acc + v * v)) *
          sqrt(aggregate(transform(col("y.embedding"), v => v.cast("double")),
            lit(0.0), (acc, v) => acc + v * v)))).as("c"))
    val exprSide = pairs.select(
      CosineSimilarity(col("x.embedding"), col("y.embedding")).as("c"))
    val a = dfSide.collect().map(_.getDouble(0))
    val b = exprSide.collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length > 100)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("cosine is symmetric") {
    val r1 = cos((Seq(0.3f, -0.7f, 0.2f), Seq(0.1f, 0.9f, -0.4f)))
    val r2 = cos((Seq(0.1f, 0.9f, -0.4f), Seq(0.3f, -0.7f, 0.2f)))
    assert(r1 == r2)
  }
}
