package graft

import graft.functions.SquaredDistance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd k-means assignment kernel: value semantics, null/edge
  * rules, and bit-identity with the interpreted HOF fold it replaced
  * (every trained-centroid oracle replay depends on that identity).
  */
class SquaredDistanceSpec extends AnyFunSuite with SparkFixture {

  private def df(pairs: (Seq[Double], Seq[Double])*) = {
    val sp = spark
    import sp.implicits._
    pairs.toSeq.toDF("a", "b")
  }

  private def sd(pairs: (Seq[Double], Seq[Double])*): Seq[Option[Double]] =
    df(pairs: _*)
      .select(SquaredDistance(col("a"), col("b")).as("d"))
      .collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("hand values: zero, unit axes, pythagorean") {
    val r = sd(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(3.0, 4.0)))
    assert(r(0).get == 0.0)
    assert(r(1).get == 2.0)
    assert(r(2).get == 25.0)
  }

  test("null on length mismatch and null input") {
    val sp = spark
    import sp.implicits._
    val r = Seq((Seq(1.0, 2.0), Option(Seq(1.0, 2.0, 3.0))),
      (Seq(1.0, 2.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(SquaredDistance(col("a"), col("b")).as("d"))
      .collect().toSeq.map(_.isNullAt(0))
    assert(r == Seq(true, true))
  }

  test("bit-identical to the interpreted aggregate/zip_with left fold") {
    val e = Tables.embeddings(spark, sf0001).limit(60)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
    val pairs = e.alias("x").crossJoin(e.alias("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val both = pairs.select(
      SquaredDistance(col("x.e"), col("y.e")).as("expr"),
      aggregate(
        zip_with(col("x.e"), col("y.e"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    val diff = both.filter(col("expr") =!= col("hof")).count()
    assert(diff == 0L, s"$diff pairs diverged from the HOF fold")
  }
}
