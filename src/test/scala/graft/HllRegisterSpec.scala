package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_hll_register: the packed (idx, rank) must agree with the owned
  * Hll UDAF's reduce() bucketing (same SplitMix64, same p = 12), and the
  * SQL-registered form must match the Column API (codegen ≡ interpreted).
  */
class HllRegisterSpec extends AnyFunSuite with SparkFixture {

  test("packed register agrees with Hll.reduce for sample values") {
    val sp = spark
    import sp.implicits._
    val xs = Seq(0L, 1L, 42L, -7L, 123456789L, Long.MaxValue)
    val got = xs.toDF("x")
      .select(graft.functions.HllRegister(col("x")).as("pk"))
      .collect().map(_.getLong(0))
    xs.zip(got).foreach { case (x, pk) =>
      val h = graft.functions.Hll.hash(x)
      val idx = h >>> 52
      val rank = math.min(
        java.lang.Long.numberOfLeadingZeros((h << 12) | 1L) + 1, 63)
      assert(pk == idx * 256L + rank, s"x=$x")
      // and the buffer the UDAF would build agrees on the bucket
      val buf = graft.functions.Hll.reduce(new Array[Byte](4096), x, 12)
      assert(buf(idx.toInt) == rank.toByte, s"x=$x")
    }
  }

  test("null propagation") {
    val sp = spark
    import sp.implicits._
    val n = Seq[Option[Long]](None).toDF("x")
      .select(graft.functions.HllRegister(col("x"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
