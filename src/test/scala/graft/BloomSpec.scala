package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** The relational Bloom filter (udaf_bloom_portable): both Bloom laws on
  * the corpus — false negatives impossible, false positives priced near
  * the (1−e^{−kn/m})^k theory point — plus internal consistency and a
  * hand fixture where membership is fully enumerable.
  */
class BloomSpec extends AnyFunSuite with SparkFixture {

  test("corpus: no false negatives, priced false positives, consistent") {
    val r = SparkEntry.queries("udaf_bloom_portable")(spark, sf001)
      .collect()(0)
    val (members, bitsSet) = (r.getLong(0), r.getLong(1))
    val (probes, nTrue) = (r.getLong(2), r.getLong(3))
    val (pos, fp, fn, fpr) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))
    assert(fn == 0L, "a Bloom filter can NEVER miss a member")
    assert(pos == nTrue - fn + fp, r.toString) // positives decompose
    assert(fp > 0, "vacuous: no false positive exercised")
    // k=4, n=292, m=4096 -> theory ~0.0038; allow a loose 3x envelope.
    assert(fpr > 0 && fpr < 0.012, s"fpr $fpr out of envelope")
    assert(bitsSet <= 4 * members && bitsSet <= 4096)
    assert(probes == 2000 && nTrue == 292)
  }

  test("hand fixture: enumerable membership, every member found") {
    val sp = spark
    import sp.implicits._
    // parts 1..5; only parts 1,2 appear in a 1-URGENT Jan-1995 order.
    val part = (1L to 5L).map(i => (i, s"part$i", "B", "T", 1, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val orders = Seq(
      (100L, 1L, "O", 10.0,
        Timestamp.valueOf("1995-01-10 00:00:00"), "1-URGENT"),
      (101L, 1L, "O", 10.0,
        Timestamp.valueOf("1995-06-10 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((100L, 1L), (100L, 2L), (101L, 3L)).zipWithIndex
      .map { case ((o, p), i) =>
        (o, p, 1L, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
          Timestamp.valueOf("1995-01-10 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = graft.Scratch.fresh("bloom_spec")
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("udaf_bloom_portable")(sp, dir)
      .collect()(0)
    assert(r.getLong(0) == 2L, r.toString) // parts 1,2 (June excluded)
    assert(r.getLong(2) == 5L && r.getLong(3) == 2L, r.toString)
    assert(r.getLong(6) == 0L, r.toString) // both members found
    // 8 bits over 4096: collisions for 3 probes ~ impossible -> 0 fp
    assert(r.getLong(5) == 0L && r.getDouble(7) == 0.0, r.toString)
  }
}
