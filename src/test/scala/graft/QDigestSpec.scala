package graft

import graft.functions.QDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch q-digest quantile sketch: rank-error within the ε =
  * universeBits/k envelope on skewed data, merge correctness (order/
  * partitioning invariance of the bound, not of the digest), and the
  * Spark aggregate path.
  */
class QDigestSpec extends AnyFunSuite with SparkFixture {

  private def rankOf(sorted: IndexedSeq[Long], v: Long): Int = {
    // count of elements <= v
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def assertBounds(
      d: QDigest, buf: graft.functions.QDigestBuf,
      data: IndexedSeq[Long], fractions: Seq[Double]): Unit = {
    val sorted = data.sorted
    val n = data.length
    val est = d.finish(buf)
    fractions.zip(est).foreach { case (q, v) =>
      val r = rankOf(sorted, v)
      val target = math.ceil(q * n)
      assert(math.abs(r - target) <= d.epsilon * n + 1,
        s"q=$q est=$v rank=$r target=$target eps*n=${d.epsilon * n}")
    }
  }

  test("rank error within eps*n on a skewed distribution") {
    val fr = Seq(0.1, 0.5, 0.9, 0.99)
    val d = new QDigest(fr, universeBits = 16, k = 512)
    // Zipf-ish: many small values, long tail.
    val data = (0 until 50000).map(i => ((i.toLong * i) % 65536))
    val buf = data.foldLeft(d.zero)(d.reduce)
    assertBounds(d, buf, data, fr)
  }

  test("merged halves obey the same bound (mergeability)") {
    val fr = Seq(0.25, 0.5, 0.75)
    val d = new QDigest(fr, universeBits = 16, k = 256)
    val data = (0 until 30000).map(i => ((i.toLong * 2654435761L) % 65536))
    val (l, r) = data.splitAt(11111)
    val merged = d.merge(l.foldLeft(d.zero)(d.reduce),
      r.foldLeft(d.zero)(d.reduce))
    assertBounds(d, merged, data, fr)
    // merge() compacts: the kept digest is O(k), not O(distinct).
    assert(merged.len <= 3 * 256, s"digest size ${merged.len} not O(k)")
    assert(merged.fLen == 0, "merge must leave the raw log empty")
  }

  test("buffer survives java serialization mid-stream (the shuffle path)") {
    // The partial -> final shuffle java-serializes a live buffer (raw log
    // included, possibly uncompacted); the deserialized twin must carry
    // the identical digest forward. Round-trip after an odd number of
    // values so the log is non-empty and unaligned, keep reducing, merge
    // with another shard, and check the eps envelope end-to-end.
    val fr = Seq(0.25, 0.5, 0.9)
    val d = new QDigest(fr, universeBits = 16, k = 256)
    val data = (0 until 20000).map(i => ((i.toLong * 48271) % 65536))
    val (a, b) = data.splitAt(7777)
    var buf = a.foldLeft(d.zero)(d.reduce)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(buf)
    buf = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.functions.QDigestBuf]
    val other = b.foldLeft(d.zero)(d.reduce)
    assertBounds(d, d.merge(buf, other), data, fr)
  }

  test("merging an empty shard is the identity") {
    val fr = Seq(0.5)
    val d = new QDigest(fr, universeBits = 12, k = 128)
    val data = (0 until 5000).map(i => (i.toLong * 7919) % 4096)
    val full = data.foldLeft(d.zero)(d.reduce)
    val before = d.finish(full)
    // finish() compacts in place; rebuild and merge with empties each way
    val rebuilt = data.foldLeft(d.zero)(d.reduce)
    assert(d.finish(d.merge(rebuilt, d.zero)) == before)
    val rebuilt2 = data.foldLeft(d.zero)(d.reduce)
    assert(d.finish(d.merge(d.zero, rebuilt2)) == before)
  }

  test("out-of-universe values clamp to the edges, not crash") {
    val d = new QDigest(Seq(0.5), universeBits = 8, k = 64)
    val buf = Seq(-5L, 1000L, 10L, 10L, 10L).foldLeft(d.zero)(d.reduce)
    val est = d.finish(buf)(0)
    assert(est >= 0 && est <= 255)
  }

  test("Spark aggregate path: per-group quantiles within bound") {
    val sp = spark
    import sp.implicits._
    val fr = Seq(0.5, 0.9)
    val df = sp.range(40000).select(
      (col("id") % 4).as("g"),
      ((col("id") * col("id")) % 32768).as("v"))
    val got = df.groupBy("g")
      .agg(api.Sketches.quantileDigest(col("v"), fr, 15, 512).as("qs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byG = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val eps = 15.0 / 512
    got.foreach { case (g, est) =>
      val sorted = byG(g)
      fr.zip(est).foreach { case (q, v) =>
        val r = rankOf(sorted, v)
        assert(math.abs(r - math.ceil(q * sorted.length)) <=
          eps * sorted.length + 1, s"g=$g q=$q est=$v rank=$r")
      }
    }
  }

  test("native TypedImperativeAggregate path (QDigestAgg) matches the " +
    "udaf path bit-exactly on a deterministic merge tree") {
    // One input partition ⇒ both paths see the identical update order and
    // the identical (single) partial buffer, so the digests — same
    // algorithm by delegation — must finish to the SAME estimates. The
    // multi-partition equivalence is deliberately NOT asserted (merge
    // trees legally differ); the bound tests above cover that.
    val sp = spark
    val fr = Seq(0.25, 0.5, 0.9, 0.99)
    val df = sp.range(0, 60000, 1, 1).select(
      (col("id") % 3).as("g"),
      ((col("id") * 2654435761L) % 1048576).as("v"))
    def run(agg: org.apache.spark.sql.Column) = df.groupBy("g")
      .agg(agg.as("qs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = run(api.Sketches.quantileDigestNative(col("v"), fr, 20, 512))
    val bridged = run(api.Sketches.quantileDigest(col("v"), fr, 20, 512))
    assert(native == bridged, s"native $native vs bridged $bridged")
    // And the native path still obeys the rank bound on its own.
    val byG = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val eps = 20.0 / 512
    native.foreach { case (g, est) =>
      val sorted = byG(g)
      fr.zip(est).foreach { case (q, v) =>
        val r = rankOf(sorted, v)
        assert(math.abs(r - math.ceil(q * sorted.length)) <=
          eps * sorted.length + 1, s"g=$g q=$q est=$v rank=$r")
      }
    }
  }

  test("QDigestOfflineNodes is partitioning-invariant (pure function " +
    "of the multiset) and its fold matches a reference sweep") {
    val sp = spark
    // The offline digest must be bit-identical however the input is
    // partitioned — exact leaf census, order-free merge, one fold at
    // eval. This is the property udaf_qdigest_portable's DuckDB replay
    // rests on (the streaming QDigest has no such guarantee).
    def run(parts: Int) = sp.range(0, 50000, 1, parts)
      .select((col("id") % 2).as("g"),
        ((col("id") * 2654435761L) % 1048576).as("v"))
      .groupBy("g")
      .agg(api.Sketches.quantileDigestOfflineNodes(col("v"), 20, 256)
        .as("nodes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sorted)
      .toMap
    val one = run(1)
    val many = run(32)
    assert(one == many, "digest must not depend on partitioning")
    // Counts conserve: every input value lands in exactly one node.
    one.foreach { case (g, nodes) =>
      assert(nodes.map(_._2).sum == 25000L, s"g=$g mass not conserved")
      // fold rule: every emitted node's count respects the tree (a
      // node's id at lvl sits in [2^lvl, 2^(lvl+1)))
      nodes.foreach { case (id, _, lvl) =>
        assert(id >= (1L << lvl) && id < (2L << lvl), s"($id, $lvl)")
      }
    }
  }

  test("QDigestAgg buffer round-trips its wire format (shuffle path) " +
    "and rejects non-long input") {
    val d = graft.functions.QDigestAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      Seq(0.5), universeBits = 16, k = 256)
    val buf = d.createAggregationBuffer()
    val algo = new QDigest(Seq(0.5), 16, 256)
    (0 until 20000).foreach(i => algo.reduce(buf, (i.toLong * 31) % 65536))
    val back = d.deserialize(d.serialize(buf))
    assert(back.n == buf.n)
    assert(algo.finish(back) == algo.finish(buf))
    assert(back.fLen == 0, "wire format must carry a compacted digest")
    val bad = graft.functions.QDigestAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq(0.5))
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
