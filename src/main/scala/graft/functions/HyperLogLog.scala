package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** From-scratch HyperLogLog as a typed Aggregator — a fully-owned
  * approximate-distinct sketch (SURVEY.md §7.3: make `agg_approx_distinct`
  * "ours" rather than delegating to approx_count_distinct).
  *
  * Standard HLL (Flajolet et al. 2007): p-bit register index, rank = number
  * of leading zeros of the remaining 64-p bits + 1, harmonic-mean estimate
  * with the alpha_m bias constant, linear counting below the small-range
  * threshold. Registers merge by element-wise max, so the Aggregator
  * partial-aggregates map-side like any builtin: the shuffle carries one
  * 2^p-byte buffer per (partition, group), never raw values — the property
  * that makes distinct-counting feasible at 100 TB.
  *
  * Hashing uses the 64-bit finalizer of SplitMix64 over the input long —
  * deterministic everywhere, no RNG.
  */
object Hll {

  def hash(x: Long): Long = {
    // SplitMix64 finalizer — public-domain mixing constants.
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def alpha(p: Int): Double = {
    val m = 1 << p
    p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
  }

  def reduce(buf: Array[Byte], x: Long, p: Int): Array[Byte] = {
    val h = hash(x)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
    buf
  }

  /** Element-wise max into `a` — the lossless sketch union. Register
    * arrays must agree in length (same precision p): merging a larger
    * sketch would silently drop its extra registers (wrong estimate), a
    * smaller one would throw mid-task — fail fast with the cause instead.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"HLL register mismatch: ${a.length} vs ${b.length} " +
        "(sketches built with different precision p cannot be merged)")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def estimate(buf: Array[Byte], p: Int): Long = {
    val m = 1 << p
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << (buf(i) & 0xff)).toDouble
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha(p) * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

class HyperLogLog(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Long] with Serializable {
  require(p >= 4 && p <= 16, s"precision $p out of range [4,16]")

  def zero: Array[Byte] = new Array[Byte](1 << p)
  def reduce(buf: Array[Byte], x: Long): Array[Byte] = Hll.reduce(buf, x, p)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(buf: Array[Byte]): Long = Hll.estimate(buf, p)
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Sketch-as-column: aggregates raw values into the HLL register buffer
  * itself. Pre-aggregated sketches can be stored alongside rollup tables
  * and later unioned with [[HllMerge]] — the pattern that lets a 100 TB
  * pipeline answer distinct-count questions over any group combination
  * without re-reading raw data. Register-max union is lossless, so the
  * merged estimate is bit-identical to sketching the raw union.
  */
class HllSketch(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Array[Byte]] with Serializable {
  require(p >= 4 && p <= 16, s"precision $p out of range [4,16]")

  def zero: Array[Byte] = new Array[Byte](1 << p)
  def reduce(buf: Array[Byte], x: Long): Array[Byte] = Hll.reduce(buf, x, p)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(buf: Array[Byte]): Array[Byte] = buf
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union of pre-aggregated HLL sketch columns → distinct-count estimate. */
class HllMerge(p: Int = 12)
    extends Aggregator[Array[Byte], Array[Byte], Long] with Serializable {
  require(p >= 4 && p <= 16, s"precision $p out of range [4,16]")

  def zero: Array[Byte] = new Array[Byte](1 << p)
  def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] =
    Hll.merge(buf, sk)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(buf: Array[Byte]): Long = Hll.estimate(buf, p)
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
