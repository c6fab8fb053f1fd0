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
class HyperLogLog(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Long] with Serializable {
  require(p >= 4 && p <= 16, s"precision $p out of range [4,16]")

  private val m = 1 << p
  private val alpha = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  private def hash(x: Long): Long = {
    // SplitMix64 finalizer — public-domain mixing constants.
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def zero: Array[Byte] = new Array[Byte](m)

  def reduce(buf: Array[Byte], x: Long): Array[Byte] = {
    val h = hash(x)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
    buf
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << (buf(i) & 0xff)).toDouble
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
