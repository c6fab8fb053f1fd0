package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (bottom-k) distinct-value sketch as a typed Aggregator
  * (Bar-Yossef et al. 2002; the mergeable-summaries formulation of Agarwal
  * et al. 2013, same family as the theta sketch). State is the k smallest
  * DISTINCT hash values seen — bounded at k longs per (partition, group)
  * regardless of input size, merged by union-and-truncate, so partials
  * combine map-side like every sketch in this module (HLL = distinct
  * count, Misra–Gries = heavy hitters, q-digest = quantiles, KMV = the
  * one that supports SET ALGEBRA: union/intersection estimates between
  * groups AFTER aggregation, from the sketches alone).
  *
  * The hash is the splitmix64 finalizer (public-domain avalanche; Steele
  * et al. 2014) truncated to [0, 2^53): deterministic, seedless, and
  * engine-portable integer arithmetic — two sketches built anywhere agree
  * bit-for-bit. 53 bits keeps `shared · 2^53` inside a long for k ≤ 512
  * (the downstream intersection estimator multiplies before dividing).
  *
  * Exactness regime: while a group's distinct count stays < k the sketch
  * IS the full hashed set (θ = full range), so set operations are EXACT —
  * that is the oracle-certified regime. Past k it degrades gracefully to
  * the standard (k−1)/θ estimator with relative error ~1/√(k−2)
  * (KmvSpec bounds it on a forced-truncation fixture).
  *
  * finish() emits the sorted hash array; callers do set algebra with
  * plain array functions (array_intersect / element_at) — see
  * `udaf_kmv_intersect` (operators/Udx.scala).
  */
class KmvSketch(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]]
    with Serializable {
  require(k >= 2 && k <= 512, s"k must be in [2, 512], got $k")

  /** splitmix64 finalizer, truncated to 53 bits (unsigned shift). */
  private def hash(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) >>> 11
  }

  def zero: Seq[Long] = Vector.empty

  def reduce(buf: Seq[Long], x: Long): Seq[Long] = {
    val h = hash(x)
    if (buf.length >= k && h >= buf.last) buf // can't displace the kth min
    else if (buf.contains(h)) buf // O(k) scan; k ≤ 512 keeps this cheap
    else ((buf :+ h).sorted).take(k)
  }

  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  def finish(buf: Seq[Long]): Seq[Long] = buf

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
