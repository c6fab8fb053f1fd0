package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** From-scratch q-digest quantile sketch as a typed Aggregator — the third
  * owned mergeable summary next to HyperLogLog (distinct) and Misra–Gries
  * (heavy hitters).
  *
  * Classic fixed-universe quantile summary (Shrivastava, Buragohain,
  * Agrawal, Suri 2004, "Medians and Beyond"), mergeable in the sense of
  * Agarwal et al. 2013: the digest is a count map over the implicit binary
  * tree of the value universe [0, 2^universeBits); merging is count
  * addition followed by re-compression, and the rank error of any quantile
  * answered from a digest over n values is at most
  * ε·n with ε = universeBits / k.
  *
  * Tree nodes use heap numbering: the root (id 1) covers the whole
  * universe, node v has children 2v and 2v+1, and value x lives in leaf
  * id = 2^universeBits + x. Compression folds low-count sibling pairs into
  * their parent whenever the (parent, left, right) triple's total is at
  * most ⌊n/k⌋, so the kept map stays O(k) entries regardless of input
  * size. Partial aggregation therefore runs map-side and the shuffle
  * carries one O(k) map per (partition, group), never raw values — the
  * same property that makes the HLL and Misra–Gries usable at 100 TB.
  *
  * The aggregator finishes to the quantile values at the requested
  * fractions. Values outside the universe are clamped to its edges (rank
  * error at the clamp is still bounded because clamped values sort to the
  * extremes).
  */
class QDigest(
    fractions: Seq[Double],
    universeBits: Int = 20,
    k: Int = 2048)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]]
    with Serializable {
  require(universeBits >= 1 && universeBits <= 40, "universeBits in [1,40]")
  require(k >= universeBits, "k must be >= universeBits for ε ≤ 1")
  require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1))

  private val universe: Long = 1L << universeBits

  /** Rank-error factor: answering rank error is ≤ epsilon * n. */
  def epsilon: Double = universeBits.toDouble / k

  def zero: Map[Long, Long] = Map.empty

  def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] = {
    val v = math.min(math.max(x, 0L), universe - 1)
    val leaf = universe + v
    val next = buf.updated(leaf, buf.getOrElse(leaf, 0L) + 1L)
    // Amortized compaction: let the map grow to a few×k between passes so
    // compression cost is O(size) per O(size) inserts, not per insert.
    if (next.size > 6 * k) compress(next) else next
  }

  def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (id, c)) =>
      m.updated(id, m.getOrElse(id, 0L) + c)
    }
    compress(sum)
  }

  def finish(buf: Map[Long, Long]): Seq[Long] = {
    val d = compress(buf)
    val n = d.valuesIterator.sum
    if (n == 0L) return fractions.map(_ => 0L)
    // Nodes sorted by (range upper bound asc, range size asc) — every node
    // precedes its ancestors, so accumulating counts in this order gives a
    // rank lower bound within ε·n of the true rank of each upper bound.
    val ordered = d.toSeq
      .map { case (id, c) => (upperBound(id), rangeSize(id), c) }
      .sortBy { case (ub, sz, _) => (ub, sz) }
    fractions.map { f =>
      val target = math.max(1L, math.ceil(f * n).toLong)
      var cum = 0L
      var ans = universe - 1
      var i = 0
      var found = false
      while (i < ordered.length && !found) {
        cum += ordered(i)._3
        if (cum >= target) { ans = ordered(i)._1; found = true }
        i += 1
      }
      ans
    }
  }

  /** Level of a node id: root (id 1) is 0, leaves are universeBits. */
  private def level(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  private def rangeSize(id: Long): Long = 1L << (universeBits - level(id))

  /** Inclusive upper bound of the node's value range. */
  private def upperBound(id: Long): Long = {
    val sz = rangeSize(id)
    val lo = (id - (1L << level(id))) * sz
    lo + sz - 1
  }

  /** One bottom-up pass folding weak (parent,left,right) triples upward. */
  private[functions] def compress(buf: Map[Long, Long]): Map[Long, Long] = {
    val n = buf.valuesIterator.sum
    val t = n / k
    if (t == 0) return buf
    val m = scala.collection.mutable.HashMap.from(buf)
    var lvl = universeBits
    while (lvl >= 1) {
      // Parents of nodes at this level, visited once each.
      val parents = m.keysIterator
        .filter(level(_) == lvl).map(_ >> 1).toSet
      parents.foreach { p =>
        val l = 2 * p; val r = 2 * p + 1
        val triple = m.getOrElse(p, 0L) + m.getOrElse(l, 0L) + m.getOrElse(r, 0L)
        if (triple <= t && triple > 0) {
          m.remove(l); m.remove(r)
          m.update(p, triple)
        }
      }
      lvl -= 1
    }
    m.toMap
  }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
