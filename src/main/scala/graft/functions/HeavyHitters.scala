package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** From-scratch Misra–Gries heavy-hitters sketch as a typed Aggregator.
  *
  * Classic frequent-items summary (Misra & Gries 1982) with the mergeable
  * formulation of Agarwal et al. 2013 ("Mergeable Summaries"): keep at most
  * k counters; an unmatched arrival decrements all counters when the table
  * is full; merging adds counter tables then subtracts the (k+1)-largest
  * count and drops non-positives. Guarantees: every item with true
  * frequency > n/(k+1) survives, and each kept counter lower-bounds the
  * true count by at most n/(k+1).
  *
  * Like the HLL, the buffer is bounded (≤ k entries) regardless of input
  * size, and partial aggregation runs map-side — the shuffle carries one
  * k-entry table per (partition, group), never raw values. That is what
  * makes "top URLs / top n-grams over 100 TB" a one-pass query.
  */
class HeavyHitters(k: Int = 16)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]]
    with Serializable {
  require(k >= 1, s"k must be positive, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all step: drop counters that hit zero
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      val cut = sum.values.toSeq.sortBy(-_)(Ordering.Long)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  /** Descending by lower-bound count, then lexicographic — deterministic. */
  def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
