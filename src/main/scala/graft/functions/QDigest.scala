package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer for [[QDigest]]: the compressed digest as SORTED
  * parallel (node id, count) arrays plus a raw append-only log of values
  * not yet folded in. The hot path (one value per input row) is a single
  * array append — no hash probe, no boxing, no allocation until the log
  * fills — and compaction is pure primitive-array work: sort the log,
  * run-length-encode it into leaf counts, merge-join with the sorted
  * survivors, sweep levels bottom-up. (The previous LongMap buffer spent
  * ~380 ns/row re-probing and rebuilding the hash around each compress —
  * measured 1.4 s for the sf0.1 600k-row stream vs ~0.15 s for this
  * layout.)
  *
  * `n` is the running total count so compaction never re-sums the digest.
  * Serialized (Java) only at the partial → final shuffle; `compact` is
  * called by merge/finish so shuffled buffers are near-minimal.
  */
final class QDigestBuf extends Serializable {
  /** Sorted (ascending) live node ids of the compressed digest. Ascending
    * id order IS (level, position) order: level L occupies [2^L, 2^(L+1)).
    */
  var ids: Array[Long] = Array.emptyLongArray
  var cnts: Array[Long] = Array.emptyLongArray
  var len: Int = 0
  /** Raw clamped values awaiting compaction (run-length-encoded then). */
  var fresh: Array[Long] = new Array[Long](64)
  var fLen: Int = 0
  /** Total values absorbed (digest + log). */
  var n: Long = 0L
}

object QDigestBuf {
  /** Serialized blob size for `len` (id, cnt) pairs, computed in Long
    * (ADVICE r15): the streaming digest is bounded by O(k·universeBits)
    * but the OFFLINE exact leaf census is bounded only by distinct-value
    * count, so with universeBits up to 40 a census past ~134M leaves
    * would overflow the Int expression `12 + 16 * len` and surface as a
    * bewildering NegativeArraySizeException at shuffle time. Fail loud
    * with the actual numbers instead.
    */
  def wireSize(len: Int): Int = {
    val bytes = 12L + 16L * len
    require(bytes <= Int.MaxValue,
      s"q-digest buffer too large to serialize: $len leaf nodes need " +
        s"$bytes bytes (> Int.MaxValue). Lower universeBits or " +
        "pre-aggregate the input to cut distinct-value count.")
    bytes.toInt
  }
}

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
  * most ⌊n/k⌋, so the kept digest stays O(k) entries regardless of input
  * size. Partial aggregation therefore runs map-side and the shuffle
  * carries one small buffer per (partition, group), never raw values — the
  * same property that makes the HLL and Misra–Gries usable at 100 TB.
  *
  * The buffer ([[QDigestBuf]]) is mutated in place: Spark keeps
  * typed-Aggregator buffers as live objects between rows
  * (TypedImperativeAggregate) and serializes them only at the partial →
  * final shuffle, so per-row cost is one primitive array append.
  * Compaction is amortized (log-capacity-triggered, plus once in
  * merge/finish), and deferring folds never violates the error bound —
  * folding is what CREATES rank error; a less-compressed digest is a more
  * exact one.
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
    extends Aggregator[Long, QDigestBuf, Seq[Long]]
    with Serializable {
  require(universeBits >= 1 && universeBits <= 40, "universeBits in [1,40]")
  require(k >= universeBits, "k must be >= universeBits for ε ≤ 1")
  require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1))

  private val universe: Long = 1L << universeBits

  /** Rank-error factor: answering rank error is ≤ epsilon * n. */
  def epsilon: Double = universeBits.toDouble / k

  /** Fresh buffer per group — the buffer is mutated in place. */
  def zero: QDigestBuf = new QDigestBuf

  def reduce(buf: QDigestBuf, x: Long): QDigestBuf = {
    val v = math.min(math.max(x, 0L), universe - 1)
    if (buf.fLen == buf.fresh.length) {
      // Let the log grow to 4x the compressed size (floored at 6k) before
      // compacting, so each O(size) compaction pass is paid for by at
      // least 3·size appends — O(1) amortized, bounded live memory.
      if (buf.fLen >= math.max(6L * k, 4L * buf.len))
        compact(buf)
      else {
        val g = new Array[Long](buf.fresh.length * 2)
        System.arraycopy(buf.fresh, 0, g, 0, buf.fLen)
        buf.fresh = g
      }
    }
    buf.fresh(buf.fLen) = v
    buf.fLen += 1
    buf.n += 1
    buf
  }

  def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf = {
    // Compact both (so the logs are empty), then merge-join the sorted
    // survivor arrays summing duplicate ids, and re-sweep under the
    // combined n. Incoming partial buffers are never reused by Spark
    // after merge, so in-place accumulation into `a` is safe.
    compact(a); compact(b)
    val mIds = new Array[Long](a.len + b.len)
    val mCnt = new Array[Long](mIds.length)
    var i = 0; var j = 0; var u = 0
    while (i < a.len || j < b.len) {
      if (j >= b.len || (i < a.len && a.ids(i) < b.ids(j))) {
        mIds(u) = a.ids(i); mCnt(u) = a.cnts(i); i += 1
      } else if (i >= a.len || b.ids(j) < a.ids(i)) {
        mIds(u) = b.ids(j); mCnt(u) = b.cnts(j); j += 1
      } else {
        mIds(u) = a.ids(i); mCnt(u) = a.cnts(i) + b.cnts(j); i += 1; j += 1
      }
      u += 1
    }
    a.n += b.n
    sweep(a, mIds, mCnt, u)
    a
  }

  def finish(buf: QDigestBuf): Seq[Long] = {
    compact(buf)
    val n = buf.n
    if (n == 0L) return fractions.map(_ => 0L)
    // Nodes sorted by (range upper bound asc, range size asc) — every node
    // precedes its ancestors, so accumulating counts in this order gives a
    // rank lower bound within ε·n of the true rank of each upper bound.
    val ordered = (0 until buf.len)
      .map(i => (upperBound(buf.ids(i)), rangeSize(buf.ids(i)), buf.cnts(i)))
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

  /** Fold the raw log into the digest: sort + RLE the log into leaf
    * (id, count) runs, merge-join with the sorted survivors (leaf ids can
    * already exist there), then sweep. No-op on an empty log ONLY if the
    * digest needs no re-compression (callers rely on compact ⇒ swept).
    */
  private[functions] def compact(buf: QDigestBuf): Unit = {
    if (buf.fLen == 0 && buf.len == 0) return
    java.util.Arrays.sort(buf.fresh, 0, buf.fLen)
    val mIds = new Array[Long](buf.len + buf.fLen)
    val mCnt = new Array[Long](mIds.length)
    var i = 0 // survivors
    var j = 0 // log
    var u = 0
    while (i < buf.len || j < buf.fLen) {
      val leaf = if (j < buf.fLen) universe + buf.fresh(j) else Long.MaxValue
      if (i < buf.len && buf.ids(i) < leaf) {
        mIds(u) = buf.ids(i); mCnt(u) = buf.cnts(i); i += 1; u += 1
      } else {
        // Run-length: consume the whole run of equal raw values, folding
        // into an existing survivor leaf when present.
        var c = 0L
        val v = buf.fresh(j)
        while (j < buf.fLen && buf.fresh(j) == v) { c += 1; j += 1 }
        if (i < buf.len && buf.ids(i) == leaf) { c += buf.cnts(i); i += 1 }
        mIds(u) = leaf; mCnt(u) = c; u += 1
      }
    }
    buf.fLen = 0
    if (buf.fresh.length > 8192) buf.fresh = new Array[Long](64)
    sweep(buf, mIds, mCnt, u)
  }

  /** Bottom-up compaction sweep over id-sorted (node, count) arrays,
    * writing the surviving digest back into `buf.ids/cnts` (sorted). The
    * fold rule is the classic one: a (parent, left, right) triple folds
    * into the parent iff its total is at most t = ⌊n/k⌋.
    *
    * Levels are swept deepest-first. A fold decision needs the PARENT's
    * pre-existing count, which sits one level up — so a child pair/single
    * whose combined count can still fold (≤ t) is deferred into a "carry"
    * with the children's identities attached, and resolves during the
    * next level's merge-join, where the children either die (fold) or are
    * emitted as survivors. Everything is primitive-array work: zero hash
    * probes, zero boxing.
    */
  private def sweep(
      buf: QDigestBuf, ids: Array[Long], cnts: Array[Long], s: Int): Unit = {
    val t = buf.n / k
    if (t == 0L || s == 0) {
      buf.ids = ids; buf.cnts = cnts; buf.len = s
      return
    }
    val outIds = new Array[Long](s)
    val outCnt = new Array[Long](s)
    var oLen = 0
    // Carry: pending fold candidates whose parent sits one level up.
    // cid = parent id (strictly ascending), ccs = child-pair sum,
    // clid = left/only child id, clc its count, crc = right-child count
    // or -1 when the odd sibling is absent.
    var cLen = 0
    var cid = Array.emptyLongArray; var ccs = cid
    var clid = cid; var clc = cid; var crc = cid
    var hi = s // exclusive end of the not-yet-consumed sorted prefix
    var lvl = universeBits
    while (lvl >= 0) {
      val lvlLo = 1L << lvl
      var lo = hi
      while (lo > 0 && ids(lo - 1) >= lvlLo) lo -= 1
      // cur = merge of this level's entries and the carry (both
      // id-ascending; overlap only on carried parent ids).
      val curIds = new Array[Long]((hi - lo) + cLen)
      val curCnt = new Array[Long](curIds.length)
      var ci = lo; var ki = 0; var u = 0
      while (ci < hi || ki < cLen) {
        if (ki >= cLen || (ci < hi && ids(ci) < cid(ki))) {
          curIds(u) = ids(ci); curCnt(u) = cnts(ci); u += 1; ci += 1
        } else {
          val pc =
            if (ci < hi && ids(ci) == cid(ki)) { val c = cnts(ci); ci += 1; c }
            else 0L
          val triple = pc + ccs(ki)
          if (triple <= t) { // fold: children die, parent absorbs all
            curIds(u) = cid(ki); curCnt(u) = triple; u += 1
          } else { // children survive as-is; parent keeps its own count
            outIds(oLen) = clid(ki); outCnt(oLen) = clc(ki); oLen += 1
            if (crc(ki) >= 0) {
              outIds(oLen) = clid(ki) + 1; outCnt(oLen) = crc(ki); oLen += 1
            }
            if (pc > 0) { curIds(u) = cid(ki); curCnt(u) = pc; u += 1 }
          }
          ki += 1
        }
      }
      hi = lo
      if (lvl == 0) {
        // Root level: nothing above to fold into — emit survivors.
        var i = 0
        while (i < u) {
          outIds(oLen) = curIds(i); outCnt(oLen) = curCnt(i); oLen += 1
          i += 1
        }
        cLen = 0
      } else {
        // Sibling sweep: a live pair (even id, id+1) is adjacent in the
        // ascending walk; a pair/single whose combined count can still
        // fold joins the next level's carry, otherwise it survives now.
        val ncid = new Array[Long](u); val nccs = new Array[Long](u)
        val nclid = new Array[Long](u); val nclc = new Array[Long](u)
        val ncrc = new Array[Long](u)
        var nk = 0
        var i = 0
        while (i < u) {
          val id = curIds(i); val c = curCnt(i)
          var csum = c; var rc = -1L
          if ((id & 1L) == 0L && i + 1 < u && curIds(i + 1) == id + 1) {
            rc = curCnt(i + 1); csum = c + rc; i += 2
          } else i += 1
          if (csum <= t) {
            ncid(nk) = id >> 1; nccs(nk) = csum
            nclid(nk) = id; nclc(nk) = c; ncrc(nk) = rc; nk += 1
          } else {
            outIds(oLen) = id; outCnt(oLen) = c; oLen += 1
            if (rc >= 0) { outIds(oLen) = id + 1; outCnt(oLen) = rc; oLen += 1 }
          }
        }
        cid = ncid; ccs = nccs; clid = nclid; clc = nclc; crc = ncrc
        cLen = nk
      }
      lvl -= 1
    }
    // Survivors were emitted deepest-level-first: re-sort ascending so the
    // next compact/merge can merge-join. O(out log out) on ~3k entries.
    dualSort(outIds, outCnt, 0, oLen - 1)
    buf.ids = outIds; buf.cnts = outCnt; buf.len = oLen
  }

  /** Quicksort of parallel long arrays by key — keeps the sweep boxing-
    * free (an Ordering-based sort would box every element). Recurses into
    * the smaller partition and loops on the larger, so stack depth is
    * O(log n) even on adversarial input.
    */
  private def dualSort(
      ks: Array[Long], vs: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val p = math.max(math.min(ks(lo), ks(mid)),
        math.min(math.max(ks(lo), ks(mid)), ks(hi)))
      var i = lo; var j = hi
      while (i <= j) {
        while (ks(i) < p) i += 1
        while (ks(j) > p) j -= 1
        if (i <= j) {
          val tk = ks(i); ks(i) = ks(j); ks(j) = tk
          val tv = vs(i); vs(i) = vs(j); vs(j) = tv
          i += 1; j -= 1
        }
      }
      if (j - lo < hi - i) { dualSort(ks, vs, lo, j); lo = i }
      else { dualSort(ks, vs, i, hi); hi = j }
    }
  }

  /** Java-serialized buffer: the digest crosses the wire only at the
    * partial → final shuffle (one compacted buffer per partition-group),
    * so codec speed is irrelevant next to per-row update cost.
    */
  def bufferEncoder: Encoder[QDigestBuf] =
    Encoders.javaSerialization[QDigestBuf]
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** The same q-digest as a NATIVE Catalyst [[org.apache.spark.sql.catalyst
  * .expressions.aggregate.TypedImperativeAggregate]] — the r14 ScanBaseline
  * A/B attributed ~350–550 ns/row of udaf_qdigest's residue (key warm
  * 1.0–1.1 s vs a 0.5–0.6 s honest two-pass scan floor) to the
  * ScalaAggregator bridge: per row it evals the input THROUGH an
  * ExpressionEncoder round-trip (boxing the long) and re-reads the buffer
  * object out of the aggregation-buffer row. This class is the same
  * algorithm ([[QDigest]]'s reduce/merge/finish, shared by delegation, so
  * the two can never drift) wired directly into the aggregation iterator:
  * `update` reads `child.eval(input)` as a primitive, the buffer stays a
  * live [[QDigestBuf]] between rows, and serialization happens only at the
  * partial → final shuffle — one length-prefixed (n, ids, cnts) byte blob
  * per (partition, group), compacted first so the wire size is O(k).
  *
  * Same mergeability/error contract as [[QDigest]]: rank error ≤
  * (universeBits/k)·n, buffer O(k) regardless of input size, partial
  * aggregation map-side. NULL inputs are skipped (SQL aggregate
  * convention).
  */
case class QDigestAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    fractions: Seq[Double],
    universeBits: Int = 20,
    k: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[QDigestBuf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types._

  /** One algorithm instance per plan node: reduce/merge/finish/compact
    * delegate here, so QDigestAgg IS QDigest with a faster doorway.
    */
  @transient private lazy val algo = new QDigest(fractions, universeBits, k)

  // AbstractDataType (and so ImplicitCastInputTypes) is private[sql]:
  // type discipline goes through checkInputDataTypes, the
  // CosineSimilarity pattern. Callers pass an explicit LONG column.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got " +
        child.dataType.catalogString)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest"

  override def createAggregationBuffer(): QDigestBuf = new QDigestBuf

  override def update(buf: QDigestBuf, input: InternalRow): QDigestBuf = {
    val v = child.eval(input)
    if (v == null) buf else algo.reduce(buf, v.asInstanceOf[Long])
  }

  override def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf =
    algo.merge(a, b)

  override def eval(buf: QDigestBuf): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      algo.finish(buf).toArray)

  /** Length-prefixed primitive blob (n, len, ids, cnts) — compacted
    * first, so the log is empty and the wire carries O(k) longs.
    */
  override def serialize(buf: QDigestBuf): Array[Byte] = {
    algo.compact(buf)
    val bb = java.nio.ByteBuffer.allocate(QDigestBuf.wireSize(buf.len))
    bb.putLong(buf.n).putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putLong(buf.ids(i)); i += 1 }
    i = 0
    while (i < buf.len) { bb.putLong(buf.cnts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QDigestBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new QDigestBuf
    buf.n = bb.getLong()
    buf.len = bb.getInt()
    buf.ids = new Array[Long](buf.len)
    buf.cnts = new Array[Long](buf.len)
    var i = 0
    while (i < buf.len) { buf.ids(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < buf.len) { buf.cnts(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): QDigestAgg = copy(child = newChild)
}

/** The OFFLINE q-digest (Shrivastava et al. 2004's original
  * construction) as a TypedImperativeAggregate: exact leaf counts
  * accumulated order-free (partial buffers are leaf-count arrays; merge
  * is count addition — NO folding during accumulation), then ONE
  * deterministic bottom-up fold at `eval`, emitting the digest's
  * surviving nodes as array<struct<id, c, lvl>>.
  *
  * This is the engine side of udaf_qdigest_portable: because leaf
  * accumulation is exact and the fold runs exactly once on the complete
  * census, the result is a pure function of the input MULTISET —
  * independent of partitioning and merge order — which is what lets the
  * DuckDB oracle replay it bit-exactly (the streaming [[QDigest]]'s
  * merge-tree-dependent estimates cannot be). The relational
  * formulation (24 chained per-level aggregates) computes the same
  * thing but pays 24 object-hash aggregation passes at the
  * flag-partitioning parallelism (measured 11 s at sf0.1); here the
  * leaf census rides the normal partial/final aggregation path
  * (map-combined, shuffle carries one compacted leaf array per
  * partition-group, bounded by min(distinct values, 2^universeBits))
  * and the fold is a μs-scale in-memory sweep per group.
  *
  * Fold rule, identical to the oracle's CTE chain: at each level
  * deepest-first, a sibling group (pair or lone child) of PENDING nodes
  * folds into its parent iff its summed count ≤ t = ⌊n/k⌋, else its
  * members are emitted as digest nodes at that level; the root (level
  * 0) emits whatever remains.
  */
case class QDigestOfflineNodes(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    universeBits: Int = 24,
    k: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[QDigestBuf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._

  require(universeBits >= 1 && universeBits <= 40)
  require(k >= 1)

  private val universe: Long = 1L << universeBits

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got " +
        child.dataType.catalogString)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c", LongType, nullable = false),
    StructField("lvl", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "qdigest_offline_nodes"

  override def createAggregationBuffer(): QDigestBuf = new QDigestBuf

  override def update(buf: QDigestBuf, input: InternalRow): QDigestBuf = {
    val raw = child.eval(input)
    if (raw == null) return buf
    val v = math.min(math.max(raw.asInstanceOf[Long], 0L), universe - 1)
    if (buf.fLen == buf.fresh.length) {
      if (buf.fLen >= math.max(4096L, 4L * buf.len)) leafCompact(buf)
      else {
        val g = new Array[Long](buf.fresh.length * 2)
        System.arraycopy(buf.fresh, 0, g, 0, buf.fLen)
        buf.fresh = g
      }
    }
    buf.fresh(buf.fLen) = v
    buf.fLen += 1
    buf.n += 1
    buf
  }

  /** Exact-census compaction: sort + run-length-encode the raw log and
    * merge-join with the sorted survivors. NO fold — accumulation keeps
    * exact per-value counts ([[QDigest.compact]]'s front half without
    * the sweep).
    */
  private def leafCompact(buf: QDigestBuf): Unit = {
    if (buf.fLen == 0) return
    java.util.Arrays.sort(buf.fresh, 0, buf.fLen)
    val mIds = new Array[Long](buf.len + buf.fLen)
    val mCnt = new Array[Long](mIds.length)
    var i = 0; var j = 0; var u = 0
    while (i < buf.len || j < buf.fLen) {
      val nv = if (j < buf.fLen) buf.fresh(j) else Long.MaxValue
      if (i < buf.len && buf.ids(i) < nv) {
        mIds(u) = buf.ids(i); mCnt(u) = buf.cnts(i); i += 1; u += 1
      } else {
        var c = 0L
        val v = buf.fresh(j)
        while (j < buf.fLen && buf.fresh(j) == v) { c += 1; j += 1 }
        if (i < buf.len && buf.ids(i) == v) { c += buf.cnts(i); i += 1 }
        mIds(u) = v; mCnt(u) = c; u += 1
      }
    }
    buf.fLen = 0
    if (buf.fresh.length > 8192) buf.fresh = new Array[Long](64)
    buf.ids = mIds; buf.cnts = mCnt; buf.len = u
  }

  override def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf = {
    leafCompact(a); leafCompact(b)
    val mIds = new Array[Long](a.len + b.len)
    val mCnt = new Array[Long](mIds.length)
    var i = 0; var j = 0; var u = 0
    while (i < a.len || j < b.len) {
      if (j >= b.len || (i < a.len && a.ids(i) < b.ids(j))) {
        mIds(u) = a.ids(i); mCnt(u) = a.cnts(i); i += 1
      } else if (i >= a.len || b.ids(j) < a.ids(i)) {
        mIds(u) = b.ids(j); mCnt(u) = b.cnts(j); j += 1
      } else {
        mIds(u) = a.ids(i); mCnt(u) = a.cnts(i) + b.cnts(j); i += 1; j += 1
      }
      u += 1
    }
    a.ids = mIds; a.cnts = mCnt; a.len = u
    a.n += b.n
    a
  }

  /** The once-only bottom-up fold over the exact census. Pending node
    * ids stay sorted ascending at every level (parents of an ascending
    * walk ascend), so sibling grouping is adjacency.
    */
  override def eval(buf: QDigestBuf): Any = {
    leafCompact(buf)
    val t = buf.n / k
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    def emit(id: Long, c: Long, lvl: Int): Unit = {
      out += new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](id, c, lvl)); ()
    }
    // Start at the leaf level: node id = universe + value.
    var ids = new Array[Long](buf.len)
    var cnts = new Array[Long](buf.len)
    var len = buf.len
    var i0 = 0
    while (i0 < len) {
      ids(i0) = universe + buf.ids(i0); cnts(i0) = buf.cnts(i0); i0 += 1
    }
    var lvl = universeBits
    while (lvl >= 1 && len > 0) {
      // len, not len/2: a level of LONE children can fold every node
      // individually (sparse census), one parent per node
      val nIds = new Array[Long](len)
      val nCnt = new Array[Long](nIds.length)
      var nk = 0
      var i = 0
      while (i < len) {
        val id = ids(i); val c = cnts(i)
        var s = c; var rc = -1L
        if ((id & 1L) == 0L && i + 1 < len && ids(i + 1) == id + 1) {
          rc = cnts(i + 1); s = c + rc; i += 2
        } else i += 1
        if (s <= t) { nIds(nk) = id >> 1; nCnt(nk) = s; nk += 1 }
        else {
          emit(id, c, lvl)
          if (rc >= 0) emit(id + 1, rc, lvl)
        }
      }
      ids = nIds; cnts = nCnt; len = nk
      lvl -= 1
    }
    var r = 0
    while (r < len) { emit(ids(r), cnts(r), 0); r += 1 }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: QDigestBuf): Array[Byte] = {
    leafCompact(buf)
    val bb = java.nio.ByteBuffer.allocate(QDigestBuf.wireSize(buf.len))
    bb.putLong(buf.n).putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putLong(buf.ids(i)); i += 1 }
    i = 0
    while (i < buf.len) { bb.putLong(buf.cnts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QDigestBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new QDigestBuf
    buf.n = bb.getLong()
    buf.len = bb.getInt()
    buf.ids = new Array[Long](buf.len)
    buf.cnts = new Array[Long](buf.len)
    var i = 0
    while (i < buf.len) { buf.ids(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < buf.len) { buf.cnts(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): QDigestOfflineNodes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): QDigestOfflineNodes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): QDigestOfflineNodes = copy(child = newChild)
}
