package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator custom plan: top-k rows per group under a total order,
  * WITHOUT a window function or any sort.
  *
  * This is the (c)-tier extension path the SURVEY §7.3 summary left as
  * "optional top-k pushdown": a logical node + planner strategy + physical
  * operator registered through the session's extension points, for an
  * operator shape Spark's built-ins only express as
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` — which plans as
  * Exchange → full SORT of every row in each partition → WindowExec that
  * materializes rank for every row, then discards all but k. At 100 TB the
  * sort is the bottleneck: it is O(n log n) in rows-per-partition and
  * spills; top-k needs only O(n log k) heap work and O(groups · k) state.
  *
  * Physical shape (mirrors partial/final aggregation):
  *
  *   TopKPerGroupExec(final)            -- requires ClusteredDistribution
  *     └─ ShuffleExchange(g)            -- inserted by EnsureRequirements
  *        └─ TopKPerGroupExec(partial)  -- any distribution, map-side
  *           └─ child
  *
  * The partial pass bounds the SHUFFLE to ≤ groups·k rows per input
  * partition (the map-side-combine discipline); the final pass merges the
  * per-partition survivors. Both passes keep one bounded binary heap per
  * group: the heap root is the WORST kept row, so admission is a single
  * codegen'd comparison for rows that don't make the cut — the common case
  * on skewed data.
  *
  * Correctness requires the order to be TOTAL (callers append a unique
  * tiebreaker), which also makes the operator's row SET deterministic and
  * therefore DuckDB-oracle-checkable; ties at the boundary under a partial
  * order would make partial/final merge order observable.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, s"topKPerGroup: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: one logical node → partial + final physical pair. */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val groupExprsB = groupExprs
    val orderExprsB = orderExprs
    val childOutput = child.output
    val kB = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      // Identity projection for children that emit non-Unsafe rows
      // (local/RDD scans can hand GenericInternalRow — UnsafeRow is not
      // a contract of SparkPlan.execute()). The projection reuses one
      // buffer; every row the heap RETAINS is .copy()'d below.
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // Codegen'd row comparator for the requested sort order; heap keeps
      // the k FIRST rows of that order, root = worst kept (reverse order).
      val ordering = GenerateOrdering.generate(orderExprsB, childOutput)
      val reverse = ordering.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kB + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kB) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          // beats the current worst: admit, evict root. Rows outside the
          // top-k cost exactly ONE comparison and zero copies.
          heap.poll()
          heap.add(row.copy())
        }
      }
      numGroups.add(heaps.size().toLong)
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
        override def hasNext: Boolean = {
          while (!cur.hasNext && it.hasNext) cur = it.next().iterator()
          cur.hasNext
        }
        override def next(): InternalRow = { numOutputRows.add(1L); cur.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
