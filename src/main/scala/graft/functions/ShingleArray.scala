package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all positional k-word shingles of a token
  * array, in one codegen-friendly pass.
  *
  * The SQL formulation `transform(sequence(1, n−k+1), i ->
  * array_join(slice(toks, i, k), ' '))` is semantically right but its
  * lambda evaluates INTERPRETED per position — on shingle-heavy paths
  * (contamination sweeps, exact-Jaccard audits) that interpretation was
  * ~10× the cost of the whole rest of the plan. This expression emits the
  * identical array from a tight loop behind a single static call that
  * whole-stage codegen inlines into the row pipeline.
  *
  * Exact semantics match the lambda form used by `api.Dedup.shingles`:
  * positions 1..max(n−k+1, 1); the window clamps at the array end, so a
  * doc shorter than k words yields its one partial shingle and an empty
  * token array yields [""] (array_join of an empty slice). Null tokens
  * are skipped, as array_join does. Output never contains null elements.
  */
case class ShingleArray(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleArray = copy(child = newChild)
}

object ShingleArray {
  private val SEP = UTF8String.fromString(" ")

  /** Shared by eval and generated code: one allocation per shingle, no
    * per-element closures.
    */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val m = math.max(n - k + 1, 1)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val hi = math.min(i + k, n)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      out(i) = UTF8String.concatWs(SEP, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API wrapper. */
  def apply(tokens: Column, k: Int): Column =
    Bridge.column(ShingleArray(Bridge.expression(tokens), k))
}
