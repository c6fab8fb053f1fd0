package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** graft_hll_register(x): the (register index, rank) a single long value
  * contributes to a precision-12 HyperLogLog sketch, packed as
  * idx · 256 + rank — the PER-ELEMENT half of the owned HLL
  * ([[Hll.hash]]'s SplitMix64 finalizer; idx = top 12 bits, rank =
  * leading zeros of the remaining 52 bits + 1). Exposing it as a codegen
  * expression lets RELATIONAL sketch algebra run on register FRAMES —
  * HyperANF's per-node neighborhood sketches (graph_anf_hll) max-merge
  * registers along edges with plain groupBy/max, no UDAF state. Java
  * long arithmetic wraps by definition, so the hash is exact under ANSI
  * mode, and the same 32-bit-half modular replay that certifies udaf_hll
  * recomputes it in DuckDB.
  *
  * Rank is capped at 63 so downstream inverse-power sums stay in exact
  * integer units of 2⁻⁶³ (a rank-64 register — possible only when the
  * shifted hash is exactly 0 — would need a fractional unit; the
  * estimate moves by < 2⁻⁶³, far below the integer rounding).
  */
case class HllRegister(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hll_register"

  override def nullSafeEval(x: Any): Any = {
    val h = Hll.hash(x.asInstanceOf[Long])
    val idx = h >>> 52
    val rest = h << 12
    val rank = math.min(java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1,
      63)
    idx * 256L + rank
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val z = ctx.freshName("z")
      val rank = ctx.freshName("rank")
      s"""
         |long $z = $x + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |$z = $z ^ ($z >>> 31);
         |int $rank = java.lang.Long.numberOfLeadingZeros(($z << 12) | 1L) + 1;
         |if ($rank > 63) $rank = 63;
         |${ev.value} = ($z >>> 52) * 256L + $rank;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HllRegister = copy(child = newChild)
}

object HllRegister {
  import org.apache.spark.sql.graftx.Bridge

  /** Column wrapper: graft_hll_register(x) over a long column. */
  def apply(x: Column): Column =
    Bridge.column(HllRegister(Bridge.expression(x)))
}
