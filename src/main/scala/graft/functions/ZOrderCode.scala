package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Z-order (Morton) code — interleaves the
  * low 31 bits of two non-negative LONG bucket ids into a single 62-bit
  * sort key. Sorting a table by this key clusters rows so that a range
  * (box) predicate on EITHER dimension maps to a bounded set of key
  * ranges: parquet row-group min/max stats on both source columns then
  * prune most groups, which a single-column sort can only do for its one
  * leading column. This is the layout trick behind multi-dimensional
  * clustering in modern lakehouse formats, expressed as a plain codegen
  * expression so the layout write stays inside whole-stage codegen.
  *
  * Bit spreading uses the binary-magic-numbers technique (public domain,
  * "Bit Twiddling Hacks", Stanford graphics site): each mask pass doubles
  * the gap between kept bits. Inputs are clamped to [0, 2^31) — callers
  * bucket raw values first, so the clamp only defends against overflow.
  *
  * Null semantics: null if either input is null.
  */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes lets the analyzer coerce narrower integral
  // arguments (int/short/byte SQL literals or columns) up to bigint, the
  // same ergonomics as built-in numeric expressions; non-integral types
  // still fail analysis with the standard type-mismatch error. (Return
  // type inferred: Seq[AbstractDataType] is private[sql].)
  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val za = ctx.freshName("za")
      val zb = ctx.freshName("zb")
      // Inline spreading (no helper call) keeps the whole expression
      // inside the generated method for JIT inlining.
      s"""
         |long $za = java.lang.Math.min(java.lang.Math.max($a, 0L), (1L << 31) - 1);
         |long $zb = java.lang.Math.min(java.lang.Math.max($b, 0L), (1L << 31) - 1);
         |$za = ($za | ($za << 16)) & 0x0000FFFF0000FFFFL;
         |$za = ($za | ($za << 8))  & 0x00FF00FF00FF00FFL;
         |$za = ($za | ($za << 4))  & 0x0F0F0F0F0F0F0F0FL;
         |$za = ($za | ($za << 2))  & 0x3333333333333333L;
         |$za = ($za | ($za << 1))  & 0x5555555555555555L;
         |$zb = ($zb | ($zb << 16)) & 0x0000FFFF0000FFFFL;
         |$zb = ($zb | ($zb << 8))  & 0x00FF00FF00FF00FFL;
         |$zb = ($zb | ($zb << 4))  & 0x0F0F0F0F0F0F0F0FL;
         |$zb = ($zb | ($zb << 2))  & 0x3333333333333333L;
         |$zb = ($zb | ($zb << 1))  & 0x5555555555555555L;
         |${ev.value} = $za | ($zb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode {

  /** Column wrapper: graft_zorder(a, b) over LONG columns. */
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftx.Bridge
    Bridge.column(ZOrderCode(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Spread the low 31 bits of v so bit i lands at position 2i. */
  private def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of two non-negative 31-bit values (clamped). */
  def interleave(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), (1L << 31) - 1)
    val cb = math.min(math.max(b, 0L), (1L << 31) - 1)
    spread(ca) | (spread(cb) << 1)
  }
}
