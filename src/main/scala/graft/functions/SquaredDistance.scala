package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two double vectors.
  *
  * The k-means / silhouette / IVF assignment hot path evaluated k times
  * per row against centroid literals. The previous formulation —
  * `aggregate(zip_with(e, c, (x,y) => (x−y)²), 0.0, _+_)` — evaluates its
  * lambdas INTERPRETED per element (the NOTES.md round-8 lesson: HOF
  * lambdas are the new shuffle); this expression runs the identical
  * arithmetic inside whole-stage codegen. Math is a sequential left fold
  * of (x−y)² in index order — bit-identical to the HOF form and to
  * DuckDB's `list_sum(list_transform(...))`, so every trained-centroid
  * oracle replay is preserved.
  *
  * Null/edge semantics: null if either side is null or lengths differ.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      val dx = x.getDouble(i) - y.getDouble(i)
      d += dx * dx
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val dx = ctx.freshName("dx")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $dx = $a.getDouble($i) - $b.getDouble($i);
         |    $d += $dx * $dx;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  import org.apache.spark.sql.graftx.Bridge

  /** Column wrapper: graft_sqdist(a, b) over Array[Double] columns. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
}
