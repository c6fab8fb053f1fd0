package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the custom Catalyst expressions in
  * graft.functions. Spark 4 routes Column through ColumnNode, and the
  * conversion helpers are private[sql]; a subpackage bridge is the standard
  * way third-party Catalyst extensions wrap expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-leaf a (typically localCheckpointed) frame WITHOUT inheriting its
    * origin plan's statistics. `Dataset.localCheckpoint` deliberately
    * carries the origin stats onto the new `LogicalRDD` — correct for a
    * one-shot cut, but fatal for a self-joining fixpoint: a round that
    * joins labels⋈labels SQUARES sizeInBytes, the checkpoint preserves
    * the square, and after k rounds the estimate is 2^(63·2^k) — a
    * BigInteger whose bit length overflows Catalyst's stats visitor at
    * k≈25 (java.math.BigInteger MAX_MAG_LENGTH), after grinding planning
    * to a halt multiplying megabyte-long integers. Wrapping the
    * checkpointed RDD in a fresh leaf resets the estimate to the default
    * each round, so the exponent is bounded per round instead of
    * compounding across rounds. The RDD is reused as-is (InternalRow,
    * no conversion, no recompute).
    */
  def statsResetLeaf(df: DataFrame): DataFrame = {
    val sp = df.sparkSession.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    sp.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is private[sql];
    * custom logical nodes — graft.plans.TopKPerGroup — enter the session
    * through here).
    */
  def ofRows(
      sp: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      sp.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Expose the strategies a SparkSessionExtensions instance would install
    * (private[sql]) so specs can assert GraftExtensions' planner wiring
    * without building a second session in the test JVM.
    */
  def plannerStrategies(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      sp: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(
      sp.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
