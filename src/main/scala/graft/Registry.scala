package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator/query from the SURVEY.md §2 inventory.
  *
  * @param name   stable registry key (SURVEY.md §2 `key` column)
  * @param run    Spark build: (session, scale-factor dir) => result
  * @param oracle equivalent ANSI SQL for the DuckDB 1.0 oracle over the same
  *               parquet tables; None for ops the oracle cannot express
  *               (approximate, side-effecting, or non-deterministic shapes),
  *               which are graded rows-only.
  *
  * Determinism contract for every oracle-bearing query (SURVEY.md §2 box):
  * ORDER BY a unique key on both sides, round double aggregates to 4
  * decimals on both sides, UTC session timezone, column names identical.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def all: Seq[Q]
}
