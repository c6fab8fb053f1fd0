package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's declared queries (SURVEY.md §2 inventory).
  * Keys are stable registry names; each oracle-bearing key has DuckDB-1.0
  * SQL over the same parquet tables.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.operators.Sources,
    graft.operators.Relational,
    graft.operators.Scalars,
    graft.operators.Joins,
    graft.operators.Aggregates,
    graft.operators.Windows,
    graft.operators.Text,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.Streaming,
    graft.operators.Udx,
    graft.operators.Multimodal,
    graft.operators.Pipeline,
    graft.operators.Quality,
    graft.operators.DsV2
  )

  lazy val allQueries: Seq[Q] = {
    val qs = modules.flatMap(_.all)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query keys: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
