package graft.operators

import graft.{Q, QueryModule, Scratch, Tables}
import org.apache.spark.sql.functions._

/** §2.A — batch scans, format ingestion, and sinks.
  *
  * The scan queries exist to *prove* pushdown: `scan_projection` must show a
  * pruned ReadSchema and `scan_filter_pushdown` a PushedFilters list in
  * `.explain` (asserted in ScanSpec). At 100 TB these two properties are the
  * difference between reading terabytes and reading gigabytes: projection
  * pruning skips parquet column chunks entirely, and min/max row-group
  * statistics let pushed predicates skip most of the file without decoding.
  *
  * CSV/JSON ingestion always uses explicit schemas — schema inference would
  * mean an extra full pass over 100 TB of text before the real read.
  */
object Sources extends QueryModule {

  def all: Seq[Q] = Seq(
    // Full-table vectorized parquet scan. Trivial by design: it pins the
    // baseline read path (VectorizedParquetRecordReader, batch decoding).
    Q(
      "scan_parquet",
      (s, dir) => Tables.part(s, dir).orderBy("p_partkey"),
      oracle = Some("""
        SELECT * FROM part ORDER BY p_partkey""")),

    // Column-pruned scan: only 3 of 11 lineitem columns reach the reader.
    Q(
      "scan_projection",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Predicate pushdown: both conjuncts are parquet-filterable (timestamp
    // and double compare), so row groups outside the ranges never decode.
    // The emitted timestamp is cast to NTZ after the filter (pushdown is on
    // the raw column): Spark writes tz-adjusted TIMESTAMP_MICROS, DuckDB's
    // TIMESTAMP is timezone-naive — NTZ makes the output schemas agree.
    Q(
      "scan_filter_pushdown",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
            col("l_quantity") < 3.0)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate").cast("timestamp_ntz").as("l_shipdate"),
            col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_quantity < 3.0
        ORDER BY l_orderkey, l_linenumber""")),

    // CSV round-trip with an explicit schema (no inference pass). The CSV
    // fixture is produced from the nation table at query time, so the DuckDB
    // oracle over the original parquet must match exactly.
    Q(
      "scan_csv",
      (s, dir) => {
        val out = Scratch.fresh("scan_csv")
        Tables.nation(s, dir).write.mode("overwrite")
          .option("header", "true").csv(out)
        s.read.schema(Tables.schemas("nation"))
          .option("header", "true").csv(out)
          .orderBy("n_nationkey")
      },
      oracle = Some("""
        SELECT * FROM nation ORDER BY n_nationkey""")),

    // JSON-lines round-trip with an explicit schema. Spark's JSON writer is
    // value-round-trip-safe for doubles (shortest repr that re-parses).
    Q(
      "scan_json",
      (s, dir) => {
        val out = Scratch.fresh("scan_json")
        Tables.supplier(s, dir).write.mode("overwrite").json(out)
        s.read.schema(Tables.schemas("supplier")).json(out)
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        SELECT * FROM supplier ORDER BY s_suppkey""")),

    // ORC round-trip: the second columnar format, same explicit-schema
    // discipline. Spark's ORC reader is vectorized like parquet's.
    Q(
      "scan_orc",
      (s, dir) => {
        val out = Scratch.fresh("scan_orc")
        Tables.customer(s, dir).write.mode("overwrite").orc(out)
        s.read.schema(Tables.schemas("customer")).orc(out)
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT * FROM customer ORDER BY c_custkey""")),

    // Static partition pruning: read a returnflag-partitioned layout with a
    // partition-column filter — the scan lists only the matching partition
    // directory (PartitionFilters in the plan; 2/3 of the data never read).
    Q(
      "scan_partition_pruned",
      (s, dir) => {
        val out = LayoutCache.partitionedLineitem(s, dir)
        s.read.parquet(out)
          .filter(col("l_returnflag") === "R")
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("sum_price"))
          .orderBy("l_linestatus")
      },
      oracle = Some("""
        SELECT l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 4) AS sum_price
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Dynamic partition pruning: the partition column is constrained only
    // through a join with a filtered dim, so the pruning predicate is
    // discovered at runtime (dynamicpruning subquery in the plan) — at
    // 100 TB this skips whole partition trees the optimizer cannot prune
    // statically.
    Q(
      "join_dpp",
      (s, dir) => {
        val out = LayoutCache.partitionedLineitem(s, dir)
        val dim = s.createDataFrame(Seq(
          ("A", "returned_a"), ("N", "kept"), ("R", "returned_r")))
          .toDF("flag", "flag_desc")
          .filter(col("flag_desc").startsWith("returned"))
        s.read.parquet(out)
          .join(dim, col("l_returnflag") === col("flag"))
          .groupBy("flag_desc")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
          .orderBy("flag_desc")
      },
      oracle = Some("""
        SELECT CASE l_returnflag WHEN 'A' THEN 'returned_a'
                                 ELSE 'returned_r' END AS flag_desc,
               count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
        GROUP BY 1 ORDER BY flag_desc""")),

    // Hive-style partitioned parquet sink, verified by re-reading. At scale,
    // partitionBy(low-cardinality col) is the layout that makes downstream
    // partition pruning possible; the re-read aggregate proves no rows were
    // lost or duplicated across partition directories.
    Q(
      "sink_parquet",
      (s, dir) => {
        val out = Scratch.fresh("sink_parquet")
        Tables.lineitem(s, dir)
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        s.read.parquet(out)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_rows"),
            round(sum("l_quantity"), 4).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag, count(*) AS n_rows,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
