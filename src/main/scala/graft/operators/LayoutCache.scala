package graft.operators

import graft.{Scratch, Tables}
import org.apache.spark.sql.SparkSession

/** Per-JVM cache of derived table layouts (partitioned / bucketed copies of
  * the corpus). In production these are one-time layout decisions amortized
  * over every query; caching per (layout, sfDir) makes the registry time the
  * QUERIES against the layout rather than re-materializing it per query.
  * `sink_parquet` intentionally bypasses this — its job is to time the sink.
  */
private[graft] object LayoutCache {

  private val cache = scala.collection.mutable.Map[String, String]()

  /** lineitem partitioned by l_returnflag; returns the layout path. */
  def partitionedLineitem(s: SparkSession, dir: String): String =
    cache.synchronized {
      cache.getOrElseUpdate(s"part_lineitem:$dir", {
        val out = Scratch.fresh("layout_part_lineitem")
        Tables.lineitem(s, dir)
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        out
      })
    }

  /** lineitem Z-order-clustered on (l_partkey, l_suppkey): rows sorted by
    * the Morton interleave of the two keys, range-partitioned into 16
    * files so each file (= one parquet row group at this scale) covers a
    * compact 2-D tile. Row-group min/max stats on BOTH columns then prune
    * a box predicate on either or both dimensions — the multi-dimensional
    * clustering a single-column sort cannot give. Returns the layout path.
    */
  def zorderedLineitem(s: SparkSession, dir: String): String =
    cache.synchronized {
      cache.getOrElseUpdate(s"zorder_lineitem:$dir", {
        val out = Scratch.fresh("layout_zorder_lineitem")
        import org.apache.spark.sql.functions.col
        graft.api.Layout.zorderBy(Tables.lineitem(s, dir),
            col("l_partkey"), col("l_suppkey"), numFiles = 16)
          .write.mode("overwrite").parquet(out)
        out
      })
    }

  /** lineitem + orders as bucketed tables graft_li_b / graft_ord_b. */
  def bucketedTables(s: SparkSession, dir: String): Unit =
    cache.synchronized {
      cache.getOrElseUpdate(s"bucketed:$dir", {
        val wh = Scratch.fresh("layout_bucketed")
        s.sql("DROP TABLE IF EXISTS graft_li_b")
        s.sql("DROP TABLE IF EXISTS graft_ord_b")
        Tables.lineitem(s, dir).write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$wh/li").saveAsTable("graft_li_b")
        Tables.orders(s, dir).write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$wh/ord").saveAsTable("graft_ord_b")
        wh
      })
      ()
    }
}
