package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog/DDL surface (sql_catalog_ddl): EXTERNAL registration must be
  * metadata-only — files never move on CREATE and never vanish on DROP —
  * and the registered tables must be introspectable via spark.catalog.
  */
class CatalogSpec extends AnyFunSuite with SparkFixture {

  private val db = "graft_cat_" + sf0001.replaceAll("[^a-zA-Z0-9]", "_")

  test("external registration is metadata-only and introspectable") {
    // Running the operator registers customer/nation/region for sf0001.
    val out = SparkEntry.queries("sql_catalog_ddl")(spark, sf0001).collect()
    assert(out.length == 5) // one row per region
    assert(out.map(_.getLong(1)).sum ==
      Tables.customer(spark, sf0001).count())
    val tables = spark.catalog.listTables(db).collect().map(_.name).toSet
    assert(Set("customer", "nation", "region").subsetOf(tables))
    val cols = spark.catalog.listColumns(db + ".nation")
      .collect().map(_.name).toSet
    assert(cols == Set("n_nationkey", "n_name", "n_regionkey"))
  }

  test("DROP TABLE un-registers without deleting the external files") {
    SparkEntry.queries("sql_catalog_ddl")(spark, sf0001).collect()
    val dataFile = new java.io.File(s"$sf0001/region.parquet")
    assert(dataFile.exists())
    spark.sql(s"DROP TABLE $db.region")
    assert(!spark.catalog.tableExists(s"$db.region"))
    assert(dataFile.exists(), "DROP of an external table must not delete data")
    // And the table is re-registrable from the untouched files.
    spark.sql(
      s"CREATE TABLE $db.region USING parquet LOCATION '$sf0001/region.parquet'")
    assert(spark.table(s"$db.region").count() == 5)
  }

  test("a VIEW over a registered table resolves through the catalog") {
    SparkEntry.queries("sql_catalog_ddl")(spark, sf0001).collect()
    spark.sql(s"""CREATE OR REPLACE VIEW $db.nation_v AS
      SELECT n_nationkey, upper(n_name) AS name_u FROM $db.nation""")
    try {
      val v = spark.table(s"$db.nation_v")
      assert(v.columns.toSeq == Seq("n_nationkey", "name_u"))
      assert(v.count() == Tables.nation(spark, sf0001).count())
      // View resolution composes: a join of the view against the base
      // table goes parser → analyzer (two catalog lookups) → Catalyst.
      val joined = spark.sql(s"""
        SELECT count(*) FROM $db.nation_v v
        JOIN $db.nation n ON n.n_nationkey = v.n_nationkey""").head().getLong(0)
      assert(joined == v.count())
    } finally spark.sql(s"DROP VIEW IF EXISTS $db.nation_v")
  }

  test("the view layer is read-only: INSERT INTO a view is rejected") {
    // The catalog's read-only mount contract (NOTES.md): external corpus
    // locations are mounted for query; the writable path is an engine
    // sink (sink_*, DSv2 commit protocol), never INSERT INTO the mount.
    // Spark's analyzer enforces this for views — assert the rejection is
    // loud and the underlying data is untouched.
    SparkEntry.queries("sql_catalog_ddl")(spark, sf0001).collect()
    spark.sql(s"""CREATE OR REPLACE VIEW $db.region_v AS
      SELECT * FROM $db.region""")
    try {
      val before = java.nio.file.Files.size(
        java.nio.file.Paths.get(s"$sf0001/region.parquet"))
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"INSERT INTO $db.region_v VALUES (99, 'NOWHERE')")
      }
      assert(e.getMessage.toLowerCase.contains("view"),
        s"unexpected rejection message: ${e.getMessage}")
      assert(java.nio.file.Files.size(
        java.nio.file.Paths.get(s"$sf0001/region.parquet")) == before,
        "rejected INSERT must not touch the external bytes")
    } finally spark.sql(s"DROP VIEW IF EXISTS $db.region_v")
  }

  test("a catalog-registered table serves a streaming read") {
    // readStream.table resolves the same catalog entry the batch path
    // uses, so one registration serves both engines — the lakehouse
    // mount contract. FileStreamSource requires a DIRECTORY location
    // (the corpus registers single files — that contract difference is
    // itself worth pinning), so the streaming mount is a directory-
    // backed external table; AvailableNow drains it and the streamed
    // rows must equal the batch count.
    SparkEntry.queries("sql_catalog_ddl")(spark, sf0001).collect()
    val loc = Scratch.fresh("catalog_stream_tbl")
    Tables.nation(spark, sf0001).write.mode("overwrite").parquet(loc)
    spark.sql(s"DROP TABLE IF EXISTS $db.nation_stream")
    spark.sql(
      s"CREATE TABLE $db.nation_stream USING parquet LOCATION '$loc'")
    try {
      val q = spark.readStream.table(s"$db.nation_stream")
        .writeStream.format("memory").queryName("cat_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.table("cat_stream").count() ==
        Tables.nation(spark, sf0001).count())
      // Same registration, batch engine: one mount, both engines.
      assert(spark.table(s"$db.nation_stream").count() ==
        Tables.nation(spark, sf0001).count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $db.nation_stream")
  }
}
