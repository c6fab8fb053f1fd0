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
}
