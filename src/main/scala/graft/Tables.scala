package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-pinned readers for the driver-generated corpus
  * (/root/testdata/sf*, see TESTDATA.md / FIXTURES.md).
  *
  * Schemas are declared explicitly rather than inferred so that plans are
  * stable across scale factors and so the vectorized parquet reader gets an
  * exact projection to prune against. The reference repo declares only its
  * identity (reference README.md:1, "data-ingestion-service"); the concrete
  * data model is the driver corpus documented in FIXTURES.md.
  */
object Tables {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  val schemas: Map[String, StructType] = Map(
    "region" -> st("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> st(
      "n_nationkey" -> IntegerType,
      "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> st(
      "c_custkey" -> LongType,
      "c_name" -> StringType,
      "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> st(
      "s_suppkey" -> LongType,
      "s_name" -> StringType,
      "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> st(
      "p_partkey" -> LongType,
      "p_name" -> StringType,
      "p_brand" -> StringType,
      "p_type" -> StringType,
      "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> st(
      "o_orderkey" -> LongType,
      "o_custkey" -> LongType,
      "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType,
      "o_orderpriority" -> StringType),
    "lineitem" -> st(
      "l_orderkey" -> LongType,
      "l_partkey" -> LongType,
      "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType,
      "l_tax" -> DoubleType,
      "l_returnflag" -> StringType,
      "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> st(
      "event_id" -> LongType,
      "ts" -> LongType, // TIMESTAMP(NANOS) in the footer — see events() below
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> st(
      "doc_id" -> LongType,
      "text" -> StringType,
      "lang" -> StringType,
      "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> st(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) in the parquet footer, which Spark 4 has
    * no timestamp type for. Read it as raw nanos (legacy nanosAsLong) and
    * floor-divide to µs — exactly the ns→µs truncation DuckDB applies when
    * it reads the same file, so both engines see identical instants.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // Session-level flag, set once per session (guarded: repeated sets from
    // concurrent query builds would race on the shared conf).
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
