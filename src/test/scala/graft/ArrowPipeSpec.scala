package graft

import org.apache.arrow.memory.RootAllocator
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Arrow IPC foreign-UDF boundary: framing, batching, typing, and the
  * loopback scorer that stands in for the subprocess.
  */
class ArrowPipeSpec extends AnyFunSuite with SparkFixture {

  import graft.functions.{ArrowPipe, ArrowScorer}

  private val inSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  test("encode/decode round-trips rows through IPC bytes exactly") {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val rows = (0 until 17).map(i => Row(i.toLong, s"text $i \u00e9\u00fc ${"x" * i}"))
      val bytes = ArrowPipe.encodeBatch(rows, inSchema, alloc)
      val back = ArrowPipe.decodeRows(bytes, inSchema, alloc)
      assert(back == rows)
    } finally alloc.close()
  }

  test("decodeRows asserts the returned schema against the declared one") {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val bytes = ArrowPipe.encodeBatch(
        Seq(Row(1L, "a")), inSchema, alloc)
      val wrong = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n", IntegerType, nullable = false)))
      val e = intercept[IllegalArgumentException] {
        ArrowPipe.decodeRows(bytes, wrong, alloc)
      }
      assert(e.getMessage.contains("declared"))
    } finally alloc.close()
  }

  test("pipe batches by maxRecordsPerBatch and reassembles in order") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 23L).map(i => (i, s"row$i")).toDF("doc_id", "text")
      .repartition(3)
    val seen = sp.sparkContext.collectionAccumulator[Int]("batchSizes")
    // Locals only: the foreign closure ships to executors and must not
    // capture the (non-serializable) suite instance.
    val schemaLocal = inSchema
    val out = ArrowPipe.pipe(df, schemaLocal, maxRecordsPerBatch = 7) { b =>
      // count rows in this batch via a fresh allocator, as a foreign
      // process would; identity transform.
      val alloc = new RootAllocator(Long.MaxValue)
      try {
        val n = ArrowPipe.decodeRows(b, schemaLocal, alloc).size
        seen.add(n)
      } finally alloc.close()
      b
    }
    val got = out.orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == (0L until 23L).map(i => (i, s"row$i")))
    val sizes = seen.value
    assert(sizes.size >= 3 && !sizes.isEmpty, s"sizes=$sizes")
    assert(sizes.asScala.forall(_ <= 7), s"sizes=$sizes")
  }

  test("ArrowScorer matches the engine-side fingerprint and byte length") {
    val sp = spark
    val docs = Tables.documents(sp, sf0001).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val scored = ArrowPipe.pipe(docs, outSchema, maxRecordsPerBatch = 16)(
      ArrowScorer.score)
    val expected = docs.select(col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      graft.api.Text.fingerprint(col("text")).as("fp"))
    assert(scored.orderBy("doc_id").collect().toSeq ==
      expected.orderBy("doc_id").collect().toSeq)
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
