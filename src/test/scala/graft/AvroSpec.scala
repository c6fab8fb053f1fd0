package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Row-level fidelity of the hand-rolled Avro container codec (the
  * scan_avro path): values survive the write→container→decode loop
  * bit-exactly, and the container really is an Avro object-container
  * file (magic bytes), not an ad-hoc framing.
  */
class AvroSpec extends AnyFunSuite with SparkFixture {

  private val rows: Seq[graft.functions.AvroCodec.Line] = Seq(
    (1L, 1, 17.0, 24710.35, "N", 857347200000000L),
    (2L, 4, 0.125, -3.5, "A", 0L),
    (3L, 2, 1e-300, 9.87654321e12, "R", -62135596800000000L))

  test("container round trip is bit-exact, file carries Avro magic") {
    val dir = Files.createTempDirectory("avro_spec").toString
    // writePartition reads the task partition id; outside a task it is
    // driver-side (-1 → pid 0 via getPartitionId's undefined-context
    // contract) — run it INSIDE a task for the real shape.
    val paths = spark.sparkContext.parallelize(Seq(rows), 1)
      .map(rs => graft.functions.AvroCodec.writePartition(dir, rs.iterator))
      .collect()
    assert(paths.length == 1)
    val bytes = Files.readAllBytes(Paths.get(paths.head))
    assert(bytes.take(4).toSeq == Seq[Byte]('O', 'b', 'j', 1),
      "missing Avro object-container magic")
    val back = graft.functions.AvroCodec.readContainer(bytes).toSeq
    assert(back == rows, s"round trip mutated rows: $back")
  }

  test("scan_avro aggregates the round-tripped corpus per return flag") {
    val out = SparkEntry.queries("scan_avro")(spark, sf0001).collect()
    assert(out.length == 3) // returnflags N, A, R
    val n = out.map(_.getLong(1)).sum
    assert(n == Tables.lineitem(spark, sf0001).count(),
      "round trip lost or duplicated rows")
  }
}
