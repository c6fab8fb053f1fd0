package graft.functions

import java.io.ByteArrayInputStream
import java.nio.file.Paths

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}

/** Avro object-container encode/decode for the `scan_avro` round trip.
  *
  * The sandbox has avro core (avro-1.12.1) on the Spark classpath but no
  * spark-avro DataSource module, so the container framing is driven
  * directly: the writer runs inside `mapPartitions` tasks (one container
  * file per task, deflate-compressed, with a timestamp-micros logical
  * type on the ship date), and the reader decodes whole files delivered
  * by the binaryFile source. Both sides build the Schema from the JSON
  * literal below — Schema is not Serializable, so tasks must construct
  * it locally rather than capture it.
  */
object AvroCodec {

  private val schemaJson = """{
    "type": "record", "name": "LineItem", "namespace": "graft",
    "fields": [
      {"name": "l_orderkey", "type": "long"},
      {"name": "l_linenumber", "type": "int"},
      {"name": "l_quantity", "type": "double"},
      {"name": "l_extendedprice", "type": "double"},
      {"name": "l_returnflag", "type": "string"},
      {"name": "l_shipdate",
       "type": {"type": "long", "logicalType": "timestamp-micros"}}
    ]}"""

  private def schema: Schema = new Schema.Parser().parse(schemaJson)

  type Line = (Long, Int, Double, Double, String, Long)

  /** Write one Avro container file for this task's rows; returns the
    * path. The canonical file name keys on the task's partition id, so a
    * deterministic repartition yields a deterministic file set — but the
    * bytes land first in an attempt-suffixed temp file and are committed
    * via atomic rename. Two attempts of the same partition (task retry,
    * or speculative execution if ever enabled) then race only on the
    * rename, and either winner is a COMPLETE container; the pre-r11 code
    * created the canonical path directly, so concurrent attempts could
    * interleave writes into one corrupt file (ADVICE r10).
    */
  def writePartition(outDir: String, rows: Iterator[Line]): String = {
    val tc = org.apache.spark.TaskContext.get()
    val pid = tc.partitionId()
    val sch = schema
    val path = Paths.get(outDir, f"part_$pid%04d.avro")
    val tmp = Paths.get(outDir,
      f".part_$pid%04d.attempt${tc.taskAttemptId()}.avro.tmp")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(sch, tmp.toFile)
    try rows.foreach { case (ok, ln, qty, ext, rf, us) =>
      val r = new GenericData.Record(sch)
      r.put("l_orderkey", ok)
      r.put("l_linenumber", ln)
      r.put("l_quantity", qty)
      r.put("l_extendedprice", ext)
      r.put("l_returnflag", rf)
      r.put("l_shipdate", us)
      w.append(r)
    } finally w.close()
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    path.toString
  }

  /** Decode a whole container file's bytes back to rows. Avro strings
    * materialize as Utf8 — toString at the boundary.
    */
  def readContainer(bytes: Array[Byte]): Iterator[Line] = {
    val st = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord](schema))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Line]
    try while (st.hasNext) {
      val r = st.next()
      buf += ((r.get("l_orderkey").asInstanceOf[Long],
        r.get("l_linenumber").asInstanceOf[Int],
        r.get("l_quantity").asInstanceOf[Double],
        r.get("l_extendedprice").asInstanceOf[Double],
        r.get("l_returnflag").toString,
        r.get("l_shipdate").asInstanceOf[Long]))
    } finally st.close()
    buf.iterator
  }
}
