package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The graft-log DataSource V2 connector (graft.sources.GraftLog): commit
  * protocol, offset assignment, pushdown, statistics, and admission
  * control — the properties a custom source must hold before it can carry
  * registry queries.
  */
class DsV2Spec extends AnyFunSuite with SparkFixture {

  /** A tiny 3-partition topic: (partition, key, value, ts). */
  private def tinyFrame = {
    val sp = spark
    import sp.implicits._
    (0 until 30).map { i =>
      (i % 3, f"k$i%03d", s"v$i", 1700000000000000L + i)
    }.toDF("partition", "key", "value", "ts")
      .repartition(3, col("partition"))
      .sortWithinPartitions(col("partition"), col("key"))
  }

  private def freshTopic(name: String): String =
    s"${Scratch.fresh(name)}/log"

  test("write → batch read round-trips rows with dense per-partition offsets") {
    val t = freshTopic("dsv2_roundtrip")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val back = spark.read.format("graft-log").load(t)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(back.length == 30)
    // offsets dense from 0 per partition, in key order (the fixture sort)
    (0 until 3).foreach { p =>
      val rows = back.filter(_._1 == p).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (0L until 10L))
      assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    }
    // ts round-trips exactly
    assert(back.map(_._5).toSet == (0 until 30)
      .map(i => 1700000000000000L + i).toSet)
  }

  test("second append continues offsets and segment numbering") {
    val t = freshTopic("dsv2_append")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    tinyFrame.withColumn("key", concat(lit("z"), col("key")))
      .write.format("graft-log").mode("append").save(t)
    val back = spark.read.format("graft-log").load(t)
    assert(back.count() == 60)
    val p0 = back.filter(col("partition") === 0)
      .orderBy("offset").collect()
    assert(p0.map(_.getLong(1)).toSeq == (0L until 20L))
    // batch-2 rows (z-prefixed) occupy the SECOND offset range
    assert(p0.drop(10).forall(_.getString(2).startsWith("z")))
    // two committed segments listed in _meta, no stragglers
    val meta = GraftLogMeta.segs(t, 0)
    assert(meta.map(_._2) == Seq(10L, 10L))
    assert(!Files.exists(Paths.get(t, "_staging")))
  }

  test("a failed write aborts invisibly: committed data unchanged, staging cleaned") {
    val t = freshTopic("dsv2_abort")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val before = spark.read.format("graft-log").load(t).count()
    val boom = udf((k: String) =>
      if (k == "k015") throw new RuntimeException("boom") else k)
    intercept[Exception] {
      tinyFrame.withColumn("key", boom(col("key")))
        .write.format("graft-log").mode("append").save(t)
    }
    assert(spark.read.format("graft-log").load(t).count() == before)
    assert(!Files.exists(Paths.get(t, "_staging")))
  }

  test("column pruning reaches the connector (readSchema shrinks)") {
    val t = freshTopic("dsv2_prune")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val df = spark.read.format("graft-log").load(t).select("partition", "value")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("partition", "value")))
    assert(df.collect().length == 30)
  }

  test("partition predicate pushdown skips the other partitions' segments") {
    val t = freshTopic("dsv2_partprune")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val rows = spark.read.format("graft-log").load(t)
      .filter(col("partition") === 2).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getInt(0) == 2))
    // 3 committed segments exist (one per partition); only p=2's was opened
    assert(graft.sources.GraftLog.segmentsOpened.get() == 1L)
  }

  test("scan reports exact statistics from _meta (rowCount and bytes)") {
    val t = freshTopic("dsv2_stats")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val df = spark.read.format("graft-log").load(t)
    val rel = df.queryExecution.optimizedPlan
    assert(rel.stats.rowCount.contains(BigInt(30)))
    val diskBytes = (0 until 3).map { p =>
      GraftLogMeta.segs(t, p).map { case (n, _) =>
        Files.size(Paths.get(t, s"p=$p", n))
      }.sum
    }.sum
    assert(rel.stats.sizeInBytes == BigInt(diskBytes))
  }

  test("admission control cuts multiple proportional batches; drain equals batch read") {
    val t = freshTopic("dsv2_admission")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val ckpt = s"${Scratch.fresh("dsv2_admission_ckpt")}/ckpt"
    val q = spark.readStream.format("graft-log")
      .option("maxRecordsPerTrigger", 9)
      .load(t)
      .groupBy("partition").agg(count(lit(1)).as("n"), max("offset").as("mx"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("dsv2_admission_mem").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    assert(prog.length >= 4, s"expected >=4 data batches, got ${prog.length}")
    assert(prog.map(_.numInputRows).sum == 30)
    // every non-final batch respects the cap
    assert(prog.forall(_.numInputRows <= 9))
    val got = spark.table("dsv2_admission_mem").orderBy("partition")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, 10L, 9L), (1, 10L, 9L), (2, 10L, 9L)))
  }

  test("streaming restart resumes from the checkpointed offset (no replay)") {
    val t = freshTopic("dsv2_resume")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val root = Scratch.fresh("dsv2_resume_ckpt")
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    def run(): Unit = {
      val q = spark.readStream.format("graft-log").load(t)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 30L)
    // second batch lands between runs; the restart reads ONLY the delta —
    // no replay (every key still unique), no loss (all 60 present)
    tinyFrame.withColumn("key", concat(lit("z"), col("key")))
      .write.format("graft-log").mode("append").save(t)
    run()
    val back = spark.read.parquet(out)
    assert(back.count() == 60L)
    assert(back.select("key").distinct().count() == 60L)
  }

  test("streaming produce mirrors a topic offset-for-offset across epochs") {
    val src = freshTopic("dsv2_mirror_src")
    tinyFrame.write.format("graft-log").mode("append").save(src)
    val root = Scratch.fresh("dsv2_mirror")
    val (dst, ckpt) = (s"$root/dst", s"$root/ckpt")
    val q = spark.readStream.format("graft-log")
      .option("maxRecordsPerTrigger", 9).load(src)
      .select("partition", "key", "value", "ts")
      .writeStream.format("graft-log")
      .option("path", dst).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val a = spark.read.format("graft-log").load(src)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(t => (t._1, t._2))
    val b = spark.read.format("graft-log").load(dst)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq) // identical rows INCLUDING offsets
    // several epochs committed (admission control cut the drain), each in
    // the ledger; per-partition meta shows one segment per data epoch
    val epochs = Files.readAllLines(Paths.get(dst, "_epochs"))
    assert(epochs.size() >= 4, s"expected >=4 epochs, got ${epochs.size()}")
    assert(GraftLogMeta.segs(dst, 0).size >= 2)
  }

  test("a retried epoch commit is a no-op (exactly-once produce)") {
    val t = freshTopic("dsv2_epoch_retry")
    tinyFrame.write.format("graft-log").mode("append").save(t) // 30 rows
    val w = new graft.sources.LogStreamingWrite(t, 0, 1, 2, 3, "qretry")
    val factory = w.createStreamingWriterFactory(null)
    val dw = factory.createWriter(0, 0L, 42L)
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    dw.write(new GenericInternalRow(Array[Any](0,
      UTF8String.fromString("rk"), UTF8String.fromString("rv"), 7L)))
    val msgs = Array(dw.commit())
    w.commit(42L, msgs)
    assert(spark.read.format("graft-log").load(t).count() == 31)
    // driver recovery re-offers the same epoch: ledger makes it a no-op
    w.commit(42L, msgs)
    assert(spark.read.format("graft-log").load(t).count() == 31)
  }
}

/** Test-side meta reader (keeps the production object's API surface small). */
object GraftLogMeta {
  def segs(topic: String, p: Int): Seq[(String, Long)] =
    graft.sources.GraftLog.readMeta(Paths.get(topic, s"p=$p"))
      .map(s => (s.name, s.rows))
}
