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
    // driver recovery re-offers the same epoch: the _meta tag (written in
    // the same atomic swap as the data) makes it a no-op
    w.commit(42L, msgs)
    assert(spark.read.format("graft-log").load(t).count() == 31)
  }

  test("a commit retried after a mid-commit crash completes, never double-appends") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val t = freshTopic("dsv2_crash_retry")
    val w = new graft.sources.LogStreamingWrite(t, 0, 1, 2, 3, "qcrash")
    val fac = w.createStreamingWriterFactory(null)
    def mk(p: Int) = {
      val dw = fac.createWriter(p, p.toLong, 7L)
      dw.write(new GenericInternalRow(Array[Any](p,
        UTF8String.fromString(s"k$p"), UTF8String.fromString("v"), 1L)))
      dw.commit()
    }
    // simulate a driver crash between partition 0's _meta swap and
    // partition 1's: only p0's message lands...
    w.commit(7L, Array(mk(0)))
    // ...then recovery re-runs the epoch's tasks (fresh staging) and
    // re-offers the WHOLE epoch: p0 is skipped by its _meta tag, p1
    // commits — exactly-once per partition, no lost rows
    w.commit(7L, Array(mk(0), mk(1)))
    val got = spark.read.format("graft-log").load(t).collect()
      .map(r => (r.getInt(0), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((0, "k0"), (1, "k1")))
  }

  test("a REAL killed-and-retried writer task neither loses nor duplicates " +
    "records (scheduler-level fault injection)") {
    // Not a simulation: the map function fused into the write task throws
    // on its FIRST attempt (TaskContext.attemptNumber == 0) after the
    // DataWriter has already consumed part of the stream, so Spark aborts
    // that attempt's writer mid-file and reschedules (SparkFixture runs
    // local[4, 2]). The commit must carry ONLY the surviving attempt's
    // segments: same rows, same dense offsets, no strays in _staging, no
    // extra segments in _meta — byte-for-byte the digest of an uninjected
    // write of the same frame.
    val t = freshTopic("dsv2_task_retry")
    val clean = freshTopic("dsv2_task_retry_clean")
    val failOnce = udf((k: String) => {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && k == "k016")
        throw new RuntimeException("injected first-attempt task kill")
      k
    })
    // withColumn AFTER the partition-local sort: no exchange between the
    // udf and the DataWriter, so the throw happens INSIDE the write task.
    tinyFrame.withColumn("key", failOnce(col("key")))
      .write.format("graft-log").mode("append").save(t)
    tinyFrame.write.format("graft-log").mode("append").save(clean)
    def digest(topic: String) = spark.read.format("graft-log").load(topic)
      .groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("max_off"),
        bit_xor(hash(col("offset"), col("key"), col("value"), col("ts"))
          .cast("long")).as("xor"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(digest(t) == digest(clean),
      "retried write must equal the uninjected write record-for-record")
    assert(!Files.exists(Paths.get(t, "_staging")),
      "no staged files may survive the commit")
    // exactly one committed segment per partition — the failed attempt's
    // partial file must not appear as a segment
    (0 until 3).foreach { p =>
      assert(GraftLogMeta.segs(t, p).size == GraftLogMeta.segs(clean, p).size,
        s"p=$p segment count differs from the clean write")
    }
  }

  test("a losing speculative attempt's abort leaves the winner's staged file") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val t = freshTopic("dsv2_speculative")
    val bw = new graft.sources.LogBatchWrite(t, 0, 1, 2, 3, "qspec")
    val fac = bw.createBatchWriterFactory(null)
    def row(k: String) = new GenericInternalRow(Array[Any](0,
      UTF8String.fromString(k), UTF8String.fromString("v"), 1L))
    val w1 = fac.createWriter(0, 100L) // original attempt
    val w2 = fac.createWriter(0, 101L) // speculative attempt, same partition
    w1.write(row("win")); w2.write(row("win"))
    val msg = w1.commit() // attempt 100 wins the commit race
    w2.abort()            // loser must delete ONLY its own attempt's files
    bw.commit(Array(msg))
    val got = spark.read.format("graft-log").load(t).collect()
    assert(got.length == 1 && got.head.getString(2) == "win")
  }

  test("field escaping round-trips tabs, newlines, backslashes, and NULLs") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (0, "a\tb", "v1\nline2", 1L),
      (0, "back\\slash", "\\N", 2L), // literal 2-char "\N" value, NOT null
      (1, "plain", "crlf\r\nend", 3L),
      (1, null.asInstanceOf[String], null.asInstanceOf[String], 4L))
    val t = freshTopic("dsv2_escape")
    rows.toDF("partition", "key", "value", "ts")
      .repartition(2, col("partition"))
      .write.format("graft-log").mode("append").save(t)
    val df = spark.read.format("graft-log").load(t)
    // _meta row counts agree despite embedded newlines (no offset desync)
    assert(df.count() == 4)
    val back = df.collect().map(r => (r.getInt(0),
      if (r.isNullAt(2)) null else r.getString(2),
      if (r.isNullAt(3)) null else r.getString(3),
      r.getLong(4))).toSet
    assert(back == rows.toSet)
  }

  test("offset range pushdown seeks past whole segments") {
    val t = freshTopic("dsv2_seek_off")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    tinyFrame.withColumn("key", concat(lit("z"), col("key")))
      .write.format("graft-log").mode("append").save(t)
    // 2 segments per partition: offsets [0,10) and [10,20)
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val rows = spark.read.format("graft-log").load(t)
      .filter(col("offset") >= 10).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getLong(1) >= 10L))
    // only each partition's SECOND segment was opened (3 of 6 files)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 3L)
  }

  test("ts range pushdown skips segments via _meta ts bounds") {
    val t = freshTopic("dsv2_seek_ts")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    tinyFrame.withColumn("ts", col("ts") + 1000000L)
      .write.format("graft-log").mode("append").save(t)
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val rows = spark.read.format("graft-log").load(t)
      .filter(col("ts") >= 1700000001000000L).collect()
    assert(rows.length == 30)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 3L)
  }

  test("scan_dsv2_seek opens fewer segments than the topic holds") {
    graft.operators.DsV2.seekTopic(spark, sf0001) // build outside the count
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val rows = SparkEntry.queries("scan_dsv2_seek")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val opened = graft.sources.GraftLog.segmentsOpened.get()
    // 4 chunked appends × 4 partitions = 16 committed segments. The
    // query's orderBy range-samples its child, so the scan executes twice
    // (2×16 = 32 opens un-pruned; measured 24 = 2×12 with the seek): any
    // count below 32 proves segments were skipped from _meta alone.
    assert(opened < 32, s"offset seek opened all segments ($opened opens)")
  }

  test("runtime filtering prunes log partitions from a joined dim (DPP for the log)") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_runtime_prune")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    // the dim must be a FILE-backed scan with a selective predicate: a
    // local Seq would constant-fold the filter away before the pruning
    // rule looks for one (the DPP-benefit precondition)
    val dimPath = s"${Scratch.fresh("dsv2_runtime_dim")}/dim"
    Seq((0, "drop"), (1, "drop"), (2, "keep"))
      .toDF("p", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val out = spark.read.format("graft-log").load(t)
      .join(broadcast(dim), col("partition") === col("p"))
      .collect()
    assert(out.length == 10 && out.forall(_.getInt(0) == 2))
    // the dim executed first; its single partition value reached the scan
    // via SupportsRuntimeFiltering, so only p=2's segment was opened
    assert(graft.sources.GraftLog.segmentsOpened.get() == 1L,
      s"runtime filter did not prune (opened ${graft.sources.GraftLog.segmentsOpened.get()})")
  }

  test("an impossible offset range reads nothing and opens no segments") {
    val t = freshTopic("dsv2_empty_range")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val n = spark.read.format("graft-log").load(t)
      .filter(col("offset") >= 1000000L).count()
    assert(n == 0L)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 0L,
      "a provably-empty seek must not open any file")
  }

  test("key-grouped aggregate composes with partition pruning (still no Exchange)") {
    val t = freshTopic("dsv2_keygrouped_pruned")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val df = spark.read.format("graft-log").load(t)
      .filter(col("partition") =!= 1)
      .groupBy("partition").agg(sum("offset").as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq((0, 45L), (2, 45L)))
  }

  test("reported partition clustering lets groupBy(partition) skip the Exchange") {
    val t = freshTopic("dsv2_keygrouped")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val df = spark.read.format("graft-log").load(t)
      .groupBy("partition").agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"partition-keyed agg over a key-grouped scan must not shuffle:\n$p")
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq((0, 10L), (1, 10L), (2, 10L)))
  }

  test("aggregate pushdown answers count/min/max from _meta, zero files opened") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_aggpush")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val pushed = spark.read.format("graft-log").load(t)
      .groupBy("partition")
      .agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"),
        min("offset").as("omn"), max("offset").as("omx"))
      .orderBy("partition")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("GraftLogAggScan"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    val rows = pushed.collect()
    assert(graft.sources.GraftLog.segmentsOpened.get() == 0L,
      "pushdown opened segment files")
    // ground truth: defeat the pushdown with an unsupported aggregate
    // (count distinct key) and compare the shared columns
    val truth = spark.read.format("graft-log").load(t)
      .groupBy("partition")
      .agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"),
        min("offset").as("omn"), max("offset").as("omx"),
        countDistinct("key").as("dk"))
      .orderBy("partition").drop("dk").collect()
    assert(rows.map(_.toSeq).toSeq == truth.map(_.toSeq).toSeq)
    // global (ungrouped) shape also pushes completely
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val g = spark.read.format("graft-log").load(t)
      .agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"))
      .collect()(0)
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) ==
      ((30L, 1700000000000000L, 1700000000000029L)))
    assert(graft.sources.GraftLog.segmentsOpened.get() == 0L)
    // ungrouped min/max(offset) on a MULTI-partition topic: offsets are
    // dense per partition (each restarts at 0), so the global max over
    // 3 partitions × 10 rows is 9 — NOT total-rows−1 = 29 (the silent
    // wrong answer a naive flattened fold returns). Pushed and real-scan
    // answers must agree.
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val go = spark.read.format("graft-log").load(t)
      .agg(min("offset").as("omn"), max("offset").as("omx")).collect()(0)
    assert((go.getLong(0), go.getLong(1)) == ((0L, 9L)), go.toString)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 0L)
    val goTruth = spark.read.format("graft-log").load(t)
      .agg(min("offset").as("omn"), max("offset").as("omx"),
        countDistinct("key").as("dk")) // defeats the pushdown
      .drop("dk").collect()(0)
    assert((go.getLong(0), go.getLong(1)) ==
      ((goTruth.getLong(0), goTruth.getLong(1))))
  }

  test("aggregate pushdown skips zero-row partition dirs like the real groupBy") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_aggpush_emptydir")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    // A staged-but-aborted write can leave a partition dir with no
    // committed segments: the real scan's groupBy emits NO group for it,
    // so the complete pushdown must not invent a (3, 0, null) row.
    java.nio.file.Files.createDirectories(Paths.get(t, "p=3"))
    val pushed = spark.read.format("graft-log").load(t)
      .groupBy("partition").agg(count(lit(1)).as("n")).orderBy("partition")
    assert(pushed.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"))
    assert(pushed.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 10L), (1, 10L), (2, 10L)))
  }

  test("limit pushdown plans only the segments the budget needs") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_limitpush")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    // 3 committed segments of 10 rows each; a limit of 5 needs only the
    // first — exactly one file opened, and the rows ARE that segment's.
    graft.sources.GraftLog.segmentsOpened.set(0L)
    val five = spark.read.format("graft-log").load(t).limit(5).collect()
    assert(five.length == 5)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 1L,
      s"opened ${graft.sources.GraftLog.segmentsOpened.get()} files for limit 5")
    assert(five.forall(_.getInt(0) == five.head.getInt(0)),
      "limit-5 rows spilled across partitions")
    // budget spanning all segments keeps the full answer
    graft.sources.GraftLog.segmentsOpened.set(0L)
    assert(spark.read.format("graft-log").load(t).limit(25)
      .count() == 25L)
    assert(graft.sources.GraftLog.segmentsOpened.get() == 3L)
    // limit above re-applied filters must NOT shrink the result: the
    // filter is post-scan, so Spark keeps the limit above it
    val filtered = spark.read.format("graft-log").load(t)
      .filter(col("key") >= "k015").limit(4).collect()
    assert(filtered.length == 4)
    assert(filtered.forall(_.getString(2) >= "k015"))
  }

  test("aggregate pushdown refuses filtered or unsupported shapes and stays correct") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_aggpush_refuse")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    // partition filter pushed -> manifest totals no longer answer: the
    // source must fall back to the ordinary scan and aggregate normally
    val filtered = spark.read.format("graft-log").load(t)
      .filter(col("partition") === 1)
      .groupBy("partition").agg(count(lit(1)).as("n"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftLogAggScan"), plan)
    assert(filtered.collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq == Seq((1, 10L)))
    // unsupported aggregate (min over a string column): same fallback
    val mk = spark.read.format("graft-log").load(t)
      .groupBy("partition").agg(min("key").as("mk")).orderBy("partition")
    assert(!mk.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"))
    assert(mk.collect().map(_.getString(1)).toSeq ==
      Seq("k000", "k001", "k002"))
  }

  test("columnar read path: ColumnarToRow planned, frames byte-identical") {
    val t = freshTopic("dsv2_columnar")
    tinyFrame.write.format("graft-log").mode("append").save(t)
    val rowPath = spark.read.format("graft-log").load(t)
      .orderBy("partition", "offset")
    val colPath = spark.read.format("graft-log")
      .option("columnar", "true").load(t)
      .orderBy("partition", "offset")
    val colRows = colPath.collect()
    val rowRows = rowPath.collect()
    val plan = colPath.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar option must plan the batch bridge:\n$plan")
    assert(!rowPath.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"))
    assert(colRows.map(_.toSeq).toSeq == rowRows.map(_.toSeq).toSeq)
  }

  test("columnar read: batch boundary at 4096 rows is seamless") {
    val sp = spark
    import sp.implicits._
    val t = freshTopic("dsv2_columnar_big")
    // one partition with 10000 rows: 3 batches, last one partial
    (0 until 10000).map(i => (0, f"k$i%05d", s"v$i", 1700000000000000L + i))
      .toDF("partition", "key", "value", "ts")
      .repartition(1)
      .sortWithinPartitions(col("key"))
      .write.format("graft-log").mode("append").save(t)
    val back = spark.read.format("graft-log")
      .option("columnar", "true").load(t)
    assert(back.count() == 10000)
    val offs = back.select("offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until 10000L))
    // null value round-trips through the vector null path
    val nulls = spark.read.format("graft-log")
      .option("columnar", "true").load(t)
      .filter(col("value").isNull).count()
    assert(nulls == 0L)
  }
}

/** Test-side meta reader (keeps the production object's API surface small). */
object GraftLogMeta {
  def segs(topic: String, p: Int): Seq[(String, Long)] =
    graft.sources.GraftLog.readMeta(Paths.get(topic, s"p=$p"))
      .map(s => (s.name, s.rows))
}
