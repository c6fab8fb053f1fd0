package graft.sources

import java.io.{BufferedReader, BufferedWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics, Statistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-log`: a Kafka-shaped DataSource V2 connector — the custom
  * ingestion front door of the engine (SURVEY.md §2.A, dsv2_* keys).
  *
  * On-disk layout (one directory per topic):
  * {{{
  *   <root>/p=<k>/_meta           # committed segment index: "<name>\t<rows>"
  *   <root>/p=<k>/seg-<nnnnnn>    # text segments: "key\tvalue\tts" per line
  *   <root>/_staging/<uuid>/      # in-flight writer output (never read)
  * }}}
  *
  * The design carries Kafka's semantics into a file layout:
  *  - **Partitions are the unit of order.** A record's identity is
  *    (partition, offset); offsets are dense per partition, assigned by
  *    committed segment order. Readers in both batch and streaming see the
  *    same (partition, offset, key, value, ts) rows.
  *  - **`_meta` is the source of truth, not the directory listing.** A
  *    segment becomes visible only when the per-partition `_meta` is
  *    atomically replaced (write-temp + ATOMIC_MOVE), so a concurrent
  *    reader sees the previous committed segment set or the new one, never
  *    a half-written segment. Visibility is per-partition-atomic — exactly
  *    Kafka's guarantee (no cross-partition transactions).
  *  - **Offsets come from metadata, not data.** `latestOffset` reads P
  *    small `_meta` files — O(partitions), never O(records) — so streaming
  *    admission control stays cheap when segments hold billions of rows.
  *
  * Scale design (the 100 TB story):
  *  - Batch scans plan **one InputPartition per segment** (not per log
  *    partition), so scan parallelism tracks data volume; segment size is
  *    the writer's rotation policy.
  *  - Column pruning and partition-predicate pushdown happen in the
  *    connector ([[LogScanBuilder]]): a `WHERE partition = 2` never opens
  *    the other partitions' files (asserted via [[GraftLog.segmentsOpened]]
  *    in DsV2Spec), and a projection to (partition, value) never
  *    materializes key/ts fields.
  *  - The scan reports exact statistics from `_meta` + file sizes
  *    ([[SupportsReportStatistics]]), so Catalyst can pick a broadcast
  *    join for a small log table without a size guess.
  *  - Writes follow the V2 commit protocol: tasks stage segments under
  *    `_staging/` and report them in [[WriterCommitMessage]]s; only the
  *    driver's `commit` renames them into place (sorted by (partition,
  *    task) — deterministic segment order) and swaps `_meta`. An abort
  *    deletes the staging directory; readers never observe it.
  *
  * Single-writer-per-topic assumption (like one Kafka broker owning a
  * partition's log): concurrent committers would race the meta
  * read-modify-write. The local-FS rename model maps 1:1 onto any
  * rename-atomic store (HDFS, POSIX); object stores would swap a manifest
  * object instead — the protocol shape is unchanged.
  */
object GraftLog {

  val SCHEMA: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("ts", LongType, nullable = false)))

  /** Test instrumentation (local-mode only: executors share the JVM):
    * number of segment files actually opened by readers since reset.
    * DsV2Spec uses it to prove partition-filter pushdown skips files.
    */
  val segmentsOpened = new AtomicLong(0L)

  final case class Seg(name: String, rows: Long)

  /** Committed segments of one partition dir, in offset order. */
  def readMeta(pDir: Path): Seq[Seg] = {
    val meta = pDir.resolve("_meta")
    if (!Files.exists(meta)) Seq.empty
    else Files.readAllLines(meta, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map { l =>
        val Array(n, c) = l.split("\t", 2); Seg(n, c.toLong)
      }
  }

  /** Atomically replace a partition's `_meta` (write temp + ATOMIC_MOVE). */
  def writeMeta(pDir: Path, segs: Seq[Seg]): Unit = {
    val tmp = pDir.resolve(s"_meta.tmp")
    Files.write(tmp,
      segs.map(s => s"${s.name}\t${s.rows}").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pDir.resolve("_meta"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Partition dirs of a topic, sorted by partition id. */
  def partitionDirs(root: String): Seq[(Int, Path)] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Seq.empty
    else scala.util.Using.resource(Files.list(r)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p="))
        .map(p => (p.getFileName.toString.stripPrefix("p=").toInt, p))
        .toSeq.sortBy(_._1)
    }
  }

  /** Committed record count per partition — O(partitions) metadata reads. */
  def committedCounts(root: String): Map[Int, Long] =
    partitionDirs(root).map { case (p, d) => p -> readMeta(d).map(_.rows).sum }
      .toMap
}

/** Registered as short name `graft-log` via META-INF/services. */
class GraftLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-log requires a path")
    new LogTable(path)
  }
}

class LogTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-log:$path"
  override def schema(): StructType = GraftLog.SCHEMA
  // ACCEPT_ANY_SCHEMA: writers provide (partition, key, value, ts) and the
  // LOG assigns offsets — so input must not be resolved against the read
  // schema (which includes `offset`). The writer binds fields by name and
  // validates types itself (the Kafka-sink pattern).
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(path, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LogWriteBuilder(path, info)
}

/** Column pruning + partition-predicate pushdown. Only predicates on the
  * `partition` column prune I/O (they select whole directories); everything
  * else is left for Spark to re-apply after the scan (`pushFilters` returns
  * all filters as post-scan residuals — correctness never depends on the
  * connector's filter reasoning).
  */
class LogScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = GraftLog.SCHEMA
  private var pushedParts: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushedParts = filters.filter {
      case EqualTo("partition", _) | In("partition", _) |
           GreaterThan("partition", _) | GreaterThanOrEqual("partition", _) |
           LessThan("partition", _) | LessThanOrEqual("partition", _) => true
      case _ => false
    }
    filters // all residual: Spark re-applies every predicate post-scan
  }
  override def pushedFilters(): Array[Filter] = pushedParts

  override def build(): Scan = new LogScan(path, required, pushedParts,
    Option(options.get("maxRecordsPerTrigger")).map(_.toLong))
}

class LogScan(path: String, required: StructType, pushed: Array[Filter],
    maxRecordsPerTrigger: Option[Long])
    extends Scan with SupportsReportStatistics {

  private def asInt(v: Any): Int = v match {
    case i: Int => i; case l: Long => l.toInt; case other =>
      other.toString.toInt
  }

  /** Evaluate the pushed partition predicates against a partition id. */
  private[sources] def partitionSurvives(p: Int): Boolean = pushed.forall {
    case EqualTo("partition", v) => p == asInt(v)
    case In("partition", vs) => vs.exists(v => asInt(v) == p)
    case GreaterThan("partition", v) => p > asInt(v)
    case GreaterThanOrEqual("partition", v) => p >= asInt(v)
    case LessThan("partition", v) => p < asInt(v)
    case LessThanOrEqual("partition", v) => p <= asInt(v)
    case _ => true
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftLogScan path=$path cols=${required.fieldNames.mkString(",")} " +
      s"pushedPartitionFilters=[${pushed.mkString(", ")}]"

  override def toBatch: Batch = new LogBatch(path, required, this)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path, required, this, maxRecordsPerTrigger)

  /** Exact stats from `_meta` + committed file sizes: rowCount is the meta
    * sum, sizeInBytes the surviving segments' on-disk bytes. Accurate small
    * sizes let Catalyst choose broadcast joins for small topics.
    */
  override def estimateStatistics(): Statistics = {
    var rows = 0L; var bytes = 0L
    GraftLog.partitionDirs(path).foreach { case (p, dir) =>
      if (partitionSurvives(p)) GraftLog.readMeta(dir).foreach { s =>
        rows += s.rows
        val f = dir.resolve(s.name)
        if (Files.exists(f)) bytes += Files.size(f)
      }
    }
    val (r, b) = (rows, bytes)
    new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.of(b)
      override def numRows() = java.util.OptionalLong.of(r)
    }
  }
}

/** One InputPartition per committed SEGMENT: batch parallelism tracks data
  * volume (segment count), not topic partition count.
  */
class LogBatch(path: String, required: StructType, scan: LogScan) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    GraftLog.partitionDirs(path).flatMap { case (p, dir) =>
      if (!scan.partitionSurvives(p)) Seq.empty
      else {
        var base = 0L
        GraftLog.readMeta(dir).map { seg =>
          val ip = LogInputPartition(p,
            Seq(dir.resolve(seg.name).toString), base, 0L, seg.rows)
          base += seg.rows
          ip
        }
      }
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(required)
}

/** files: segment paths in offset order; firstOffset: offset of the first
  * line of files.head; skip: lines to discard before emitting; limit: rows
  * to emit (the reader emits offsets firstOffset+skip .. +skip+limit-1).
  */
final case class LogInputPartition(p: Int, files: Seq[String],
    firstOffset: Long, skip: Long, limit: Long) extends InputPartition

class LogReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LogPartitionReader(partition.asInstanceOf[LogInputPartition], required)
}

class LogPartitionReader(part: LogInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val fieldIdx = required.fieldNames // projection order
  private var fileIdx = 0
  private var reader: BufferedReader = _
  private var emitted = 0L
  private var skipped = 0L
  private var offset = part.firstOffset
  private var current: InternalRow = _

  private def nextLine(): String = {
    while (true) {
      if (reader == null) {
        if (fileIdx >= part.files.size) return null
        GraftLog.segmentsOpened.incrementAndGet()
        reader = Files.newBufferedReader(
          Paths.get(part.files(fileIdx)), StandardCharsets.UTF_8)
        fileIdx += 1
      }
      val l = reader.readLine()
      if (l != null) return l
      reader.close(); reader = null
    }
    null // unreachable
  }

  override def next(): Boolean = {
    if (emitted >= part.limit) return false
    while (skipped < part.skip) {
      if (nextLine() == null) return false
      skipped += 1; offset += 1
    }
    val line = nextLine()
    if (line == null) return false
    val f = line.split("\t", 3)
    val vals = fieldIdx.map {
      case "partition" => Integer.valueOf(part.p)
      case "offset" => java.lang.Long.valueOf(offset)
      case "key" => UTF8String.fromString(f(0))
      case "value" => UTF8String.fromString(if (f.length > 1) f(1) else "")
      case "ts" => java.lang.Long.valueOf(if (f.length > 2) f(2).toLong else 0L)
    }
    current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    offset += 1; emitted += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

/** Streaming offset: committed record count per partition, JSON `{"p":n}`.
  * Dense per-partition counts make ranges trivially resumable: a restart
  * replans exactly [start, end) from the checkpointed JSON.
  */
final case class LogOffset(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}

object LogOffset {
  def parse(json: String): LogOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) LogOffset(Map.empty)
    else LogOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

/** Micro-batch stream with admission control: `maxRecordsPerTrigger` caps a
  * batch's total rows, allocated across partitions proportionally to lag
  * (floor division; any remainder goes to the lowest-numbered lagging
  * partitions — deterministic). Under Trigger.AvailableNow the endpoint is
  * pinned by [[prepareForTriggerAvailableNow]] so batches drain exactly to
  * the capture point even while a writer keeps appending.
  */
class LogMicroBatchStream(path: String, required: StructType, scan: LogScan,
    maxRecordsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None

  private def surviving(m: Map[Int, Long]): Map[Int, Long] =
    m.filter { case (p, _) => scan.partitionSurvives(p) }

  private def current(): Map[Int, Long] = {
    val disk = surviving(GraftLog.committedCounts(path))
    availableNowTarget match {
      case Some(t) => t
      case None => disk
    }
  }

  override def initialOffset(): Offset = LogOffset(Map.empty)

  override def deserializeOffset(json: String): Offset = LogOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LogOffset].counts
    val cur = current()
    val lag = cur.map { case (p, n) => p -> (n - s.getOrElse(p, 0L)) }
      .filter(_._2 > 0L)
    val capped = limit match {
      case _: ReadAllAvailable => cur
      case m: ReadMaxRows =>
        val total = lag.values.sum
        val cap = m.maxRows()
        if (total <= cap) cur
        else {
          // proportional-to-lag allocation, deterministic remainder
          val base = lag.map { case (p, l) => p -> (cap * l / total) }
          var rem = cap - base.values.sum
          val bumped = lag.keys.toSeq.sorted.map { p =>
            val extra = if (rem > 0 && base(p) < lag(p)) { rem -= 1; 1L } else 0L
            p -> math.min(lag(p), base(p) + extra)
          }.toMap
          cur.map { case (p, n) =>
            p -> math.min(n, s.getOrElse(p, 0L) + bumped.getOrElse(p, 0L))
          }
        }
      case _ => cur
    }
    LogOffset(capped)
  }

  override def reportLatestOffset(): Offset =
    LogOffset(surviving(GraftLog.committedCounts(path)))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(surviving(GraftLog.committedCounts(path)))

  /** Plan one reader per partition covering [start, end): locate the
    * covering segments from `_meta` and skip into the first one.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].counts
    val e = end.asInstanceOf[LogOffset].counts
    val dirs = GraftLog.partitionDirs(path).toMap
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L)
      if (endOff <= startOff || !dirs.contains(p)) Seq.empty
      else {
        val dir = dirs(p)
        var base = 0L
        val files = mutable.ArrayBuffer.empty[String]
        var firstBase = -1L
        GraftLog.readMeta(dir).foreach { seg =>
          val segEnd = base + seg.rows
          if (segEnd > startOff && base < endOff) {
            if (firstBase < 0) firstBase = base
            files += dir.resolve(seg.name).toString
          }
          base = segEnd
        }
        Seq(LogInputPartition(p, files.toSeq, firstBase,
          startOff - firstBase, endOff - startOff))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---------------------------------------------------------------------------
// Write path — V2 commit protocol
// ---------------------------------------------------------------------------

/** Input contract: columns (partition INT, key STRING, value STRING,
  * ts LONG) — `offset` is assigned by the log, never by the writer.
  */
class LogWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  private def indexes(): (Int, Int, Int, Int) = {
    val in = info.schema()
    def idx(n: String, expected: DataType): Int = {
      require(in.fieldNames.contains(n),
        s"graft-log write requires column `$n` " +
          s"(got ${in.fieldNames.mkString(", ")})")
      val i = in.fieldIndex(n)
      require(in.fields(i).dataType == expected,
        s"graft-log write column `$n` must be $expected, " +
          s"got ${in.fields(i).dataType}")
      i
    }
    (idx("partition", IntegerType), idx("key", StringType),
      idx("value", StringType), idx("ts", LongType))
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val (p, k, v, t) = indexes()
      new LogBatchWrite(path, p, k, v, t, info.queryId())
    }
    override def toStreaming: StreamingWrite = {
      val (p, k, v, t) = indexes()
      new LogStreamingWrite(path, p, k, v, t, info.queryId())
    }
  }
}

final case class LogSegMsg(taskPartition: Int,
    segs: Seq[(Int, String, Long)]) extends WriterCommitMessage // (p, staged, rows)

/** Driver-side commit mechanics shared by the batch and streaming writes. */
private[sources] object LogCommit {

  /** Move staged segments into their partition dirs in (partition, task)
    * order — deterministic segment numbering — then swap each partition's
    * `_meta` atomically. Readers see a partition's batch all-or-nothing
    * (per-partition atomicity, the Kafka guarantee).
    */
  def commitStaged(path: String, messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case m: LogSegMsg => m }
      .flatMap(m => m.segs.map { case (p, f, n) => (p, m.taskPartition, f, n) })
      .sortBy(t => (t._1, t._2))
    staged.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (p, ss) =>
      val pDir = Paths.get(path, s"p=$p")
      Files.createDirectories(pDir)
      val existing = GraftLog.readMeta(pDir)
      var n = existing.size
      val added = ss.map { case (_, _, stagedFile, rows) =>
        val name = f"seg-$n%06d"
        Files.move(Paths.get(stagedFile), pDir.resolve(name),
          StandardCopyOption.ATOMIC_MOVE)
        n += 1
        GraftLog.Seg(name, rows)
      }
      GraftLog.writeMeta(pDir, existing ++ added)
    }
  }

  def cleanupStaging(path: String, stagingDir: String): Unit = {
    val st = Paths.get(stagingDir)
    if (Files.exists(st))
      scala.util.Using.resource(Files.walk(st)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }
    val parent = Paths.get(path, "_staging")
    if (Files.exists(parent) &&
      scala.util.Using.resource(Files.list(parent))(_.count()) == 0L)
      Files.deleteIfExists(parent)
  }

  /** Epoch ledger for the streaming write: `<topic>/_epochs` lines
    * `<queryId>:<epochId>`. Consulted before a streaming commit so a
    * RETRIED epoch commit (driver recovery re-offers the same epoch) is a
    * no-op — the log never double-appends: exactly-once on the produce
    * side, which file-ledger Kafka can offer and real Kafka cannot
    * without transactions.
    */
  def epochCommitted(path: String, queryId: String, epochId: Long): Boolean = {
    val f = Paths.get(path, "_epochs")
    Files.exists(f) && Files.readAllLines(f, StandardCharsets.UTF_8)
      .asScala.contains(s"$queryId:$epochId")
  }

  def recordEpoch(path: String, queryId: String, epochId: Long): Unit = {
    val f = Paths.get(path, "_epochs")
    val lines = if (Files.exists(f))
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
    else Seq.empty
    val tmp = Paths.get(path, "_epochs.tmp")
    // bounded ledger: an epoch retry can only reach back a few batches, so
    // keeping the most recent entries is safe (Kafka's retention analogue)
    Files.write(tmp, (lines :+ s"$queryId:$epochId").takeRight(10000)
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

class LogBatchWrite(path: String, pIdx: Int, kIdx: Int, vIdx: Int, tIdx: Int,
    queryId: String) extends BatchWrite {

  private val stagingDir = s"$path/_staging/$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LogWriterFactory(stagingDir, pIdx, kIdx, vIdx, tIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    LogCommit.commitStaged(path, messages)
    LogCommit.cleanupStaging(path, stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LogCommit.cleanupStaging(path, stagingDir)
}

/** Streaming produce path: per-epoch staged segments, committed through the
  * same rename + `_meta`-swap protocol, with an epoch ledger making commit
  * retries idempotent (see [[LogCommit.epochCommitted]]). Paired with the
  * micro-batch source's checkpointed offsets this gives end-to-end
  * exactly-once log→log pipelines.
  */
class LogStreamingWrite(path: String, pIdx: Int, kIdx: Int, vIdx: Int,
    tIdx: Int, queryId: String) extends StreamingWrite {

  private def stagingDir(epochId: Long) = s"$path/_staging/$queryId-e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LogStreamingWriterFactory(s"$path/_staging/$queryId", pIdx, kIdx, vIdx, tIdx)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    if (!LogCommit.epochCommitted(path, queryId, epochId)) {
      LogCommit.commitStaged(path, messages)
      LogCommit.recordEpoch(path, queryId, epochId)
    }
    LogCommit.cleanupStaging(path, stagingDir(epochId))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    LogCommit.cleanupStaging(path, stagingDir(epochId))
}

final case class LogStreamingWriterFactory(stagingBase: String, pIdx: Int,
    kIdx: Int, vIdx: Int, tIdx: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(s"$stagingBase-e$epochId", partitionId,
      pIdx, kIdx, vIdx, tIdx)
}

class LogWriterFactory(stagingDir: String, pIdx: Int, kIdx: Int, vIdx: Int,
    tIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(stagingDir, partitionId, pIdx, kIdx, vIdx, tIdx)
}

/** Task-side writer: one staged segment per log partition encountered.
  * Nothing it writes is visible until the driver's commit renames it out of
  * `_staging/` and republishes `_meta`.
  */
class LogDataWriter(stagingDir: String, taskPartition: Int, pIdx: Int,
    kIdx: Int, vIdx: Int, tIdx: Int) extends DataWriter[InternalRow] {

  private val writers = mutable.Map.empty[Int, (Path, BufferedWriter)]
  private val counts = mutable.Map.empty[Int, Long].withDefaultValue(0L)

  private def writerFor(p: Int): BufferedWriter =
    writers.getOrElseUpdate(p, {
      val dir = Paths.get(stagingDir)
      Files.createDirectories(dir)
      val f = dir.resolve(f"t$taskPartition%05d-p$p")
      (f, Files.newBufferedWriter(f, StandardCharsets.UTF_8))
    })._2

  override def write(row: InternalRow): Unit = {
    val p = row.getInt(pIdx)
    val w = writerFor(p)
    w.write(row.getUTF8String(kIdx).toString)
    w.write('\t')
    w.write(row.getUTF8String(vIdx).toString)
    w.write('\t')
    w.write(row.getLong(tIdx).toString)
    w.write('\n')
    counts(p) += 1L
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._2.close())
    LogSegMsg(taskPartition,
      writers.toSeq.sortBy(_._1).map { case (p, (f, _)) =>
        (p, f.toString, counts(p))
      })
  }

  override def abort(): Unit = {
    writers.values.foreach { case (f, w) =>
      w.close(); Files.deleteIfExists(f)
    }
  }

  override def close(): Unit = ()
}
