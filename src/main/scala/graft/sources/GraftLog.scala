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
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{
  AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey,
  InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownLimit, SupportsPushDownRequiredColumns,
  SupportsReportPartitioning, SupportsReportStatistics,
  SupportsRuntimeFiltering, Statistics}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
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
  *   <root>/p=<k>/_meta           # committed segment index:
  *                                #   "<name>\t<rows>\t<tsMin>\t<tsMax>"
  *                                # plus "#e\t<queryId>:<epochId>" epoch tags
  *   <root>/p=<k>/seg-<nnnnnn>    # text segments: "key\tvalue\tts" per line
  *                                # (fields escape \ \t \n \r; NULL = "\N")
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
  *    materializes key/ts fields. Partition pruning also fires at RUNTIME
  *    ([[SupportsRuntimeFiltering]]): a join to a filtered dim on
  *    `partition` delivers the build side's values to the scan before the
  *    fact side plans its splits — DPP for the log.
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

  /** A committed segment: name, row count, and the min/max `ts` it holds
    * (written since round 8 — older metas parse with unbounded ts, so a
    * ts-range pushdown simply cannot skip them; never a wrong answer).
    */
  final case class Seg(name: String, rows: Long,
      tsMin: Long = Long.MinValue, tsMax: Long = Long.MaxValue)

  /** Committed segments of one partition dir, in offset order. Lines
    * starting with `#` are epoch-commit markers (see [[readMetaTags]]).
    */
  def readMeta(pDir: Path): Seq[Seg] = metaLines(pDir)
    .filterNot(_.startsWith("#")).map { l =>
      l.split("\t") match {
        case Array(n, c) => Seg(n, c.toLong)
        case Array(n, c, lo, hi) => Seg(n, c.toLong, lo.toLong, hi.toLong)
        case other => sys.error(s"bad _meta line: ${other.mkString("\t")}")
      }
    }

  /** Epoch tags (`queryId:epochId`) folded into this partition's `_meta` by
    * the streaming commit — the same atomic swap that publishes the
    * epoch's segments also records that the epoch landed, so a retried
    * commit skips exactly the partitions that already committed (no crash
    * window between data visibility and the dedup record).
    */
  def readMetaTags(pDir: Path): Seq[String] = metaLines(pDir)
    .filter(_.startsWith("#e\t")).map(_.stripPrefix("#e\t"))

  private def metaLines(pDir: Path): Seq[String] = {
    val meta = pDir.resolve("_meta")
    if (!Files.exists(meta)) Seq.empty
    else Files.readAllLines(meta, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
  }

  /** Atomically replace a partition's `_meta` (write temp + ATOMIC_MOVE).
    * Tags ride in the same swap; the ledger is bounded (a commit retry can
    * only reach back a few epochs — Kafka's retention analogue).
    */
  def writeMeta(pDir: Path, segs: Seq[Seg], tags: Seq[String] = Seq.empty): Unit = {
    val tmp = pDir.resolve(s"_meta.tmp")
    val body = tags.takeRight(1000).map(t => s"#e\t$t") ++
      segs.map(s => s"${s.name}\t${s.rows}\t${s.tsMin}\t${s.tsMax}")
    Files.write(tmp,
      body.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pDir.resolve("_meta"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Segment text encoding: fields are `\t`-separated, records `\n`-
    * separated, so field values escape `\` `\t` `\n` `\r` and a SQL NULL
    * is the 2-char sentinel `\N` (a literal "\N" value escapes its
    * backslash, so the two are unambiguous). A value with an embedded tab
    * or newline can therefore never shift fields or desync reader offsets
    * from `_meta` row counts.
    */
  def encodeField(s: UTF8String): String =
    if (s == null) "\\N"
    else {
      val str = s.toString
      var needs = false
      var i = 0
      while (i < str.length && !needs) {
        val c = str.charAt(i)
        needs = c == '\\' || c == '\t' || c == '\n' || c == '\r'
        i += 1
      }
      if (!needs) str
      else {
        val sb = new java.lang.StringBuilder(str.length + 8)
        str.foreach {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        sb.toString
      }
    }

  def decodeField(f: String): UTF8String =
    if (f == "\\N") null
    else if (f.indexOf('\\') < 0) UTF8String.fromString(f)
    else {
      val sb = new java.lang.StringBuilder(f.length)
      var i = 0
      while (i < f.length) {
        val c = f.charAt(i)
        if (c == '\\' && i + 1 < f.length) {
          f.charAt(i + 1) match {
            case '\\' => sb.append('\\')
            case 't' => sb.append('\t')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 'N' => sb.append('\\').append('N') // escaped literal "\N"
            case o => sb.append(o)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      UTF8String.fromString(sb.toString)
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

/** Column pruning + predicate pushdown. Predicates on `partition` prune
  * whole directories; range predicates on `offset` and `ts` prune whole
  * SEGMENTS (the Kafka seek-by-offset / seek-by-timestamp idiom): offsets
  * are dense per partition so `_meta` row counts give each segment's exact
  * offset range, and `_meta` carries each segment's min/max ts. Everything
  * is still left for Spark to re-apply after the scan (`pushFilters`
  * returns all filters as post-scan residuals — correctness never depends
  * on the connector's filter reasoning; pushdown only skips files that
  * provably hold no qualifying rows).
  */
class LogScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = GraftLog.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  private var aggResult: Option[(StructType, Seq[Array[Option[Long]]])] = None
  private var limit: Option[Int] = None

  /** PARTIAL limit pushdown: the batch planner stops planning segments
    * once the surviving ones already hold `limit` rows (greedy in
    * (partition, offset) order), so a `LIMIT n` over a huge topic opens
    * O(n / segment-rows) files instead of all of them. Partial — Spark
    * re-applies the limit above the scan — so pruning can only skip
    * files, never change the answer (the filter-pushdown contract, again).
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def rangeCol(c: String): Boolean = c == "offset" || c == "ts"

  /** COMPLETE aggregate pushdown answered from the `_meta` manifests
    * alone: count(*) (Σ segment row counts), min/max(ts) (segment ts
    * spans are exact per-segment min/max), and min/max(offset) (offsets
    * are dense per partition: [0, Σrows)), optionally grouped by
    * `partition` — the log analogue of parquet's metadata-only count.
    * Zero segment files are opened (DsV2Spec pins segmentsOpened == 0).
    * Refused — falling back to the ordinary scan, never a wrong answer —
    * when any filter was pushed (manifest totals are whole-partition
    * facts), when any other aggregate/group shape appears, or when a
    * pre-round-8 segment has an unbounded ts span and a ts bound was
    * asked for.
    */
  private def colOf(f: AggregateFunc): Option[String] = f match {
    case m: Min => m.column() match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    case m: Max => m.column() match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    case _ => None
  }

  private def planAgg(agg: Aggregation)
      : Option[(StructType, Seq[Array[Option[Long]]])] = {
    if (pushed.nonEmpty) return None
    val grouped = agg.groupByExpressions() match {
      case Array() => false
      case Array(e: NamedReference)
          if e.fieldNames.toSeq == Seq("partition") => true
      case _ => return None
    }
    // accepted shapes: CountStar, Min/Max over ts or offset
    sealed trait Col; case object N extends Col
    case object TsMin extends Col; case object TsMax extends Col
    case object OffMin extends Col; case object OffMax extends Col
    val cols: Seq[Col] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => N
      case f: Min => colOf(f) match {
        case Some("ts") => TsMin; case Some("offset") => OffMin
        case _ => return None
      }
      case f: Max => colOf(f) match {
        case Some("ts") => TsMax; case Some("offset") => OffMax
        case _ => return None
      }
      case _ => return None
    }
    val needTs = cols.exists(c => c == TsMin || c == TsMax)
    val parts = GraftLog.partitionDirs(path).map { case (p, dirPath) =>
      (p, GraftLog.readMeta(dirPath))
    }
    if (needTs && parts.exists(_._2.exists(s =>
        s.tsMin == Long.MinValue || s.tsMax == Long.MaxValue)))
      return None // old metas can't prove ts bounds: full scan instead
    def stats(segs: Seq[GraftLog.Seg]): Map[Col, Option[Long]] = {
      val n = segs.map(_.rows).sum
      Map(
        N -> Some(n),
        TsMin -> (if (segs.isEmpty) None else Some(segs.map(_.tsMin).min)),
        TsMax -> (if (segs.isEmpty) None else Some(segs.map(_.tsMax).max)),
        OffMin -> (if (n == 0) None else Some(0L)),
        OffMax -> (if (n == 0) None else Some(n - 1)))
    }
    val rows: Seq[Array[Option[Long]]] =
      if (grouped)
        // A zero-row partition dir (e.g. staged-but-aborted write leaving
        // an empty _meta) produces NO group in the real scan's groupBy —
        // the complete pushdown must not invent a (p, 0, null…) row for it.
        parts.sortBy(_._1)
          .filter { case (_, segs) => segs.map(_.rows).sum > 0 }
          .map { case (p, segs) =>
            val st = stats(segs)
            Array(Option(p.toLong)) ++ cols.map(st)
          }
      else {
        // Global min/max(ts) and count fold across the flattened seg list
        // (exact because segment spans are exact) — but offsets are dense
        // PER PARTITION (each partition's offsets restart at 0), so the
        // global max offset is the max over partitions of (rows_p − 1),
        // NOT total-rows − 1: 3 partitions × 10 rows has max offset 9.
        val all = stats(parts.flatMap(_._2))
        val partNs = parts.map(_._2.map(_.rows).sum).filter(_ > 0)
        val fixed = all + (OffMax ->
          (if (partNs.isEmpty) None else Some(partNs.max - 1)))
        Seq(cols.map(fixed).toArray)
      }
    val fields =
      (if (grouped) Seq(StructField("partition", IntegerType)) else Nil) ++
        cols.zipWithIndex.map {
          case (N, i) => StructField(s"agg_$i", LongType)
          case (_, i) => StructField(s"agg_$i", LongType)
        }
    Some((StructType(fields), rows))
  }

  // supportCompletePushDown and pushAggregation are both called by Spark
  // for the same Aggregation instance, and planAgg re-reads every
  // partition's _meta manifest — memoize per instance (reference
  // equality: Aggregation doesn't override equals) so planning-time IO
  // is paid once per pushed aggregate, not twice.
  private var aggMemo: Option[
    (Aggregation, Option[(StructType, Seq[Array[Option[Long]]])])] = None

  private def planAggMemo(agg: Aggregation)
      : Option[(StructType, Seq[Array[Option[Long]]])] = aggMemo match {
    case Some((a, r)) if a eq agg => r
    case _ =>
      val r = planAgg(agg)
      aggMemo = Some((agg, r))
      r
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    planAggMemo(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    planAggMemo(agg) match {
      case Some(r) => aggResult = Some(r); true
      case None => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("partition", _) | In("partition", _) |
           GreaterThan("partition", _) | GreaterThanOrEqual("partition", _) |
           LessThan("partition", _) | LessThanOrEqual("partition", _) => true
      case EqualTo(c, _) if rangeCol(c) => true
      case GreaterThan(c, _) if rangeCol(c) => true
      case GreaterThanOrEqual(c, _) if rangeCol(c) => true
      case LessThan(c, _) if rangeCol(c) => true
      case LessThanOrEqual(c, _) if rangeCol(c) => true
      case _ => false
    }
    filters // all residual: Spark re-applies every predicate post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggResult match {
    case Some((schema, rows)) => new LogAggScan(path, schema, rows)
    case None => new LogScan(path, required, pushed,
      Option(options.get("maxRecordsPerTrigger")).map(_.toLong), limit,
      columnar = options.getBoolean("columnar", false))
  }
}

/** Scan produced when an aggregate was completely pushed down: the result
  * rows were already computed from the `_meta` manifests at planning time;
  * the "read" replays them through one InputPartition. No segment file is
  * ever opened.
  */
class LogAggScan(path: String, schema: StructType,
    rows: Seq[Array[Option[Long]]]) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"GraftLogAggScan path=$path pushedAggregates=[${schema.fieldNames.mkString(",")}]"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(LogAggInputPartition(rows.map(_.toSeq)))
    override def createReaderFactory(): PartitionReaderFactory =
      new LogAggReaderFactory(schema)
  }
}

final case class LogAggInputPartition(rows: Seq[Seq[Option[Long]]])
    extends InputPartition

class LogAggReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LogAggInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(
        rows(i).zipWithIndex.map { case (v, j) =>
          (v, schema.fields(j).dataType) match {
            case (None, _) => null
            case (Some(x), IntegerType) => x.toInt: Any
            case (Some(x), _) => x: Any
          }
        }.toArray)
      override def close(): Unit = ()
    }
  }
}

class LogScan(path: String, required: StructType, pushed: Array[Filter],
    maxRecordsPerTrigger: Option[Long],
    private[sources] val limitRows: Option[Int] = None,
    private[sources] val columnar: Boolean = false)
    extends Scan with SupportsReportStatistics with SupportsReportPartitioning
    with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) partition filters, delivered by Spark AFTER the
    * build side of a join has executed — the dynamic sibling of the
    * planning-time pushdown. A log-topic fact scan joined to a filtered
    * dim on `partition` then opens only the joined partitions' segments.
    */
  @volatile private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("partition"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters

  private def asInt(v: Any): Int = v match {
    case i: Int => i; case l: Long => l.toInt; case other =>
      other.toString.toInt
  }
  private def asLong(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong; case other =>
      other.toString.toLong
  }

  /** Evaluate the pushed + runtime partition predicates against a
    * partition id (unknown predicate shapes keep the partition —
    * pruning is only ever a proof of emptiness).
    */
  private[sources] def partitionSurvives(p: Int): Boolean =
    (pushed ++ runtime).forall {
      case EqualTo("partition", v) => p == asInt(v)
      case In("partition", vs) => vs.exists(v => asInt(v) == p)
      case GreaterThan("partition", v) => p > asInt(v)
      case GreaterThanOrEqual("partition", v) => p >= asInt(v)
      case LessThan("partition", v) => p < asInt(v)
      case LessThanOrEqual("partition", v) => p <= asInt(v)
      case _ => true
    }

  /** Inclusive [lo, hi] bound the pushed range predicates allow on `col`. */
  private def bounds(col: String): (Long, Long) = {
    var lo = Long.MinValue; var hi = Long.MaxValue
    pushed.foreach {
      case EqualTo(`col`, v) =>
        lo = math.max(lo, asLong(v)); hi = math.min(hi, asLong(v))
      case GreaterThan(`col`, v) => lo = math.max(lo, asLong(v) + 1)
      case GreaterThanOrEqual(`col`, v) => lo = math.max(lo, asLong(v))
      case LessThan(`col`, v) => hi = math.min(hi, asLong(v) - 1)
      case LessThanOrEqual(`col`, v) => hi = math.min(hi, asLong(v))
      case _ =>
    }
    (lo, hi)
  }

  /** Can a segment spanning offsets [base, base+rows) with ts range
    * [tsMin, tsMax] hold a qualifying row? False → the file is never
    * opened (the seek: reader work is O(selected), not O(topic)).
    */
  private[sources] def segmentSurvives(base: Long, rows: Long,
      tsMin: Long, tsMax: Long): Boolean = {
    val (offLo, offHi) = bounds("offset")
    val (tsLo, tsHi) = bounds("ts")
    base + rows > offLo && base <= offHi && tsMax >= tsLo && tsMin <= tsHi
  }

  override def readSchema(): StructType = required

  /** Rows are clustered by the log partition (a segment holds exactly one
    * partition's records), reported as a key-grouped layout so a
    * `groupBy("partition")` — or a co-partitioned log-log join — skips its
    * Exchange entirely (exploited when
    * `spark.sql.sources.v2.bucketing.enabled` is on). Reported only when
    * the projection retains `partition`; otherwise the clustering key is
    * not in the output and the layout is opaque to Catalyst.
    */
  override def outputPartitioning(): Partitioning =
    if (required.fieldNames.contains("partition")) {
      val n = GraftLog.partitionDirs(path).count { case (p, _) =>
        partitionSurvives(p)
      }
      new KeyGroupedPartitioning(
        Array(Expressions.identity("partition")), math.max(n, 1))
    } else new UnknownPartitioning(0)

  override def description(): String =
    s"GraftLogScan path=$path cols=${required.fieldNames.mkString(",")} " +
      s"pushedFilters=[${pushed.mkString(", ")}]"

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
  override def planInputPartitions(): Array[InputPartition] = {
    val all = GraftLog.partitionDirs(path).flatMap { case (p, dir) =>
      if (!scan.partitionSurvives(p)) Seq.empty
      else {
        var base = 0L
        GraftLog.readMeta(dir).flatMap { seg =>
          val ip =
            if (scan.segmentSurvives(base, seg.rows, seg.tsMin, seg.tsMax))
              Some(LogInputPartition(p,
                Seq(dir.resolve(seg.name).toString), base, 0L, seg.rows))
            else None // pushed offset/ts range proves it empty: seek past it
          base += seg.rows
          ip
        }
      }
    }
    // Pushed LIMIT budget (partial pushdown — Spark re-applies the limit
    // above the scan): stop planning segments once the planned ones
    // already hold `limit` rows. Spark only pushes a limit when no
    // post-scan filter stands between it and the scan (and every graft
    // filter is re-applied post-scan), so raw segment row counts are the
    // qualifying row counts and the budget can never under-deliver.
    scan.limitRows match {
      case Some(l) =>
        var budget = l.toLong
        all.takeWhile { ip =>
          val need = budget > 0; budget -= ip.limit; need
        }.toArray
      case None => all.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(required, scan.columnar)
}

/** files: segment paths in offset order; firstOffset: offset of the first
  * line of files.head; skip: lines to discard before emitting; limit: rows
  * to emit (the reader emits offsets firstOffset+skip .. +skip+limit-1).
  * `partitionKey` backs the scan's [[KeyGroupedPartitioning]] report: all
  * of a split's rows carry log partition `p`.
  */
final case class LogInputPartition(p: Int, files: Seq[String],
    firstOffset: Long, skip: Long, limit: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](p))
}

class LogReaderFactory(required: StructType, columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LogPartitionReader(partition.asInstanceOf[LogInputPartition], required)

  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new LogColumnarReader(partition.asInstanceOf[LogInputPartition],
      required)
}

/** Vectorized read path (`option("columnar", "true")`): the same line
  * protocol decoded into 4096-row [[org.apache.spark.sql.vectorized
  * .ColumnarBatch]]es over on-heap column vectors — the Tungsten-friendly
  * batch interface a columnar file format would use. The row reader does
  * the decoding work; this class only owns batching and vector fill, so
  * row and columnar paths cannot drift (DsV2Spec asserts byte-identical
  * results). Spark inserts the ColumnarToRow bridge above the scan and
  * that conversion joins whole-stage codegen — the point of the
  * exercise: downstream operators iterate a dense batch, not a
  * per-record iterator.
  */
class LogColumnarReader(part: LogInputPartition, required: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val CAP = 4096
  private val rows = new LogPartitionReader(part, required)
  private val vectors = required.fields.map(f =>
    new OnHeapColumnVector(CAP, f.dataType))
  private val batch = new ColumnarBatch(
    vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector),
    0)
  private var done = false

  override def next(): Boolean = {
    if (done) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < CAP && rows.next()) {
      val r = rows.get()
      var i = 0
      while (i < required.fields.length) {
        required.fields(i).dataType match {
          case IntegerType => vectors(i).putInt(n, r.getInt(i))
          case LongType => vectors(i).putLong(n, r.getLong(i))
          case StringType =>
            val s = r.getUTF8String(i)
            if (s == null) vectors(i).putNull(n)
            else {
              val b = s.getBytes
              vectors(i).putByteArray(n, b, 0, b.length)
            }
          case dt => throw new IllegalStateException(
            s"unsupported columnar type $dt")
        }
        i += 1
      }
      n += 1
    }
    if (n == 0) { done = true; return false }
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = { rows.close(); batch.close() }
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
      case "key" => GraftLog.decodeField(f(0))
      case "value" => GraftLog.decodeField(if (f.length > 1) f(1) else "")
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

/** One staged segment: (log partition, staged path, rows, tsMin, tsMax). */
final case class StagedSeg(p: Int, file: String, rows: Long,
    tsMin: Long, tsMax: Long)

final case class LogSegMsg(taskPartition: Int,
    segs: Seq[StagedSeg]) extends WriterCommitMessage

/** Driver-side commit mechanics shared by the batch and streaming writes. */
private[sources] object LogCommit {

  /** Move staged segments into their partition dirs in (partition, task)
    * order — deterministic segment numbering — then swap each partition's
    * `_meta` atomically. Readers see a partition's batch all-or-nothing
    * (per-partition atomicity, the Kafka guarantee).
    *
    * `epochTag` (streaming): the tag is folded into each partition's
    * `_meta` in the SAME atomic swap that publishes its segments, and a
    * partition whose `_meta` already carries the tag is skipped — so a
    * commit retried after a mid-commit driver crash completes exactly the
    * partitions that had not landed, never double-appending the ones that
    * had. Exactly-once needs no ordering between a data swap and a
    * separate ledger write because there is no separate ledger write.
    */
  def commitStaged(path: String, messages: Array[WriterCommitMessage],
      epochTag: Option[String] = None): Unit = {
    val staged = messages.collect { case m: LogSegMsg => m }
      .flatMap(m => m.segs.map(s => (s, m.taskPartition)))
      .sortBy { case (s, task) => (s.p, task) }
    staged.groupBy(_._1.p).toSeq.sortBy(_._1).foreach { case (p, ss) =>
      val pDir = Paths.get(path, s"p=$p")
      Files.createDirectories(pDir)
      val tags = GraftLog.readMetaTags(pDir)
      if (!epochTag.exists(tags.contains)) {
        val existing = GraftLog.readMeta(pDir)
        var n = existing.size
        val added = ss.map { case (s, _) =>
          val name = f"seg-$n%06d"
          Files.move(Paths.get(s.file), pDir.resolve(name),
            StandardCopyOption.ATOMIC_MOVE)
          n += 1
          GraftLog.Seg(name, s.rows, s.tsMin, s.tsMax)
        }
        GraftLog.writeMeta(pDir, existing ++ added, tags ++ epochTag)
      }
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

  /** Topic-level epoch ledger `<topic>/_epochs` (`<queryId>:<epochId>`
    * lines) — OBSERVABILITY only (which epochs a query produced, in
    * order); the exactly-once dedup record is the per-partition `_meta`
    * tag written atomically with the data (see [[commitStaged]]). A
    * duplicate record (commit retried after the ledger write) is skipped.
    */
  def recordEpoch(path: String, queryId: String, epochId: Long): Unit = {
    val f = Paths.get(path, "_epochs")
    val lines = if (Files.exists(f))
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
    else Seq.empty
    if (!lines.contains(s"$queryId:$epochId")) {
      val tmp = Paths.get(path, "_epochs.tmp")
      // bounded ledger: an epoch retry can only reach back a few batches,
      // so keeping recent entries is safe (Kafka's retention analogue)
      Files.write(tmp, (lines :+ s"$queryId:$epochId").takeRight(10000)
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
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
  * same rename + `_meta`-swap protocol, with the `queryId:epochId` tag
  * folded into each partition's `_meta` swap so a retried epoch commit is
  * a per-partition no-op with NO crash window (see
  * [[LogCommit.commitStaged]]) — exactly-once on the produce side. Paired
  * with the micro-batch source's checkpointed offsets this gives
  * end-to-end exactly-once log→log pipelines.
  */
class LogStreamingWrite(path: String, pIdx: Int, kIdx: Int, vIdx: Int,
    tIdx: Int, queryId: String) extends StreamingWrite {

  private def stagingDir(epochId: Long) = s"$path/_staging/$queryId-e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LogStreamingWriterFactory(s"$path/_staging/$queryId", pIdx, kIdx, vIdx, tIdx)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    LogCommit.commitStaged(path, messages, Some(s"$queryId:$epochId"))
    LogCommit.recordEpoch(path, queryId, epochId)
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
    new LogDataWriter(s"$stagingBase-e$epochId", partitionId, taskId,
      pIdx, kIdx, vIdx, tIdx)
}

class LogWriterFactory(stagingDir: String, pIdx: Int, kIdx: Int, vIdx: Int,
    tIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(stagingDir, partitionId, taskId, pIdx, kIdx, vIdx, tIdx)
}

/** Task-side writer: one staged segment per log partition encountered.
  * Nothing it writes is visible until the driver's commit renames it out of
  * `_staging/` and republishes `_meta`. Staged names include the task
  * ATTEMPT id (`taskId`), so a speculative/retried attempt of the same
  * partition stages distinct files and its `abort()` can only delete its
  * own — never the committing attempt's.
  */
class LogDataWriter(stagingDir: String, taskPartition: Int, taskId: Long,
    pIdx: Int, kIdx: Int, vIdx: Int, tIdx: Int) extends DataWriter[InternalRow] {

  private val writers = mutable.Map.empty[Int, (Path, BufferedWriter)]
  private val counts = mutable.Map.empty[Int, Long].withDefaultValue(0L)
  private val tsMin = mutable.Map.empty[Int, Long].withDefaultValue(Long.MaxValue)
  private val tsMax = mutable.Map.empty[Int, Long].withDefaultValue(Long.MinValue)

  private def writerFor(p: Int): BufferedWriter =
    writers.getOrElseUpdate(p, {
      val dir = Paths.get(stagingDir)
      Files.createDirectories(dir)
      val f = dir.resolve(f"t$taskPartition%05d-a$taskId-p$p")
      (f, Files.newBufferedWriter(f, StandardCharsets.UTF_8))
    })._2

  override def write(row: InternalRow): Unit = {
    val p = row.getInt(pIdx)
    val w = writerFor(p)
    val k = if (row.isNullAt(kIdx)) null else row.getUTF8String(kIdx)
    val v = if (row.isNullAt(vIdx)) null else row.getUTF8String(vIdx)
    val ts = row.getLong(tIdx)
    w.write(GraftLog.encodeField(k))
    w.write('\t')
    w.write(GraftLog.encodeField(v))
    w.write('\t')
    w.write(ts.toString)
    w.write('\n')
    counts(p) += 1L
    if (ts < tsMin(p)) tsMin(p) = ts
    if (ts > tsMax(p)) tsMax(p) = ts
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._2.close())
    LogSegMsg(taskPartition,
      writers.toSeq.sortBy(_._1).map { case (p, (f, _)) =>
        StagedSeg(p, f.toString, counts(p), tsMin(p), tsMax(p))
      })
  }

  override def abort(): Unit = {
    writers.values.foreach { case (f, w) =>
      w.close(); Files.deleteIfExists(f)
    }
  }

  override def close(): Unit = ()
}
