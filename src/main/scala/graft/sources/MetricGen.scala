package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownAggregates, SupportsPushDownRequiredColumns,
  SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation,
  CountStar, Max => AggMax, Min => AggMin}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `metricgen` — a DataSource V2 TableProvider that GENERATES the
  * reference-shaped metrics feed (`data/dataset.csv:1` columns:
  * `ts,server_id,cpu_pct,mem_pct,net_in,net_out,disk_io`) at any row
  * count, deterministically, with the source-planning behaviors a real
  * 100 TB connector needs, implemented for real:
  *
  *  - **Filter pushdown into generation** (`SupportsPushDownFilters`):
  *    `ts` is nondecreasing in the row id (`ts(id) =
  *    floor(id/servers)·5s`), so every ts range predicate converts to
  *    an EXACT row-id bound — the scan then never plans, generates, or
  *    ships the excluded rows. This is the same shape as parquet
  *    row-group pruning or a time-partitioned table's partition
  *    pruning: the predicate dies at the source, not in a Filter node.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    projected columns are generated; a 2-column aggregate reads
  *    2-field rows (ReadSchema in the plan shows it).
  *  - **Limit pushdown** (`SupportsPushDownLimit`): LIMIT n caps the
  *    planned id range itself.
  *  - **COMPLETE aggregate pushdown** (`SupportsPushDownAggregates`):
  *    ungrouped COUNT(*)/MIN(ts)/MAX(ts) are closed-form over the
  *    (filter-clamped) id range — the scan answers them in one
  *    zero-generation row, the connector-side equivalent of
  *    metadata-only parquet footers.
  *  - **Statistics** (`SupportsReportStatistics`): row count and byte
  *    size AFTER pruning, so the optimizer can (e.g.) pick a broadcast
  *    join when a tight ts slice makes the generated side small.
  *
  * The same formulas as `StreamBench.writeSyntheticDay` (co-prime
  * residue metrics), but epoch-anchored timestamps and an unbounded
  * day count — and reproducible in ANSI SQL over `range(n)`, which is
  * what makes `q_gen_scan` hash-gateable against DuckDB.
  *
  * Usage:
  * {{{
  * spark.read.format("metricgen")
  *   .option("rows", 60000).option("servers", 20).load()
  * }}}
  *
  * Scale posture: partitions are contiguous id slices ([[MetricGen]]
  * `slices` option), embarrassingly parallel, zero I/O, zero skew; at
  * any cluster size the scan is CPU-bound generation with perfect
  * pushdown — which is why it is also the honest load generator for
  * benchmarking downstream operators without a disk bottleneck.
  */
class MetricGen extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "metricgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MetricGen.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MetricGenTable(properties)
}

object MetricGen {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("server_id", StringType, nullable = false),
    StructField("cpu_pct", DoubleType, nullable = false),
    StructField("mem_pct", DoubleType, nullable = false),
    StructField("net_in", DoubleType, nullable = false),
    StructField("net_out", DoubleType, nullable = false),
    StructField("disk_io", DoubleType, nullable = false)))

  private val StepUs = 5L * 1000000 // 5s cadence, reference parity

  /** Event-time micros for a row id (nondecreasing in id). */
  def tsUs(id: Long, servers: Long): Long = id / servers * StepUs

  /** One generated field; ids are nonnegative so `%` is a true mod.
    * (`id·71` is the largest multiplier: ids stay exact below ~1.3e17
    * rows — beyond any conceivable generation request.)
    */
  def fieldValue(ord: Int, id: Long, servers: Long): Any = ord match {
    case 0 => tsUs(id, servers)
    case 1 => UTF8String.fromString("server_" + (id % servers + 1))
    case 2 => (id * 37 % 10000) / 100.0
    case 3 => (id * 53 % 10000) / 100.0
    case 4 => (id * 71 % 2000000) / 100.0
    case 5 => (id * 13 % 2000000) / 100.0
    case 6 => (id * 29 % 1000000) / 100.0
  }

  private[sources] def ceilDiv(x: Long, d: Long): Long = -Math.floorDiv(-x, d)

  private[sources] def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(graft.core.TimeCodec.micros(t))
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000 + i.getNano / 1000)
    case _ => None
  }

  /** ts(id) = floor(id/servers)·step ⇒ every ts bound is an exact
    * floor(id/servers) bound ⇒ an exact id bound. Shared by the
    * compile-time pushdown (ScanBuilder) and the RUNTIME filter path
    * (SupportsRuntimeFiltering on the scan). Returns the tightened
    * (lo, hi), or None when the filter isn't a ts bound this algebra
    * handles. `In` — the shape DPP-style runtime filters take — is
    * clamped to its [min, max] value range: a superset, always safe
    * (the join above re-applies exact semantics).
    */
  private[sources] def tightenBounds(f: Filter, lo0: Long, hi0: Long,
      servers: Long): Option[(Long, Long)] = {
    val step = 5L * 1000000
    f match {
      case GreaterThanOrEqual("ts", v) => tsMicros(v).map { x =>
        (math.max(lo0, ceilDiv(x, step) * servers), hi0) }
      case GreaterThan("ts", v) => tsMicros(v).map { x =>
        (math.max(lo0, (Math.floorDiv(x, step) + 1) * servers), hi0) }
      case LessThan("ts", v) => tsMicros(v).map { x =>
        (lo0, math.min(hi0, ceilDiv(x, step) * servers)) }
      case LessThanOrEqual("ts", v) => tsMicros(v).map { x =>
        (lo0, math.min(hi0, (Math.floorDiv(x, step) + 1) * servers)) }
      case EqualTo("ts", v) => tsMicros(v).map { x =>
        if (x % step == 0) {
          val q = x / step
          (math.max(lo0, q * servers), math.min(hi0, (q + 1) * servers))
        } else (lo0, lo0) // off-grid instant: provably empty
      }
      case In("ts", values) =>
        val us = values.toSeq.flatMap(tsMicros)
        if (us.isEmpty) { if (values.isEmpty) Some((lo0, lo0)) else None }
        else Some((
          math.max(lo0, Math.floorDiv(us.min, step) * servers),
          math.min(hi0, (Math.floorDiv(us.max, step) + 1) * servers)))
      case _ => None
    }
  }
}

private[sources] class MetricGenTable(
    props: java.util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "metricgen"
  override def schema(): StructType = MetricGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MetricGenScanBuilder(
      MetricGenTable.mergedOptions(props, options))
}

private[sources] object MetricGenTable {
  /** A `CREATE TABLE ... USING metricgen OPTIONS(...)` catalog table
    * delivers its OPTIONS as table PROPERTIES (some catalogs under an
    * `option.` prefix), not as scan options — merge them, read-time
    * options winning.
    */
  def mergedOptions(props: java.util.Map[String, String],
      options: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val merged = new java.util.HashMap[String, String]()
    props.forEach { (k, v) =>
      val key = if (k.startsWith("option.")) k.substring(7) else k
      merged.put(key, v)
    }
    options.entrySet().forEach(e => merged.put(e.getKey, e.getValue))
    new CaseInsensitiveStringMap(merged)
  }
}

private[sources] class MetricGenScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private val rows = options.getLong("rows", 28800L)
  private val servers = options.getLong("servers", 20L)
  private val slices = options.getInt("slices", 32)
  require(rows >= 0 && servers > 0 && slices > 0,
    s"metricgen: rows=$rows servers=$servers slices=$slices")

  // planned id range; ts pushdown and limit tighten it. startSec /
  // endSec (epoch seconds, inclusive / exclusive) clamp it up front —
  // the option-driven pruning STREAMING reads need: Spark applies
  // predicate pushdown only to batch V2 scans, so a readStream filter
  // runs above the source (all ids generated) while these options
  // bound the offset range itself — the same contract as Kafka's
  // startingOffsets/endingOffsets.
  private var lo = 0L
  private var hi = rows
  if (options.containsKey("startSec"))
    lo = math.max(lo,
      MetricGen.ceilDiv(options.getLong("startSec", 0L) * 1000000, 5000000L) * servers)
  if (options.containsKey("endSec"))
    hi = math.min(hi,
      MetricGen.ceilDiv(options.getLong("endSec", 0L) * 1000000, 5000000L) * servers)
  private var pushed = Array.empty[Filter]
  private var required: StructType = MetricGen.schema

  /** Delegates to [[MetricGen.tightenBounds]]; true = fully handled
    * by the tightened range (no residual).
    */
  private def tighten(f: Filter): Boolean =
    MetricGen.tightenBounds(f, lo, hi, servers) match {
      case Some((l, h)) => lo = l; hi = h; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // In("ts", …) is PARTIALLY pushed: tightenBounds clamps to the
    // IN-set's [min, max] grid range — a superset — so unlike the
    // exact range shapes it MUST stay in the residual for Spark to
    // re-apply above the scan (a filter omitted from the residual is
    // treated as exactly applied by the source; returning a clamped
    // superset there would silently over-return rows). The runtime
    // path (SupportsRuntimeFiltering.filter) keeps the superset-only
    // treatment because its join re-applies exact semantics.
    val (partial, rest) = filters.partition(_.isInstanceOf[In])
    partial.foreach(f => MetricGen.tightenBounds(f, lo, hi, servers)
      .foreach { case (l, h) => lo = l; hi = h })
    val (handled, residual) = rest.partition(tighten)
    pushed = handled ++ partial
    partial ++ residual // Spark keeps evaluating these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  // COMPLETE aggregate pushdown: COUNT(*) / MIN(ts) / MAX(ts) with no
  // grouping are CLOSED-FORM over the (already filter-clamped) id
  // range — count = hi−lo, min = ts(lo), max = ts(hi−1) — so the
  // query answers without generating a single data row. Safe to
  // compose with the In partial pushdown because Spark only pushes an
  // aggregate when NO residual Filter sits between it and the scan
  // (a residual would have to run on unaggregated rows).
  private var aggKinds: Option[Seq[String]] = None

  private def isTs(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("ts"))
      case _ => false
    }

  private def translate(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count"
      case m: AggMin if isTs(m.column) => "min_ts"
      case m: AggMax if isTs(m.column) => "max_ts"
      case _ => return None
    }
    Some(kinds)
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some(kinds) => aggKinds = Some(kinds); true
      case None => false
    }

  override def build(): Scan = aggKinds match {
    case Some(kinds) =>
      new MetricGenAggScan(math.min(lo, hi), hi, servers, kinds)
    case None =>
      new MetricGenScan(math.min(lo, hi), hi, servers, slices, required,
        options.getLong("rowsPerBatch", 100000L))
  }
}

/** The closed-form aggregate scan: one partition, one row, zero data
  * generated. Empty range follows global-aggregate-over-empty-input
  * semantics: count 0, min/max NULL.
  */
private[sources] class MetricGenAggScan(lo: Long, hi: Long, servers: Long,
    kinds: Seq[String]) extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = StructType(kinds.map {
    case "count" => StructField("count", LongType, nullable = false)
    case "min_ts" => StructField("min_ts", TimestampType, nullable = true)
    case "max_ts" => StructField("max_ts", TimestampType, nullable = true)
  })

  // without this, pushing the aggregate would REPLACE a 1-row-estimated
  // Aggregate node with a scan whose size falls back to
  // defaultSizeInBytes (Long.MaxValue) — flipping broadcast joins over
  // the aggregated side to sort-merge/cartesian and making the
  // "optimization" a regression (review finding; the whole point of
  // the closed form is that the result IS one tiny row)
  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): OptionalLong = OptionalLong.of(1L)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(8L * math.max(1, kinds.size))
  }

  override def description(): String =
    s"metricgen[agg-pushed ${kinds.mkString(",")}, ids $lo..$hi]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(MetricGenPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new MetricGenAggReaderFactory(servers, kinds.toArray)
}

private[sources] class MetricGenAggReaderFactory(servers: Long,
    kinds: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[MetricGenPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        val n = math.max(0L, part.end - part.start)
        new GenericInternalRow(kinds.map {
          case "count" => n: Any
          case "min_ts" =>
            if (n == 0) null else MetricGen.tsUs(part.start, servers): Any
          case "max_ts" =>
            if (n == 0) null else MetricGen.tsUs(part.end - 1, servers): Any
        })
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] case class MetricGenPartition(start: Long, end: Long)
  extends InputPartition

private[sources] class MetricGenScan(lo: Long, hi: Long, servers: Long,
    slices: Int, required: StructType, rowsPerBatch: Long)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  // runtime filters (DPP-style, delivered after the other join side
  // materializes) tighten these; compile-time pushdown fixed lo/hi
  private var curLo = lo
  private var curHi = hi

  override def readSchema(): StructType = required

  override def description(): String =
    s"metricgen[ids $lo..$hi, ${required.fieldNames.mkString(",")}]"

  override def toBatch: Batch = this

  /** RUNTIME filter pushdown (`SupportsRuntimeFiltering`): when this
    * scan sits under a join whose other side carries a selective
    * filter, Spark materializes that side first and hands the join
    * keys here as an `In("ts", …)` before partitions are planned —
    * dynamic partition pruning, connector-side. The IN-set is clamped
    * to its [min, max] id range (a superset — the join re-applies
    * exact semantics), so a dimension slice selecting one hour prunes
    * the generated fact to that hour at RUNTIME, with zero static
    * predicate on the fact side. Unsupported filter shapes are
    * ignored (best-effort by contract).
    */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("ts"))

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach { f =>
      MetricGen.tightenBounds(f, curLo, curHi, servers).foreach {
        case (l, h) => curLo = l; curHi = h
      }
    }

  /** Streaming facet: the same generated relation delivered as
    * micro-batches of `rowsPerBatch` ids. Offsets ARE row ids in the
    * `[lo, hi)` range, so the `startSec`/`endSec` options prune
    * streamed generation at the source — excluded ids are never
    * offered as offsets. (Predicate pushdown does NOT reach streaming
    * V2 scans — Spark only pushes into batch scans, a filter on a
    * readStream runs above the source; option-driven bounds are the
    * streaming-pruning contract, exactly like Kafka's
    * startingOffsets/endingOffsets. MetricGenSpec measures both
    * sides.) The stream is finite: once the offset reaches `hi`,
    * `latestOffset` stops advancing and the query quiesces — the
    * replay-a-corpus-then-stop ingest shape, vs the rate source's
    * unbounded clock. Admission control caps each batch at
    * `rowsPerBatch` (a passed maxRows ReadLimit tightens it further).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MetricGenMicroBatchStream(lo, hi, servers, slices,
      required.fieldNames.map(MetricGen.schema.fieldIndex), rowsPerBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    val n = curHi - curLo
    if (n <= 0) return Array.empty
    val width = math.max(1L, MetricGen.ceilDiv(n, slices.toLong))
    (curLo until curHi by width)
      .map(s => MetricGenPartition(s, math.min(s + width, curHi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MetricGenReaderFactory(servers,
      required.fieldNames.map(MetricGen.schema.fieldIndex))

  override def estimateStatistics(): Statistics = new Statistics {
    // post-pruning numbers: a tight ts slice reports small, so the
    // optimizer can broadcast the generated side
    override def numRows(): OptionalLong =
      OptionalLong.of(math.max(0, curHi - curLo))
    // ts 8B + server_id ~9B + 8B per double
    private val rowBytes = required.fields.map(_.dataType match {
      case StringType => 9L
      case _ => 8L
    }).sum
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(0, curHi - curLo) * math.max(rowBytes, 1L))

    // per-column statistics are closed-form too: ts ndv = grid slots
    // in the clamped range with exact micros bounds (internal long
    // form), server_id ndv = the fleet size a contiguous id span
    // covers. CBO-grade inputs for join-selectivity estimates, exact
    // rather than sampled.
    override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val span = math.max(0, curHi - curLo)
      val m = new java.util.HashMap[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (span > 0 && required.fieldNames.contains("ts")) {
        val slots =
          Math.floorDiv(curHi - 1, servers) - Math.floorDiv(curLo, servers) + 1
        m.put(Expressions.column("ts"), new ColStats(slots,
          Some(MetricGen.tsUs(curLo, servers)),
          Some(MetricGen.tsUs(curHi - 1, servers))))
      }
      if (span > 0 && required.fieldNames.contains("server_id"))
        m.put(Expressions.column("server_id"),
          new ColStats(math.min(servers, span), None, None))
      m
    }
  }
}

/** Exact closed-form column stats (ndv + optional internal-form
  * min/max).
  */
private[sources] class ColStats(ndv: Long, lo: Option[Long], hi: Option[Long])
    extends org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
  override def distinctCount(): OptionalLong = OptionalLong.of(ndv)
  override def nullCount(): OptionalLong = OptionalLong.of(0L)
  override def min(): java.util.Optional[Object] =
    lo.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
      .getOrElse(java.util.Optional.empty[Object]())
  override def max(): java.util.Optional[Object] =
    hi.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
      .getOrElse(java.util.Optional.empty[Object]())
}

private[sources] case class GenOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

private[sources] class MetricGenMicroBatchStream(lo: Long, hi: Long,
    servers: Long, slices: Int, ords: Array[Int], rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GenOffset(lo)

  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)

  // non-admission-control fallback: everything that remains
  override def latestOffset(): Offset = GenOffset(hi)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].id
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(rowsPerBatch, m.maxRows)
      case _ => rowsPerBatch
    }
    GenOffset(math.min(hi, s + math.max(1L, cap)))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].id
    val e = end.asInstanceOf[GenOffset].id
    val n = e - s
    if (n <= 0) return Array.empty
    val width = math.max(1L, MetricGen.ceilDiv(n, slices.toLong))
    (s until e by width)
      .map(p => MetricGenPartition(p, math.min(p + width, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MetricGenReaderFactory(servers, ords)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class MetricGenReaderFactory(servers: Long, ords: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[MetricGenPartition]
    // server_id has only `servers` distinct values — intern them once
    // per task instead of allocating String+UTF8String per row (this
    // reader's whole point is to NOT be the benchmark bottleneck)
    val names: Array[UTF8String] =
      if (ords.contains(1))
        Array.tabulate(servers.toInt)(i => UTF8String.fromString(s"server_${i + 1}"))
      else null
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow = {
        val vals = new Array[Any](ords.length)
        var i = 0
        while (i < ords.length) {
          vals(i) =
            if (ords(i) == 1) names((id % servers).toInt)
            else MetricGen.fieldValue(ords(i), id, servers)
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
