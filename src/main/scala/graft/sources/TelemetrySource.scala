package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import java.util.OptionalLong

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 connector for the deterministic telemetry generator —
  * the reference's S1 simulator (`IoTSimulator.java:153-184`,
  * `generate_historical_data.py:33-78`) as a REAL Spark source:
  *
  *   spark.read.format("graft.sources.TelemetrySource")
  *     .option("rows", 10000).option("partitions", 8).load()
  *
  * Every row is a pure function of its id (the same LCG / Irwin–Hall /
  * exact-count-anomaly algebra as [[graft.operators.Telemetry.twin]],
  * via the [[graft.operators.Num.rD]] Scala twin of the rounding
  * policy), so the scan is embarrassingly parallel — `partitions`
  * contiguous id ranges, no driver-side data, no shuffle — and the
  * output is BIT-EQUAL to the oracle-checked Column-expression twin
  * (spec-pinned), which is itself t04-hash-checked against DuckDB.
  * That chain makes this connector's output transitively oracle-checked.
  *
  * 100 TB story: a generated source scales by splitting the id range —
  * exactly how this plans its [[InputPartition]]s; state per reader is
  * one cursor. Id-range predicates PUSH DOWN into the partition
  * planner (the partitions for a filtered range are never generated at
  * all — DSv2's partition-pruning contract on a generated source) and
  * column pruning narrows the produced rows to the required fields;
  * both are spec-pinned on correctness — accepted filters are reported
  * fully handled, so Spark does NOT re-filter and any range-math error
  * would surface as wrong results, not hidden work.
  */
class TelemetrySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("daily", false)) TelemetrySource.SchemaDaily
    else TelemetrySource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TelemetryTable(
      properties.getOrDefault("rows",
        graft.operators.Telemetry.TwinRows.toString).toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("rowsPerBatch", "1000").toLong,
      properties.getOrDefault("daily", "false").toBoolean)
}

object TelemetrySource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("machine_id", StringType, nullable = false),
    StructField("is_anomaly", IntegerType, nullable = false),
    StructField("temperature", DoubleType, nullable = false),
    StructField("vibration", DoubleType, nullable = false)))

  /** `daily` mode adds the partition column: `day` = the UTC date of
    * `ts`, constant within each day-aligned input partition (the id
    * stream is 60 s per id, so one day = 1440 contiguous ids). */
  val SchemaDaily: StructType =
    StructType(Schema.fields :+ StructField("day", DateType, nullable = false))

  private[sources] val IdsPerDay = 86400L / 60L

  /** Days-since-epoch of an id's timestamp (DateType's internal value). */
  private[sources] def epochDay(id: Long): Int =
    Math.floorDiv(graft.operators.Telemetry.TwinEpoch + id * 60L, 86400L).toInt

  /** Scala twins of the generator's Column algebra — identical integer
    * LCG, identical left-to-right Irwin–Hall summation, identical
    * rounding ([[graft.operators.Num.rD]]). */
  private[sources] def u(id: Long, k: Int): Double =
    (((id + k.toLong * 10007L) * 1103515245L + 12345L) % 2147483648L).toDouble /
      2147483648.0

  private[sources] def z(id: Long, base: Int): Double = {
    var s = u(id, base)
    var j = 1
    while (j < 12) { s = s + u(id, base + j); j += 1 }
    s - 6.0
  }

  private[sources] def isAnomaly(id: Long): Boolean = (id * 48271L) % 100L < 5L

  private[sources] def temperature(id: Long): Double =
    graft.operators.Num.rD(
      if (isAnomaly(id)) 80.0 + 20.0 * u(id, 100)
      else 68.0 + 3.0 * z(id, 0), 6)

  private[sources] def vibration(id: Long): Double =
    graft.operators.Num.rD(
      if (isAnomaly(id)) 3.0 + 2.0 * u(id, 101)
      else math.max(1.8 + 0.3 * z(id, 12), 0.0), 6)
}

private[sources] class TelemetryTable(rows: Long, parts: Int, perBatch: Long,
    daily: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_telemetry($rows)"
  override def schema(): StructType =
    if (daily) TelemetrySource.SchemaDaily else TelemetrySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TelemetryScanBuilder(rows, parts, perBatch, daily)
}

/** Pushdown surface: id-range filters narrow [lo, hi) exactly (and are
  * reported handled — no residual re-filter), `pruneColumns` narrows the
  * produced schema, and ungrouped COUNT/MIN(id)/MAX(id) aggregations
  * push COMPLETELY into the source — a generated range answers them in
  * O(1) from its bounds without producing a single row (the DSv2
  * aggregate-pushdown contract; at 100 TB this is the difference between
  * a metadata lookup and a full scan for `SELECT count(*)`).
  *
  * LIMIT and `ORDER BY id LIMIT n` (TopN) also push COMPLETELY: a
  * deterministic id-range truncates to its first (ASC) or last (DESC)
  * n ids exactly, so `isPartiallyPushed = false` and Spark drops its own
  * Limit/TakeOrdered — `LIMIT 10` over a 100 TB generated range plans a
  * 10-row single-partition scan. A pushed TopN additionally forces ONE
  * input partition emitting ids in sort order (the complete-pushdown
  * contract requires globally ordered output). Anything else stays
  * residual for Spark. */
private[sources] class TelemetryScanBuilder(rows: Long, parts: Int, perBatch: Long,
    daily: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType =
    if (daily) TelemetrySource.SchemaDaily else TelemetrySource.Schema
  private var pushedAggs: Option[Seq[AggregateFunc]] = None
  private var descendingTopN = false
  private var topNPushed = false

  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case f: NamedReference => f.fieldNames.sameElements(Array("id"))
      case _                 => false
    }

  // count(id) ≡ count(*): id is never null in a generated range
  private def pushable(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case c: Count     => !c.isDistinct && isId(c.column)
      case m: Min       => isId(m.column)
      case m: Max       => isId(m.column)
      case _            => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean = pushable(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    if (!pushable(agg)) false
    else { pushedAggs = Some(agg.aggregateExpressions.toSeq); true }

  private def lv(v: Any): Long = v.asInstanceOf[Number].longValue

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("id", _) | GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
           LessThan("id", _) | LessThanOrEqual("id", _) | IsNotNull("id") => true
      case _ => false
    }
    ok.foreach {
      case EqualTo("id", v)            => lo = math.max(lo, lv(v)); hi = math.min(hi, lv(v) + 1)
      case GreaterThan("id", v)        => lo = math.max(lo, lv(v) + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, lv(v))
      case LessThan("id", v)           => hi = math.min(hi, lv(v))
      case LessThanOrEqual("id", v)    => hi = math.min(hi, lv(v) + 1)
      case _                           => () // IsNotNull: id is never null
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(s: StructType): Unit = required = s

  // LIMIT n over a deterministic range = keep the first n ids — exact,
  // so the engine's own Limit node is dropped (isPartiallyPushed=false);
  // the override itself lives below with the limitPushed flag
  override def isPartiallyPushed(): Boolean = false

  /** ORDER BY id [ASC|DESC] LIMIT n: truncate to the first (ASC) or last
    * (DESC) n ids of the post-filter range. NULL ordering is irrelevant —
    * id is never null in a generated range. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean =
    if (orders.length != 1 || !isId(orders(0).expression)) false
    else {
      if (orders(0).direction == SortDirection.DESCENDING) {
        lo = math.max(lo, math.max(lo, hi) - n.toLong)
        descendingTopN = true
      } else hi = math.min(hi, saturatingAdd(lo, n.toLong))
      topNPushed = true
      true
    }

  private def saturatingAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (s < a) Long.MaxValue else s
  }

  override def pushLimit(n: Int): Boolean = {
    hi = math.min(hi, saturatingAdd(lo, n.toLong))
    limitPushed = true
    true
  }
  private var limitPushed = false

  override def build(): Scan = pushedAggs match {
    case Some(fns) => new TelemetryAggScan(lo, math.max(lo, hi), fns)
    // a pushed TopN needs the single sorted partition, which cannot be
    // day-keyed — fall back to the plain scan there
    case None if daily && !topNPushed =>
      new TelemetryDailyScan(lo, math.max(lo, hi), perBatch, required)
    case None => new TelemetryScan(lo, math.max(lo, hi),
      if (topNPushed) 1 else parts, perBatch, required,
      reverse = descendingTopN,
      // a runtime filter applied UNDER a pushed limit/TopN would change
      // which rows the truncation keeps — disable it there
      allowRuntime = !topNPushed && !limitPushed)
  }
}

/** The storage-partitioned-join scan: input partitions are DAY-aligned id
  * ranges, each carrying its `day` as a DSv2 partition key
  * ([[HasPartitionKey]]), and the scan reports
  * `KeyGroupedPartitioning(identity(day))` — so with
  * `spark.sql.sources.v2.bucketing.enabled` two telemetry scans join or
  * aggregate ON `day` with ZERO shuffle exchanges (Spark's
  * storage-partitioned join, the DSv2 answer to bucketed tables; at
  * 100 TB this is the difference between co-located daily rollups and
  * re-shuffling the fact table for every day-keyed operation). The
  * identity transform is used (not `days(ts)`) because identity resolves
  * against the scan output directly — no FunctionCatalog required. */
private[sources] class TelemetryDailyScan(lo: Long, hi: Long,
    perBatch: Long, required: StructType)
    extends TelemetryScan(lo, hi, 1, perBatch, required)
    with SupportsReportPartitioning {
  import TelemetrySource.{epochDay, IdsPerDay}

  private def dayStartId(day: Int): Long =
    day.toLong * IdsPerDay - graft.operators.Telemetry.TwinEpoch / 60L

  private lazy val days: Array[Int] =
    if (hi <= lo) Array.empty else (epochDay(lo) to epochDay(hi - 1)).toArray

  override def description(): String =
    s"graft-telemetry-daily range=[$lo,$hi) days=${days.length} cols=[${
      required.fieldNames.mkString(",")}]"
  // no runtime filtering in daily mode: the reported KeyGroupedPartitioning
  // must stay consistent with the planned day partitions
  override def filterAttributes(): Array[NamedReference] = Array.empty
  override def planInputPartitions(): Array[InputPartition] =
    days.map { d =>
      TelemetryDayRange(math.max(lo, dayStartId(d)),
        math.min(hi, dayStartId(d + 1)), d): InputPartition
    }
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("day")),
      days.length)
}

private[sources] case class TelemetryDayRange(start: Long, end: Long, day: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(day)
}

/** The completely-pushed-down aggregate scan: ONE row computed from the
  * [lo, hi) bounds — count = hi−lo, min = lo, max = hi−1 (NULL on an
  * empty range) — zero telemetry rows generated. */
private[sources] class TelemetryAggScan(lo: Long, hi: Long,
    fns: Seq[AggregateFunc]) extends Scan with Batch {
  private val aggSchema = StructType(fns.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_: Count, i)     => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"graft-telemetry-agg range=[$lo,$hi) PushedAggregates=[${
      fns.map(_.toString).mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(TelemetryRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      private val (l, h, fs) = (lo, hi, fns)
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = { val r = !done; done = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(fs.map {
            case _: CountStar | _: Count => h - l
            case _: Min                  => if (h > l) l else null
            case _: Max                  => if (h > l) h - 1 else null
            case other => throw new IllegalStateException(s"unpushable $other")
          })
          override def close(): Unit = ()
        }
    }
}

private[sources] class TelemetryScan(lo: Long, hi: Long, parts: Int,
    perBatch: Long, required: StructType, reverse: Boolean = false,
    allowRuntime: Boolean = true)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  // runtime-narrowed bounds (dynamic pruning): the engine may hand this
  // scan a join's build-side id set AFTER planning; narrowing to its
  // [min, max+1) envelope is a conservative SUPERSET, which is sound —
  // the join that sourced the filter still applies it exactly
  protected var rlo: Long = lo
  protected var rhi: Long = hi

  /** Advertise `id` as runtime-filterable (DPP for a generated source:
    * the filtered partitions are simply never generated). Disabled when
    * a limit/TopN was pushed — see the builder. */
  override def filterAttributes(): Array[NamedReference] =
    if (allowRuntime) Array(
      org.apache.spark.sql.connector.expressions.Expressions.column("id"))
    else Array.empty
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) if vs.nonEmpty =>
      val longs = vs.map(v => v.asInstanceOf[Number].longValue)
      rlo = math.max(rlo, longs.min)
      rhi = math.min(rhi, longs.max + 1)
    case EqualTo("id", v) =>
      val x = v.asInstanceOf[Number].longValue
      rlo = math.max(rlo, x)
      rhi = math.min(rhi, x + 1)
    case _ => () // unhandled runtime filters stay a superset — sound
  }

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-telemetry range=[$lo,$hi)${if (reverse) " desc" else ""} cols=[${
      required.fieldNames.mkString(",")}]"
  /** Exact post-pushdown statistics (a generated range KNOWS its
    * cardinality): lets Catalyst auto-broadcast a small filtered scan in
    * a join with no `broadcast()` hint — at 100 TB the filtered dim side
    * of a telemetry join picks BroadcastHashJoin from these numbers
    * instead of shuffling both sides. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, rhi - rlo)
    override def numRows(): OptionalLong = OptionalLong.of(n)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(n * math.max(1, required.defaultSize).toLong)
  }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TelemetryMicroBatch(hi, parts, perBatch, required)
  override def planInputPartitions(): Array[InputPartition] = {
    val (l, h) = (rlo, math.max(rlo, rhi))
    val n = math.max(1, parts)
    (0 until n).map { p =>
      TelemetryRange(l + (h - l) * p / n,
        l + (h - l) * (p + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryReaderFactory(required, reverse)
}

private[graft] case class TelemetryOffset(id: Long) extends Offset {
  override def json: String = id.toString
}

/** The streaming half (the reference's S1 is a live simulator,
  * `IoTSimulator.java:153-184`): offsets are positions in the
  * deterministic id stream, admission is STATELESS via
  * [[SupportsAdmissionControl]] — the engine hands `latestOffset` the
  * checkpoint-restored start, so a restarted query resumes at the exact
  * id it stopped at with no instance state to lose (a mutable cursor
  * here silently re-reads or skips after a restart — measured; the
  * spec's kill/restart loop yields each id exactly once). */
private[graft] class TelemetryMicroBatch(rows: Long, parts: Int,
    perBatch: Long, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = TelemetryOffset(0L)
  // Trigger.AvailableNow: the availability horizon is the static `rows`
  // cap, so prepare has nothing to snapshot; the engine then drains in
  // read-limit-sized batches until reportLatestOffset is reached (without
  // this interface Spark falls back to ONE unbounded batch)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = TelemetryOffset(rows)
  override def deserializeOffset(json: String): Offset =
    TelemetryOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perBatch)

  /** Rows this limit admits past `start` — honoring the ARGUMENT, not the
    * constructor default: `Trigger.AvailableNow` and composite
    * maxRows/maxBytes wrappers hand a limit that differs from
    * [[getDefaultReadLimit]], and ignoring it silently mis-batches. */
  private def admit(limit: ReadLimit): Long = limit match {
    case r: ReadMaxRows      => r.maxRows()
    case _: ReadAllAvailable => Long.MaxValue
    case c: CompositeReadLimit =>
      c.getReadLimits.map(admit).min // composite = most restrictive member
    case _                   => perBatch // min-rows / unknown: default batch
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = start.asInstanceOf[TelemetryOffset].id
    // saturating add: allAvailable admits Long.MaxValue rows, and
    // `s0 + MaxValue` overflows negative — an offset BEHIND the start
    // makes the engine wait forever (measured: Trigger.Once hangs)
    val a = math.max(0L, admit(limit))
    TelemetryOffset(if (a >= rows - s0) rows else s0 + a)
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: the engine calls latestOffset(start, limit)")
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s0, e0) = (start.asInstanceOf[TelemetryOffset].id,
      end.asInstanceOf[TelemetryOffset].id)
    val n = math.max(1, parts)
    (0 until n).map { p =>
      TelemetryRange(s0 + (e0 - s0) * p / n, s0 + (e0 - s0) * (p + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class TelemetryRange(start: Long, end: Long)
    extends InputPartition

private[sources] class TelemetryReaderFactory(required: StructType,
    reverse: Boolean = false) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (rs, re) = p match {
      case TelemetryRange(s0, e0)       => (s0, e0)
      case TelemetryDayRange(s0, e0, _) => (s0, e0)
    }
    val fields = required.fieldNames
    def row(id: Long): InternalRow = InternalRow.fromSeq(fields.map {
      case "id"          => id
      case "ts"          => (graft.operators.Telemetry.TwinEpoch + id * 60L) * 1000000L
      case "machine_id"  => UTF8String.fromString("NC_Machine_AC")
      case "is_anomaly"  => if (TelemetrySource.isAnomaly(id)) 1 else 0
      case "temperature" => TelemetrySource.temperature(id)
      case "vibration"   => TelemetrySource.vibration(id)
      case "day"         => TelemetrySource.epochDay(id)
    }.toSeq)
    if (reverse) new PartitionReader[InternalRow] {
      // pushed `ORDER BY id DESC LIMIT n`: emit ids high→low so the
      // single partition IS globally sorted (complete-TopN contract)
      private var id = re
      override def next(): Boolean = { id -= 1; id >= rs }
      override def get(): InternalRow = row(id)
      override def close(): Unit = ()
    }
    else new PartitionReader[InternalRow] {
      private var id = rs - 1
      override def next(): Boolean = { id += 1; id < re }
      override def get(): InternalRow = row(id)
      override def close(): Unit = ()
    }
  }
}
