package graft.sources

import org.apache.spark.sql.connector.catalog.functions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Partition-field SPEC for lake tables — identity (`col`), a hidden
  * `bucket(N,col)` transform, or a hidden TEMPORAL transform
  * (`days(ts)`/`hours(ts)`/`months(ts)`/`years(ts)` — the Iceberg
  * hidden-partitioning move): the write derives the directory value FROM
  * the source column (bucket hash / UTC calendar truncation), the source
  * column stays IN the data rows, and the scan both prunes directories
  * from ordinary predicates ON THE SOURCE COLUMN (a `ts BETWEEN` filter
  * opens only the matching day dirs — no materialized date column, the
  * Iceberg contract) and reports `KeyGroupedPartitioning(days(ts))` for
  * zero-exchange storage-partitioned joins. Time-series telemetry at
  * 100 TB partitions by day exactly this way (the reference's own sink
  * writes time-bucketed `telemetry/!{timestamp:yyyy/MM/dd}` prefixes,
  * `phase3-kinesis-s3.yaml:84-85`).
  *
  * Everything downstream keys off the SPEC STRING (`bucket(8,id)`,
  * `days(ts)`), which deliberately never equals a column name — so the
  * ~20 `partCols.contains(col)` sites in the write/read paths
  * automatically treat a transformed source column as a DATA column
  * (serialized in rows, prunable stats, no dir-value restore), which is
  * exactly right. Only the sites that name directories, compute derived
  * values, or report partitioning parse the spec.
  *
  * Temporal semantics are UTC on the internal epoch-micros value (the
  * Iceberg convention): day = floorDiv(micros, 86_400e6), hour =
  * floorDiv(micros, 3_600e6), month/year via the proleptic calendar on
  * the UTC day. Directory values are human-readable (`ts_day=2026-02-01`,
  * `ts_hour=2026-02-01-14`, `ts_month=2026-02`, `ts_year=2026`).
  */
private[graft] final case class LakePart(spec: String, name: String,
    buckets: Option[Int], temporal: Option[String] = None) {
  def isIdentity: Boolean = buckets.isEmpty && temporal.isEmpty
  /** The Hive directory KEY this field writes (`col`, `col_bucket`, or
    * `col_day`/`col_hour`/`col_month`/`col_year`). */
  def dirKey: String =
    if (buckets.isDefined) s"${name}_bucket"
    else temporal.fold(name)(k => s"${name}_${k.dropRight(1)}")
}

private[graft] object LakePart {

  /** Supported temporal transform kinds, in spec-name form. */
  val TemporalKinds: Seq[String] = Seq("days", "hours", "months", "years")

  def parse(spec: String): LakePart = {
    val t = spec.trim
    if (t.startsWith("bucket(") && t.endsWith(")")) {
      val body = t.substring("bucket(".length, t.length - 1)
      val i = body.indexOf(',')
      require(i > 0, s"LakeSink: malformed bucket spec '$spec'")
      val n = body.substring(0, i).trim.toInt
      require(n > 0, s"LakeSink: bucket count must be positive in '$spec'")
      LakePart(s"bucket($n,${body.substring(i + 1).trim})",
        body.substring(i + 1).trim, Some(n))
    } else TemporalKinds.find(k => t.startsWith(k + "(") && t.endsWith(")")) match {
      case Some(k) =>
        val c = t.substring(k.length + 1, t.length - 1).trim
        require(c.nonEmpty && !c.contains(','),
          s"LakeSink: malformed temporal spec '$spec'")
        LakePart(s"$k($c)", c, None, Some(k))
      case None => LakePart(t, t, None)
    }
  }

  def parseAll(partCols: Seq[String]): Seq[LakePart] = partCols.map(parse)

  /** Split a comma-joined partition spec list — commas INSIDE parens
    * (`bucket(8,id)`) are part of one spec, not separators. The manifest
    * and version records store partition columns as one comma-joined
    * string; a naive split would shear bucket specs in half. */
  def split(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '('               => depth += 1
        case ')'               => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _                 => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  // --- the bucket hash ---------------------------------------------------------
  //
  // One deterministic function, computed in two places that MUST agree:
  // the writer's partition extractor (directory naming) and
  // [[GraftBucketFunction]] (the V2 FunctionCatalog function Spark
  // resolves to reason about SPJ compatibility). 64-bit avalanche
  // (the splitmix64/murmur3 finalizer) then floorMod — a plain modulo
  // would co-locate arithmetic progressions, defeating the balance
  // bucketing exists for.

  def scramble(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def bucketOfLong(n: Int, v: Long): Int =
    Math.floorMod(scramble(v), n.toLong).toInt

  /** UTF8String.hashCode is Murmur3 over the raw bytes — deterministic
    * across JVMs/platforms, so directory names are stable. */
  def bucketOfString(n: Int, v: UTF8String): Int =
    bucketOfLong(n, v.hashCode.toLong)

  // --- the temporal transforms -------------------------------------------------
  //
  // Like the bucket hash: ONE deterministic function computed in the
  // places that MUST agree — the writer's partition extractor (directory
  // naming), the scan's SPJ group keys (parsed back from directory
  // names), and [[GraftTemporalFunction]] (the V2 FunctionCatalog
  // function the engine resolves to reason about days(ts) compatibility
  // for storage-partitioned joins). All UTC on epoch micros.

  val MicrosPerDay: Long = 86400000000L
  val MicrosPerHour: Long = 3600000000L

  private def utcDate(micros: Long): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, MicrosPerDay))

  /** The transform's INTEGER key — what the V2 function returns and what
    * SPJ partition keys carry (epoch days / epoch hours / months since
    * 1970-01 / years since 1970). */
  def temporalKey(kind: String, micros: Long): Int = kind match {
    case "days"   => Math.floorDiv(micros, MicrosPerDay).toInt
    case "hours"  => Math.floorDiv(micros, MicrosPerHour).toInt
    case "months" =>
      val d = utcDate(micros); (d.getYear - 1970) * 12 + d.getMonthValue - 1
    case "years"  => utcDate(micros).getYear - 1970
    case other    => throw new IllegalStateException(s"unknown temporal kind $other")
  }

  /** The human-readable directory VALUE (`2026-02-01`, `2026-02-01-14`,
    * `2026-02`, `2026`) — path-safe by construction. */
  def temporalDirValue(kind: String, micros: Long): String = kind match {
    case "days"   => utcDate(micros).toString
    case "hours"  =>
      f"${utcDate(micros)}-${Math.floorMod(Math.floorDiv(micros, MicrosPerHour), 24L)}%02d"
    case "months" =>
      val d = utcDate(micros); f"${d.getYear}%04d-${d.getMonthValue}%02d"
    case "years"  => f"${utcDate(micros).getYear}%04d"
    case other    => throw new IllegalStateException(s"unknown temporal kind $other")
  }

  /** Directory value → the transform's integer key (the SPJ group key a
    * scan reports — MUST equal `temporalKey` of every row in the dir). */
  def temporalKeyOfDir(kind: String, v: String): Int = kind match {
    case "days"   => java.time.LocalDate.parse(v).toEpochDay.toInt
    case "hours"  =>
      java.time.LocalDate.parse(v.substring(0, 10)).toEpochDay.toInt * 24 +
        v.substring(11).toInt
    case "months" => (v.substring(0, 4).toInt - 1970) * 12 + v.substring(5).toInt - 1
    case "years"  => v.toInt - 1970
    case other    => throw new IllegalStateException(s"unknown temporal kind $other")
  }

  /** Directory value → the INCLUSIVE [lo, hi] epoch-micros interval its
    * rows provably lie in — the planning-time pruning currency: the
    * interval feeds [[LakeSinkStats.mayMatch]] as a synthetic per-file
    * stat, so `ts >= X AND ts < Y` predicates prune day dirs with the
    * same (sound) interval algebra as the stats ledger. */
  def temporalDirInterval(kind: String, v: String): (Long, Long) = kind match {
    case "days" =>
      val d = java.time.LocalDate.parse(v).toEpochDay
      (d * MicrosPerDay, (d + 1) * MicrosPerDay - 1)
    case "hours" =>
      val h = temporalKeyOfDir("hours", v).toLong
      (h * MicrosPerHour, (h + 1) * MicrosPerHour - 1)
    case "months" =>
      val ym = java.time.YearMonth.of(v.substring(0, 4).toInt, v.substring(5).toInt)
      (ym.atDay(1).toEpochDay * MicrosPerDay,
        ym.plusMonths(1).atDay(1).toEpochDay * MicrosPerDay - 1)
    case "years" =>
      val y = v.toInt
      (java.time.LocalDate.of(y, 1, 1).toEpochDay * MicrosPerDay,
        java.time.LocalDate.of(y + 1, 1, 1).toEpochDay * MicrosPerDay - 1)
    case other => throw new IllegalStateException(s"unknown temporal kind $other")
  }
}

/** `bucket(numBuckets, col) → int` — the V2 FunctionCatalog function
  * behind the lake's bucket partition transform. Spark resolves it (via
  * the table's catalog, empty-namespace identifier) to turn a scan's
  * reported `KeyGroupedPartitioning(bucket(N, col))` into a
  * TransformExpression it can compare across the two sides of a join —
  * same canonical function + same N ⇒ storage-partitioned join, zero
  * shuffles. Bit-identical to the writer's directory hash by
  * construction (shared [[LakePart]] arithmetic). */
private[sources] object GraftBucketFunction extends functions.UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) -> int: lake partition-transform hash (int/long/string)"
  override def bind(inputType: StructType): functions.BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (INT numBuckets, value), got ${inputType.toDDL}")
    inputType.fields(1).dataType match {
      case LongType | IntegerType | StringType =>
        new GraftBucketBound(inputType.fields(1).dataType)
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported value type $other (int/long/string)")
    }
  }
}

private[sources] class GraftBucketBound(dt: DataType)
    extends functions.ScalarFunction[java.lang.Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    dt match {
      case LongType    => LakePart.bucketOfLong(n, input.getLong(1))
      case IntegerType => LakePart.bucketOfLong(n, input.getInt(1).toLong)
      case StringType  => LakePart.bucketOfString(n, input.getUTF8String(1))
      case other => throw new IllegalStateException(s"unbucketable $other")
    }
  }
}

/** `days(ts)`/`hours(ts)`/`months(ts)`/`years(ts) → int` — the V2
  * FunctionCatalog functions behind the lake's temporal partition
  * transforms (resolved like [[GraftBucketFunction]], under the table
  * catalog's empty namespace) so the engine can compare two scans'
  * `KeyGroupedPartitioning(days(ts))` for storage-partitioned joins.
  * Bit-identical to the writer's directory arithmetic by construction
  * (shared [[LakePart.temporalKey]]). */
private[sources] class GraftTemporalFunction(kind: String)
    extends functions.UnboundFunction {
  override def name(): String = kind
  override def description(): String =
    s"$kind(ts) -> int: lake temporal partition transform (UTC)"
  override def bind(inputType: StructType): functions.BoundFunction = {
    require(inputType.fields.length == 1, s"$kind expects one argument")
    inputType.fields(0).dataType match {
      case TimestampType => new GraftTemporalBound(kind, TimestampType)
      case DateType if kind != "hours" => new GraftTemporalBound(kind, DateType)
      case other => throw new UnsupportedOperationException(
        s"$kind: unsupported source type $other (timestamp" +
          (if (kind != "hours") "/date)" else ")"))
    }
  }
}

private[sources] class GraftTemporalBound(kind: String, dt: DataType)
    extends functions.ScalarFunction[java.lang.Integer] {
  override def name(): String = kind
  override def canonicalName(): String = s"graft.$kind"
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Integer =
    dt match {
      case TimestampType => LakePart.temporalKey(kind, input.getLong(0))
      case DateType =>
        LakePart.temporalKey(kind, input.getInt(0).toLong * LakePart.MicrosPerDay)
      case other => throw new IllegalStateException(s"untruncatable $other")
    }
}
