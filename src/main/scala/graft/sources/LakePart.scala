package graft.sources

import org.apache.spark.sql.connector.catalog.functions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Partition-field SPEC for lake tables — identity (`col`) or a hidden
  * `bucket(N,col)` transform (the Iceberg hidden-partitioning move): a
  * bucketed write hashes the SOURCE column into N directory buckets
  * (`col_bucket=<id>/`), the source column stays IN the data rows (the
  * bucket id is lossy), and a bucketed scan reports
  * `KeyGroupedPartitioning(bucket(N, col))` — so two lake tables bucketed
  * the same way JOIN ON THE SOURCE COLUMN with zero shuffle exchanges
  * (storage-partitioned joins over a high-cardinality key, the thing SPJ
  * exists for at 100 TB; identity dirs can't serve it without one dir per
  * key value).
  *
  * Everything downstream keys off the SPEC STRING (`bucket(8,id)`), which
  * deliberately never equals a column name — so the ~20 `partCols
  * .contains(col)` sites in the write/read paths automatically treat a
  * bucketed source column as a DATA column (serialized in rows, prunable
  * stats, no dir-value restore), which is exactly right. Only the sites
  * that name directories, compute bucket ids, or report partitioning
  * parse the spec.
  */
private[graft] final case class LakePart(spec: String, name: String,
    buckets: Option[Int]) {
  def isIdentity: Boolean = buckets.isEmpty
  /** The Hive directory KEY this field writes (`col` or `col_bucket`). */
  def dirKey: String = buckets.fold(name)(_ => s"${name}_bucket")
}

private[graft] object LakePart {

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
    } else LakePart(t, t, None)
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
