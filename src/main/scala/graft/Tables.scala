package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only testdata tables (TESTDATA.md).
  *
  * All operators take `(SparkSession, sfDir)` and pull their inputs through
  * here so the scan layer stays in one place: plain parquet scans that
  * Catalyst can push filters/projections into. At cluster scale these would
  * be partitioned/bucketed external tables; in this harness each table is a
  * single parquet file, so scan parallelism comes from parquet row groups +
  * `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts has shipped in two physical parquet types across driver
    * rounds: TIMESTAMP(NANOS) (r1–r4), which Spark cannot read as a
    * timestamp ([PARQUET_TYPE_ILLEGAL]) and is read nanos-as-long then
    * truncated to micros, and plain TIMESTAMP(MICROS, NTZ) (r5+), read
    * natively. Both paths normalize to session-TZ TimestampType with
    * identical micro values — exactly what DuckDB's reader sees (its
    * `describe` reports TIMESTAMP, i.e. µs) — so downstream operators and
    * the driver hash are schema-agnostic. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      // TIMESTAMP_NTZ: reinterpret as session-local (UTC) — same micros
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
