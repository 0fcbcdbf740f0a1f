package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch source/sink surface (SURVEY.md §2.1):
  *
  *   - S6 CSV sink (`generate_historical_data.py:76-78`: header + rows,
  *     single file) and S7 CSV scan (`README.md:94-96`: schema'd load).
  *   - S5's at-rest layout as a *batch* writer: compressed,
  *     date/hour-partitioned parquet — the lake-compaction output format
  *     (the streaming twin lives in [[graft.streaming.StreamOps]]).
  *   - Fail-soft scanning (`realtime_inference.py:104-114` semantics):
  *     PERMISSIVE + corrupt-record column with a side-channel split —
  *     Firehose's `telemetry_errors/` prefix (`phase3-kinesis-s3.yaml:85`)
  *     as a DataFrame fork.
  *
  * Scale notes: the CSV single-file path (`coalesce(1)`) mirrors the
  * reference's one-file artifact and is for small exports only; the
  * partitioned-parquet path is the 100 TB layout (partition pruning on
  * date/hour, file sizes controlled by `maxRecordsPerFile`).
  */
object LakeIO {

  val histSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("machineId", StringType),
    StructField("temperature", DoubleType),
    StructField("vibration", DoubleType),
    StructField("is_anomaly", IntegerType)))

  /** S6 — write the historical-table shape as a headered CSV artifact. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssXXX")
      .csv(path)

  /** S7 — schema'd CSV scan; malformed rows dropped (fail-soft). */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(histSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssXXX")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** S5 (batch twin) — compressed, time-partitioned lake layout. */
  def writePartitionedLake(df: DataFrame, path: String,
    maxRecordsPerFile: Int = 1000000): Unit =
    df.withColumn("date", to_date(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("date", "hour")
      .parquet(path)

  def readLake(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Bucketed external table: hash-partitioned AND per-file sorted on the
    * join key at write time, so repeated joins/aggregations on that key
    * plan with ZERO shuffle exchanges (verified in LakeIOSpec) — the
    * co-located-join layout for fact tables that are joined on the same
    * key query after query. At 100 TB this is the difference between
    * re-shuffling terabytes per join and a purely map-side merge; the
    * bucket count would scale with data volume (here parameterized). */
  def writeBucketed(df: DataFrame, s: SparkSession, table: String,
    path: String, key: String, buckets: Int): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** P2 fail-soft JSON scan with error side channel: good records parsed
    * to `schema`, malformed lines preserved verbatim in the returned
    * `(good, bad)` pair — the `telemetry/` vs `telemetry_errors/` split. */
  def readJsonWithErrorChannel(s: SparkSession, path: String,
    schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val raw = s.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // one scan feeds both forks
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, bad)
  }

  /** Columnar ORC sink (zlib) — the second columnar format a lake speaks
    * natively besides parquet; same partition-friendly layout. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  /** ORC scan — schema read from file metadata, filters/pruning push down
    * exactly as for parquet (both formats share the v2 datasource scan). */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** JSON-lines sink (gzip) — the interchange format of the reference's
    * wire path, as a batch artifact. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)
}
