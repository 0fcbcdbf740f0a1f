package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DSv2 connector surface — the reference's core
  * sink is a buffered fault-tolerant S3 writer (gzip JSON batches with
  * at-least-once delivery dedup'd at the lake, `phase3-kinesis-s3.yaml:81-89`,
  * `docs/phase3-kinesis-s3.md:13,44`); this is that contract as a REAL
  * Spark `SupportsWrite` connector over the local filesystem (the
  * container's honest stand-in for S3 — same rename-based commit
  * protocol an object store's multipart-complete provides):
  *
  *   df.write.format("graft.sources.LakeSink").mode("append").save(dir)
  *   df.writeStream.format("graft.sources.LakeSink")
  *     .option("path", dir).option("checkpointLocation", ckpt).start()
  *
  * Commit protocol (the part a file sink hides and a connector must own):
  *
  *   - Each TASK writes gzip JSON-lines to `_staging/<name>.inprogress`,
  *     finalizes it to `_staging/<name>` on task commit (atomic rename),
  *     and deletes it on task abort — a failed/speculative attempt can
  *     never leak bytes into the destination.
  *   - The DRIVER's job commit moves every staged file into the
  *     destination; job abort deletes the staged files instead. Readers
  *     never see a partial job: `_staging` is underscore-hidden from
  *     Spark's file index.
  *   - STREAMING commits are exactly-once across restart: final names are
  *     deterministic per (epoch, partition) and an atomic commit-log
  *     marker `_graft_commits/<epoch>` records completion — a redelivered
  *     epoch (restart after a crash between sink commit and checkpoint
  *     write) sees its marker and discards the re-staged files; a crash
  *     MID-commit re-moves under the same names (REPLACE_EXISTING), so
  *     the retry converges file-by-file instead of duplicating.
  *
  * 100 TB story: every byte moves task→staging→destination on the
  * executor/driver that owns it — the driver handles only O(#tasks)
  * rename messages per commit, state per writer is one open stream, and
  * the deterministic (epoch, partition) naming is what makes retried
  * epochs idempotent at any fan-out. Read back via
  * [[LakeIO.readJsonWithErrorChannel]] or `spark.read.json`.
  */
class LakeSink extends TableProvider {
  // the write schema arrives from the query plan, not from files on disk
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft.sources.LakeSink is a write-only sink; read the lake back with spark.read.json")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LakeSinkTable(schema, properties.get("path"))
}

object LakeSink {
  /** Micros-precision ISO-8601 UTC — the lake's wire timestamp format;
    * readers pass the same pattern as `timestampFormat`. */
  val TimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private[sources] val TsFormatter =
    java.time.format.DateTimeFormatter
      .ofPattern(TimestampFormat)
      .withZone(java.time.ZoneOffset.UTC)

  private[sources] def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  /** One field serializer per column, resolved once per writer, not per
    * row. Unsupported types fail at PLANNING (factory construction), not
    * mid-write. */
  private[sources] def serializers(schema: StructType): Array[(InternalRow, Int) => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val ser: (InternalRow, Int) => String = f.dataType match {
        case LongType      => (r, j) => r.getLong(j).toString
        case IntegerType   => (r, j) => r.getInt(j).toString
        case DoubleType    => (r, j) => r.getDouble(j).toString
        case FloatType     => (r, j) => r.getFloat(j).toString
        case BooleanType   => (r, j) => r.getBoolean(j).toString
        case StringType    => (r, j) => "\"" + jsonEscape(r.getUTF8String(j).toString) + "\""
        case TimestampType => (r, j) =>
          "\"" + TsFormatter.format(java.time.Instant.EPOCH.plusNanos(r.getLong(j) * 1000L)) + "\""
        case other => throw new UnsupportedOperationException(
          s"LakeSink: unsupported column type $other for field ${f.name}")
      }
      val _ = i
      ser
    }
}

private[sources] class LakeSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "LakeSink requires a 'path' option")
  override def name(): String = s"graft_lake_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeSinkWriteBuilder(info.schema(), path)
}

private[sources] class LakeSinkWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new LakeSinkWrite(schema, path, truncateFirst)
}

private[sources] class LakeSinkWrite(schema: StructType, path: String,
    truncateFirst: Boolean) extends Write {
  // validate the schema at planning so an unsupported type fails the job
  // before any task runs
  LakeSink.serializers(schema)
  override def description(): String = s"graft-lake-sink path=$path"
  override def toBatch: BatchWrite =
    new LakeSinkBatchWrite(schema, path, truncateFirst,
      java.util.UUID.randomUUID.toString.take(8))
  override def toStreaming: StreamingWrite = new LakeSinkStreamingWrite(schema, path)
}

private[graft] object LakeSinkFiles {
  def stagingDir(path: String): Path = Paths.get(path, "_staging")
  def commitsDir(path: String): Path = Paths.get(path, "_graft_commits")

  def ensureDirs(path: String): Unit = {
    Files.createDirectories(stagingDir(path))
    Files.createDirectories(commitsDir(path))
  }

  /** Move staged → destination under the staged file's FINAL name.
    * REPLACE_EXISTING makes a retried commit converge instead of failing
    * or duplicating. */
  def promote(path: String, staged: Seq[String]): Unit =
    staged.foreach { name =>
      Files.move(stagingDir(path).resolve(name), Paths.get(path, name),
        StandardCopyOption.REPLACE_EXISTING)
    }

  def discard(path: String, staged: Seq[String]): Unit =
    staged.foreach(name => Files.deleteIfExists(stagingDir(path).resolve(name)))

  /** Sweep staging of every artifact carrying this write's tag — job
    * abort may not receive a message for every attempted task. */
  def sweep(path: String, tag: String): Unit = {
    val dir = stagingDir(path)
    if (Files.isDirectory(dir)) {
      val it = Files.list(dir).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.contains(tag)) Files.deleteIfExists(p)
      }
    }
  }
}

private[graft] case class LakeSinkCommit(stagedName: String)
    extends WriterCommitMessage
private[sources] case object LakeSinkNoData extends WriterCommitMessage

private[graft] class LakeSinkBatchWrite(schema: StructType, path: String,
    truncateFirst: Boolean, writeId: String) extends BatchWrite {
  LakeSinkFiles.ensureDirs(path)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LakeSinkWriterFactory(schema, path, s"b$writeId")
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncateFirst) {
      val it = Files.list(Paths.get(path)).iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".json.gz")) Files.deleteIfExists(p)
      }
    }
    LakeSinkFiles.promote(path,
      messages.collect { case LakeSinkCommit(n) => n }.toSeq)
    Files.write(Paths.get(path, "_SUCCESS"), Array.empty[Byte])
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    LakeSinkFiles.discard(path,
      messages.collect { case LakeSinkCommit(n) => n }.toSeq)
    LakeSinkFiles.sweep(path, s"b$writeId")
  }
}

private[graft] class LakeSinkStreamingWrite(schema: StructType, path: String)
    extends StreamingWrite {
  LakeSinkFiles.ensureDirs(path)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new LakeSinkStreamingWriterFactory(schema, path)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = LakeSinkFiles.commitsDir(path).resolve(epochId.toString)
    val staged = messages.collect { case LakeSinkCommit(n) => n }.toSeq
    if (Files.exists(marker)) {
      // redelivered epoch (restart between sink commit and checkpoint
      // write): the lake already holds these rows — discard the re-run
      LakeSinkFiles.discard(path, staged)
    } else {
      LakeSinkFiles.promote(path, staged)
      // marker via temp + atomic move: a crash can't leave a marker for
      // an epoch whose files never promoted
      val tmp = LakeSinkFiles.commitsDir(path).resolve(s".${epochId}.tmp")
      Files.write(tmp, staged.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    LakeSinkFiles.discard(path,
      messages.collect { case LakeSinkCommit(n) => n }.toSeq)
    LakeSinkFiles.sweep(path, s"e$epochId-")
  }
}

private[sources] class LakeSinkWriterFactory(schema: StructType, path: String,
    tag: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LakeSinkDataWriter(schema, path,
      finalName = s"part-$tag-$partitionId.json.gz",
      attemptTag = s"$tag-$partitionId-a$taskId")
}

private[graft] class LakeSinkStreamingWriterFactory(schema: StructType,
    path: String) extends StreamingDataWriterFactory {
  // deterministic per (epoch, partition): re-execution of a crashed epoch
  // re-creates the SAME final names, so a mid-commit retry replaces
  // instead of duplicating
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LakeSinkDataWriter(schema, path,
      finalName = s"part-e$epochId-$partitionId.json.gz",
      attemptTag = s"e$epochId-$partitionId-a$taskId")
}

/** Task-side writer: gzip JSON-lines into `_staging/<attempt>.inprogress`,
  * finalized to `_staging/<finalName>` on task commit, deleted on abort.
  * The attempt-unique in-progress name keeps speculative duplicates of
  * the same partition from clobbering each other; the commit coordinator
  * guarantees only one of them reaches commit(). */
private[sources] class LakeSinkDataWriter(schema: StructType, path: String,
    finalName: String, attemptTag: String) extends DataWriter[InternalRow] {
  private val fieldNames = schema.fieldNames.map(LakeSink.jsonEscape)
  private val sers = LakeSink.serializers(schema)
  private val inProgress =
    LakeSinkFiles.stagingDir(path).resolve(s"$finalName.$attemptTag.inprogress")
  private var out: OutputStreamWriter = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      Files.createDirectories(LakeSinkFiles.stagingDir(path))
      out = new OutputStreamWriter(new GZIPOutputStream(new BufferedOutputStream(
        new FileOutputStream(inProgress.toFile))), StandardCharsets.UTF_8)
    }
    val b = new StringBuilder(64)
    b.append('{')
    var i = 0
    while (i < sers.length) {
      if (i > 0) b.append(',')
      b.append('"').append(fieldNames(i)).append("\":")
      if (row.isNullAt(i)) b.append("null") else b.append(sers(i)(row, i))
      i += 1
    }
    b.append("}\n")
    out.write(b.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage =
    if (out == null) LakeSinkNoData
    else {
      out.close(); out = null
      // atomic rename: the staged name appears complete or not at all
      Files.move(inProgress, LakeSinkFiles.stagingDir(path).resolve(finalName),
        StandardCopyOption.REPLACE_EXISTING)
      LakeSinkCommit(finalName)
    }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    Files.deleteIfExists(inProgress)
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null; Files.deleteIfExists(inProgress) }
}
