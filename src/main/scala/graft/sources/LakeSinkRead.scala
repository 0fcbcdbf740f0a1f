package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The READ half of [[LakeSink]] — a DSv2 `Scan` over the connector's own
  * committed gzip JSON-lines lake, so the sink round-trips through the
  * connector in BOTH directions (write: stage→commit; read: list committed
  * files → parallel parse). This is the reference lake's read-back role
  * (`docs/phase3-kinesis-s3.md` — Athena/Glue over the S3 prefix), kept
  * inside the same connector.
  *
  * Scale shape: one InputPartition per committed file (each task streams
  * its own gzip member — the natural parallelism of an object-store lake);
  * `_staging`/`_graft_commits` are never listed, so in-flight writers are
  * invisible to readers; Hive `k=v/` partition directories are pruned at
  * PLANNING from pushed equality filters (a day-partitioned 100 TB lake
  * reads one day's files, not the listing of all of them), and partition
  * values are restored from directory names without touching row bytes.
  * Column pruning drops unreferenced fields at parse time.
  */
private[sources] class LakeSinkScanBuilder(fullSchema: StructType, path: String,
    partCols: Seq[String],
    onPlanned: Seq[String] => Unit = _ => (),
    snapshot: Option[Seq[String]] = None) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var partFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept equality filters on PARTITION columns (evaluated at planning
    * against directory names — completely, so no residual re-evaluation is
    * needed); everything else stays with the engine. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (part, rest) = filters.partition {
      case EqualTo(a, _) => partCols.contains(a)
      case _             => false
    }
    partFilters = part
    rest
  }
  override def pushedFilters(): Array[Filter] = partFilters

  override def build(): Scan =
    new LakeSinkScan(fullSchema, required, path, partCols, partFilters, onPlanned,
      snapshot)
}

/** Shared committed-file listing + partition-value matching — used by the
  * scan's planning, its statistics, and [[LakeSinkTable]]'s
  * partition-level DELETE. */
private[sources] object LakeSinkPartitions {

  /** Decode a relative lake path's Hive `k=v/` directory pairs. */
  def kvsOf(root: Path, p: Path, partCols: Seq[String]): Seq[(String, String)] = {
    val rel = root.relativize(p)
    (0 until rel.getNameCount - 1).map(rel.getName(_).toString).flatMap { d =>
      val eq = d.indexOf('=')
      if (eq > 0) Some(d.substring(0, eq) -> d.substring(eq + 1)) else None
    }.filter { case (k, _) => partCols.contains(k) }
  }

  /** Every committed data file under `path` with its decoded `k=v`
    * directory pairs; `_staging`/`_graft_commits`/`_graft_versions`/
    * `_graft_retired` are never listed. */
  def listCommitted(path: String, partCols: Seq[String]): Seq[(Path, Seq[(String, String)])] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return Seq.empty
    val hidden = Seq(LakeSinkFiles.stagingDir(path), LakeSinkFiles.commitsDir(path),
      LakeSinkFiles.versionsDir(path), LakeSinkFiles.retiredDir(path))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Path, Seq[(String, String)])]
    val it = Files.walk(root).iterator()
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (Files.isRegularFile(p) && n.startsWith("part-") && n.endsWith(".json.gz")
          && !hidden.exists(p.startsWith(_))) {
        out += ((p, kvsOf(root, p, partCols)))
      }
    }
    out.toSeq
  }

  /** Equality against a decoded partition value, tolerant of the external
    * value types the v1 Filter API surfaces (java.sql.Date vs LocalDate,
    * Integer vs Long literals). */
  def matches(colType: DataType, dirValue: String, want: Any): Boolean =
    colType match {
      case StringType => dirValue == String.valueOf(want)
      case IntegerType | LongType =>
        try java.lang.Long.parseLong(dirValue) == (want match {
          case i: java.lang.Integer => i.longValue
          case l: java.lang.Long    => l.longValue
          case other                => return dirValue == String.valueOf(other)
        }) catch { case _: NumberFormatException => false }
      case DateType =>
        val wantDay = want match {
          case d: java.sql.Date        => d.toLocalDate.toString
          case d: java.time.LocalDate  => d.toString
          case other                   => String.valueOf(other)
        }
        dirValue == wantDay
      case _ => false
    }

  /** Does a file's partition-value set satisfy every (partition-column
    * equality) filter? Non-equality filters keep everything — callers gate
    * them out beforehand. */
  def keeps(schema: StructType, kvs: Seq[(String, String)],
      filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo(a, v) =>
        kvs.find(_._1 == a).exists { case (_, dv) =>
          matches(schema(a).dataType, dv, v) }
      case _ => true
    }
}

private[sources] class LakeSinkScan(fullSchema: StructType, required: StructType,
    path: String, partCols: Seq[String], partFilters: Array[Filter],
    onPlanned: Seq[String] => Unit = _ => (),
    snapshot: Option[Seq[String]] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-lake-scan path=$path partFilters=[${partFilters.mkString(",")}]" +
      snapshot.map(fs => s" snapshot=${fs.length}files").getOrElse("")
  override def toBatch: Batch = this

  /** A VERSION/TIMESTAMP AS OF read plans the RECORDED file list, each
    * name resolved live-first then against `_graft_retired/` (a rewrite
    * moved it there); a name found in neither was vacuumed — fail loudly
    * rather than return a silently partial snapshot. */
  private def snapshotFiles(rels: Seq[String]): Seq[(Path, Seq[(String, String)])] = {
    val root = Paths.get(path)
    rels.map { rel =>
      val live = root.resolve(rel)
      val p =
        if (Files.isRegularFile(live)) live
        else {
          val r = LakeSinkFiles.retiredDir(path).resolve(rel)
          require(Files.isRegularFile(r),
            s"LakeSink time travel: snapshot file $rel was vacuumed from $path")
          r
        }
      // partition values decode from the RELATIVE name (shared by the
      // live and retired locations)
      (p, LakeSinkPartitions.kvsOf(root, root.resolve(rel), partCols))
    }
  }

  /** On-disk bytes of the PRUNED file set (the same convention Spark's
    * file sources use — `fileCompressionFactor` corrects for gzip if the
    * user tunes it), so a small lake table auto-broadcasts in catalog
    * joins with no hint. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = planInputPartitions().map {
      case LakeSinkInputPartition(f, _) => Files.size(Paths.get(f))
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes max 1L)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val all = snapshot match {
      case Some(rels) => snapshotFiles(rels)
      case None       => LakeSinkPartitions.listCommitted(path, partCols)
    }
    val kept = all
      .filter { case (_, kvs) => LakeSinkPartitions.keeps(fullSchema, kvs, partFilters) }
    // row-level operations record the planned group (file) set — the
    // exact files a ReplaceData commit must swap out (last planning wins)
    onPlanned(kept.map(_._1.toString))
    kept.map { case (p, kvs) => LakeSinkInputPartition(p.toString, kvs): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeSinkReaderFactory(fullSchema, required, partCols)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new LakeSinkMicroBatchStream(fullSchema, required, path, partCols)
}

/** Streaming READ of a lake table (`spark.readStream.table("graft.lake.…")`)
  * — the FileStreamSource pattern re-expressed as a DSv2 MicroBatchStream:
  * an offset is a SNAPSHOT of the committed file set (names are
  * deterministic and collision-free across writers, so set difference IS
  * the new data), each micro-batch reads exactly `end − start`, and a
  * checkpoint restart replays the same difference. Contract: streaming
  * readers assume the lake is APPEND-ONLY while tailed (the reference's
  * telemetry lake is); DML rewrites (MERGE/UPDATE/DELETE) change history,
  * and a vanished recorded file fails the batch loudly rather than
  * silently dropping rows. A production lakehouse versioned manifest
  * would make offsets O(1) — here the file list IS the manifest,
  * checkpointed by the engine. */
private[sources] class LakeSinkMicroBatchStream(fullSchema: StructType,
    required: StructType, path: String, partCols: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def committed(): Seq[String] =
    LakeSinkPartitions.listCommitted(path, partCols).map(_._1.toString).sorted

  override def initialOffset(): Offset = LakeSinkOffset(Seq.empty)
  override def latestOffset(): Offset = LakeSinkOffset(committed())
  override def deserializeOffset(json: String): Offset = LakeSinkOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[LakeSinkOffset].files.toSet
    val fresh = end.asInstanceOf[LakeSinkOffset].files.filterNot(seen)
    fresh.map { f =>
      require(Files.isRegularFile(Paths.get(f)),
        s"LakeSink stream: committed file $f vanished mid-stream — " +
          "streaming reads require an append-only lake")
      val root = Paths.get(path)
      val rel = root.relativize(Paths.get(f))
      val kvs = (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
        .flatMap { d =>
          val eq = d.indexOf('=')
          if (eq > 0) Some(d.substring(0, eq) -> d.substring(eq + 1)) else None
        }.filter { case (k, _) => partCols.contains(k) }
      LakeSinkInputPartition(f, kvs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeSinkReaderFactory(fullSchema, required, partCols)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = the sorted committed file list, JSON-escaped one name per
  * line entry (the writer's own escape set — names are path strings). */
private[sources] case class LakeSinkOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.map(f => "\"" + LakeSink.jsonEscape(f) + "\"").mkString("[", ",", "]")
}

private[sources] object LakeSinkOffset {
  def fromJson(json: String): LakeSinkOffset = {
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"),
      s"LakeSink stream: malformed offset $json")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) LakeSinkOffset(Seq.empty)
    else {
      // names were written with jsonEscape: split on "," boundaries is
      // unsafe under escaped quotes, so scan properly
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < body.length) {
        require(body.charAt(i) == '"', s"LakeSink stream: malformed offset at $i")
        val b = new java.lang.StringBuilder
        i += 1
        while (body.charAt(i) != '"') {
          if (body.charAt(i) == '\\') { i += 1; b.append(body.charAt(i)) }
          else b.append(body.charAt(i))
          i += 1
        }
        out += b.toString
        i += 1
        if (i < body.length) { require(body.charAt(i) == ','); i += 1 }
      }
      LakeSinkOffset(out.toSeq)
    }
  }
}

private[sources] case class LakeSinkInputPartition(file: String,
    partValues: Seq[(String, String)]) extends InputPartition

private[sources] class LakeSinkReaderFactory(fullSchema: StructType,
    required: StructType, partCols: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LakeSinkInputPartition]
    new LakeSinkPartitionReader(p.file, fullSchema, required, partCols, p.partValues)
  }
}

/** Streams one committed gzip JSON-lines file; each line is parsed with a
  * schema-typed scanner (the inverse of [[LakeSink.serializers]] — same
  * escape set, same micros-ISO timestamp format), partition-column values
  * are decoded ONCE from the directory names, and only `required` columns
  * are materialized. */
private[sources] class LakeSinkPartitionReader(file: String,
    fullSchema: StructType, required: StructType, partCols: Seq[String],
    partValues: Seq[(String, String)]) extends PartitionReader[InternalRow] {

  private val dataSchema = LakeSink.dataSchema(fullSchema, partCols)
  private val parser = new JsonLineParser(dataSchema)
  private val parsed = new Array[Any](dataSchema.length)

  // typed partition values, decoded once per file
  private val partTyped: Map[String, Any] = partValues.map { case (k, v) =>
    k -> (fullSchema(k).dataType match {
      case StringType  => UTF8String.fromString(v)
      case IntegerType => java.lang.Integer.valueOf(v)
      case LongType    => java.lang.Long.valueOf(v)
      case DateType    => java.lang.Integer.valueOf(
        java.time.LocalDate.parse(v).toEpochDay.toInt)
      case other => throw new UnsupportedOperationException(
        s"LakeSink read: unsupported partition column type $other for $k")
    })
  }.toMap

  // required field i ← Left(dataSchema position) | Right(constant: a
  // partition value or the _file metadata column, both per-file)
  private val extract: Array[Either[Int, Any]] = required.fields.map { f =>
    if (f.name == LakeSinkTable.FileMetaCol) Right(UTF8String.fromString(file))
    else if (partCols.contains(f.name)) Right(partTyped.getOrElse(f.name,
      throw new IllegalStateException(
        s"LakeSink read: partition column ${f.name} missing from ${file}'s path")))
    else Left(dataSchema.fieldIndex(f.name))
  }

  private val in = new BufferedReader(new InputStreamReader(
    new GZIPInputStream(Files.newInputStream(Paths.get(file))),
    StandardCharsets.UTF_8))
  private var line: String = _

  override def next(): Boolean = { line = in.readLine(); line != null }

  override def get(): InternalRow = {
    parser.parse(line, parsed)
    val vals = new Array[Any](extract.length)
    var i = 0
    while (i < extract.length) {
      vals(i) = extract(i) match {
        case Left(j)  => parsed(j)
        case Right(v) => v
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = in.close()
}

/** Group-based row-level operations (MERGE INTO / UPDATE / row-level
  * DELETE) for lake tables — the copy-on-write contract Iceberg calls
  * eager ReplaceData: Spark rewrites the command into "read the affected
  * GROUPS (files), compute their full post-command content, write
  * replacements"; the connector's job is (a) a scan that records exactly
  * which committed files it planned — partition-equality predicates the
  * engine pushes shrink that group set for free — and (b) a write whose
  * commit atomically-per-file promotes the staged replacements and drops
  * the recorded originals. Partition-equality DELETEs never get here
  * (SupportsDelete's metadata path wins); everything else rewrites.
  *
  * 100 TB story: the rewrite cost is proportional to the AFFECTED file
  * set, not the table, whenever the command's condition carries a
  * partition equality; the commit itself is O(#files) driver-side
  * renames. The promote→drop window is not a single atomic swap (a true
  * lakehouse closes it with a versioned file manifest) — documented, and
  * irrelevant to the single-writer semantics this sink promises. */
private[sources] class LakeSinkRowLevelOperation(schema: StructType,
    path: String, partCols: Seq[String], cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  // the op's scan and write are built from ONE instance — this field is
  // the group handshake between them (driver-side only)
  @volatile private var plannedFiles: Seq[String] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-lake-rowlevel-$cmd path=$path"
  /** Requiring `_file` is LOAD-BEARING, not an optimization hint: with no
    * metadata attributes Spark plans the plain writing task, which hands
    * the connector RAW (operation, data…) rows — only the
    * metadata-carrying task applies the data projection that strips the
    * operation column (verified against 4.1.2's ReplaceDataExec). */
  override def requiredMetadataAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      LakeSinkTable.FileMetaCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeSinkScanBuilder(schema, path, partCols,
      onPlanned = fs => plannedFiles = fs)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        LakeSink.serializers(LakeSink.dataSchema(info.schema(), partCols))
        override def description(): String = s"graft-lake-replace-data path=$path"
        override def toBatch: BatchWrite = new LakeSinkReplaceBatchWrite(
          info.schema(), path, partCols,
          java.util.UUID.randomUUID.toString.take(8), () => plannedFiles)
      }
    }
}

/** ReplaceData commit: stage like any batch write, then promote the
  * replacements and drop the operation's recorded group files. */
private[sources] class LakeSinkReplaceBatchWrite(schema: StructType,
    path: String, partCols: Seq[String], writeId: String,
    oldFiles: () => Seq[String]) extends BatchWrite {
  LakeSinkFiles.ensureDirs(path)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LakeSinkWriterFactory(schema, path, s"b$writeId", partCols)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    LakeSinkFiles.promote(path,
      messages.collect { case LakeSinkCommit(ns) => ns }.toSeq.flatten)
    // RETIRE (not delete) the replaced group files: pre-command snapshots
    // in the version log stay readable until VACUUM
    LakeSinkFiles.retire(path, oldFiles())
    LakeSinkFiles.recordVersion(path)
    Files.write(Paths.get(path, "_SUCCESS"), Array.empty[Byte])
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    LakeSinkFiles.discard(path,
      messages.collect { case LakeSinkCommit(ns) => ns }.toSeq.flatten)
    LakeSinkFiles.sweep(path, s"b$writeId")
  }
}

/** Minimal single-object JSON-lines scanner typed by the writer's own
  * schema — parses exactly the value grammar [[LakeSink.serializers]]
  * emits (null / number / true / false / escaped string / quoted
  * micros-ISO timestamp), field order free, unknown fields rejected
  * loudly (they would mean the manifest and the files drifted). */
private[sources] final class JsonLineParser(schema: StructType) {
  private val fieldIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    schema.fieldNames.zipWithIndex.foreach { case (n, i) => m.put(n, i) }
    m
  }
  private val types: Array[DataType] = schema.fields.map(_.dataType)

  private def fail(line: String, pos: Int, what: String): Nothing =
    throw new IllegalArgumentException(
      s"LakeSink read: malformed JSON line at pos $pos ($what): $line")

  /** Parse a quoted string starting at `pos` (at the opening '"');
    * returns (value, position after the closing quote). */
  private def parseString(line: String, pos: Int): (String, Int) = {
    var i = pos + 1
    val b = new java.lang.StringBuilder()
    while (i < line.length) {
      line.charAt(i) match {
        case '"' => return (b.toString, i + 1)
        case '\\' =>
          i += 1
          if (i >= line.length) fail(line, i, "dangling escape")
          line.charAt(i) match {
            case '"'  => b.append('"')
            case '\\' => b.append('\\')
            case '/'  => b.append('/')
            case 'n'  => b.append('\n')
            case 'r'  => b.append('\r')
            case 't'  => b.append('\t')
            case 'b'  => b.append('\b')
            case 'f'  => b.append('\f')
            case 'u'  =>
              if (i + 4 >= line.length) fail(line, i, "short \\u escape")
              b.append(Integer.parseInt(line.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => fail(line, i, s"unknown escape \\$c")
          }
          i += 1
        case c => b.append(c); i += 1
      }
    }
    fail(line, pos, "unterminated string")
  }

  private def micros(s: String): Long = {
    val inst = java.time.Instant.from(LakeSink.TsFormatter.parse(s))
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Parse one line into `out` (length = schema size, filled with the
    * InternalRow representation: UTF8String / micros-Long / primitives). */
  def parse(line: String, out: Array[Any]): Unit = {
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], null)
    var i = 0
    if (line.isEmpty || line.charAt(i) != '{') fail(line, i, "expected '{'")
    i += 1
    if (i < line.length && line.charAt(i) == '}') return // empty object
    var done = false
    while (!done) {
      if (i >= line.length || line.charAt(i) != '"') fail(line, i, "expected field name")
      val (name, afterName) = parseString(line, i)
      i = afterName
      if (i >= line.length || line.charAt(i) != ':') fail(line, i, "expected ':'")
      i += 1
      val fi = fieldIdx.get(name)
      if (fi == null) fail(line, i, s"unknown field '$name'")
      line.charAt(i) match {
        case 'n' =>
          if (!line.startsWith("null", i)) fail(line, i, "expected null")
          i += 4
        case 't' =>
          if (!line.startsWith("true", i)) fail(line, i, "expected true")
          out(fi) = java.lang.Boolean.TRUE; i += 4
        case 'f' =>
          if (!line.startsWith("false", i)) fail(line, i, "expected false")
          out(fi) = java.lang.Boolean.FALSE; i += 5
        case '"' =>
          val (s, after) = parseString(line, i)
          i = after
          out(fi) = types(fi) match {
            case StringType    => UTF8String.fromString(s)
            case TimestampType => java.lang.Long.valueOf(micros(s))
            case other => fail(line, i, s"quoted value for $other field '$name'")
          }
        case _ =>
          var j = i
          while (j < line.length && line.charAt(j) != ',' && line.charAt(j) != '}') j += 1
          val s = line.substring(i, j)
          i = j
          out(fi) = types(fi) match {
            case LongType    => java.lang.Long.valueOf(s)
            case IntegerType => java.lang.Integer.valueOf(s)
            case DoubleType  => java.lang.Double.valueOf(s)
            case FloatType   => java.lang.Float.valueOf(s)
            case other => fail(line, i, s"bare value for $other field '$name'")
          }
      }
      if (i >= line.length) fail(line, i, "unterminated object")
      line.charAt(i) match {
        case ',' => i += 1
        case '}' => done = true
        case _   => fail(line, i, "expected ',' or '}'")
      }
    }
  }
}
