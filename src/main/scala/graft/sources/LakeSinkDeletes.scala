package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Positional DELETE VECTORS for lake tables — the merge-on-read tier
  * (Iceberg positional delete files / Delta deletion vectors): a
  * row-level DELETE records (file, position) pairs instead of rewriting
  * whole files, scans filter the marked positions out, and compaction
  * MATERIALIZES the vectors (rewrites the survivors, clears the
  * entries). Because the lake's data format is JSON-lines, a row's
  * position IS its line index — the vector applies with a sequential
  * counter, no per-row lookup.
  *
  * Storage layout — per-commit IMMUTABLE delete files under
  * `_graft_deletes/` (`d-<uuid>.json`, one per committing operation),
  * unioned at read: a concurrent pair of merge-on-read DELETEs each
  * write their OWN file, so no commit can lose another's vectors (the
  * read-modify-write a single ledger file would need is exactly the
  * race [[LakeSinkFiles.reserveVersion]] exists to prevent — vectors
  * get the Iceberg answer instead: append-only delete files).
  * CONSOLIDATION (subtracting retired files' entries, folding the union
  * into one file) happens only on retire/compaction/vacuum — documented
  * single-writer maintenance; it deletes only the files it read, so a
  * racing delete-commit's fresh file always survives.
  *
  * Consumer contract (soundness under vectors):
  *  - `count(*)` pushdown stays exact: Σ per file (rows − |vector|);
  *  - min/max and count(col) pushdown FALL BACK to scanning for any
  *    kept file carrying a vector (the recorded bounds/null counts may
  *    describe deleted rows); compaction restores them;
  *  - [lo, hi] file SKIPPING stays sound (bounds are a superset);
  *  - version records snapshot the UNION, so `VERSION AS OF` applies
  *    exactly the vectors of its commit and the CDF diff law holds
  *    across a merge-on-read version (newly-deleted positions surface
  *    as row-level delete legs).
  *
  * 100 TB story: a 1-row DELETE writes one tiny immutable object — the
  * merge-on-read trade: reads pay a per-row counter check on affected
  * files until compaction amortizes the rewrite. */
private[graft] object LakeSinkDeletes {

  private val FileSep = '' // entry line: rel <sep> p1,p2,p3

  def deletesDir(path: String): Path = Paths.get(path, "_graft_deletes")

  private def deleteFiles(path: String): Seq[Path] = {
    val dir = deletesDir(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    val it = Files.list(dir).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith("d-") && n.endsWith(".json")) out += p
    }
    out.toSeq.sortBy(_.getFileName.toString)
  }

  private def readOne(p: Path): Map[String, Array[Long]] = {
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    parse(LakeSinkFiles.jsonField(json, "files", s"delete file $p"))
  }

  /** rel file → sorted distinct deleted positions — the UNION of every
    * immutable delete file. */
  def read(path: String): Map[String, Array[Long]] =
    union(deleteFiles(path).map(readOne))

  private def union(ms: Seq[Map[String, Array[Long]]]): Map[String, Array[Long]] =
    if (ms.isEmpty) Map.empty
    else ms.flatten.groupBy(_._1)
      .map { case (rel, es) => rel -> es.flatMap(_._2).distinct.toArray.sorted }

  def parse(body: String): Map[String, Array[Long]] =
    body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf(FileSep)
      line.substring(0, i) ->
        line.substring(i + 1).split(",").filter(_.nonEmpty).map(_.toLong).sorted
    }.toMap

  def serialize(m: Map[String, Array[Long]]): String =
    m.toSeq.sortBy(_._1).map { case (rel, ps) =>
      s"$rel$FileSep${ps.sorted.mkString(",")}"
    }.mkString("\n")

  private def writeFile(path: String, m: Map[String, Array[Long]]): Unit = {
    val dir = deletesDir(path)
    Files.createDirectories(dir)
    val json = s"""{"files":"${LakeSink.jsonEscape(serialize(m))}"}"""
    val tmp = dir.resolve(s".d.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"d-${java.util.UUID.randomUUID.toString.take(8)}.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Conflict detection for commits whose rewrite CONTENT was computed
    * against a planning-time vector snapshot (compaction's materialize
    * pass, ReplaceData's vector-filtered scan): a concurrent merge-on-read
    * DELETE commits vectors WITHOUT touching any data file, so
    * [[LakeSinkFiles.requireAllLive]] cannot see it — but a rewrite
    * materialized from the stale vector set would silently RESURRECT the
    * concurrently-deleted rows. Compare the planned files' CURRENT vector
    * entries against the planning-time snapshot and abort loudly (before
    * any mutation) on any difference; `rels` are RELATIVE names. */
  def requireUnchanged(path: String, rels: Seq[String],
      snapshot: Map[String, Array[Long]], who: String): Unit = {
    val now = read(path)
    val changed = rels.distinct.filter { rel =>
      !java.util.Arrays.equals(now.getOrElse(rel, Array.empty[Long]),
        snapshot.getOrElse(rel, Array.empty[Long]))
    }
    if (changed.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"LakeSink: $who commit conflict at $path — ${changed.size} planned " +
          "file(s) gained delete vectors from a concurrent merge-on-read " +
          s"commit since planning (first: ${changed.head}); rewriting them " +
          "from the stale vector set would resurrect the concurrently-deleted " +
          "rows; aborting before any mutation — re-run to plan against the " +
          "current table state")
  }

  /** Record vectors / drop files' entries.
    *  - `add` only (a delta-DML commit): writes ONE new immutable delete
    *    file — append-only, so concurrent committers can never lose each
    *    other's vectors.
    *  - `remove` non-empty (retire/compaction — single-writer
    *    maintenance): consolidates the union minus the removed rels
    *    (plus `add`) into one file and deletes exactly the files it
    *    read; a racing delete-commit's fresh file survives untouched. */
  def update(path: String, add: Map[String, Seq[Long]],
      remove: Seq[String]): Unit = {
    if (add.isEmpty && remove.isEmpty) return
    val addArr = add.map { case (k, v) => k -> v.toArray }
    if (remove.isEmpty) { writeFile(path, addArr); return }
    val old = deleteFiles(path)
    val merged = union(old.map(readOne) :+ addArr) -- remove
    if (merged.nonEmpty) writeFile(path, merged)
    old.foreach(Files.deleteIfExists(_))
  }
}
