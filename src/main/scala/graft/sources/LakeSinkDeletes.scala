package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Positional DELETE VECTORS for lake tables — the merge-on-read tier
  * (Iceberg positional delete files / Delta deletion vectors): a
  * row-level DELETE records (file, position) pairs in
  * `_graft_deletes.json` instead of rewriting whole files, scans filter
  * the marked positions out, and compaction MATERIALIZES the vectors
  * (rewrites the survivors, clears the entries). Because the lake's data
  * format is JSON-lines, a row's position IS its line index — the
  * vector applies with a sequential counter, no per-row lookup.
  *
  * Consumer contract (soundness under vectors):
  *  - `count(*)` pushdown stays exact: Σ per file (rows − |vector|);
  *  - min/max and count(col) pushdown FALL BACK to scanning for any
  *    kept file carrying a vector (the recorded bounds/null counts may
  *    describe deleted rows — a pushed answer could name a value that
  *    no longer exists); compaction restores them;
  *  - [lo, hi] file SKIPPING stays sound (bounds are a superset);
  *  - version records snapshot the ledger, so `VERSION AS OF` applies
  *    exactly the vectors of its commit and the CDF diff law holds
  *    across a merge-on-read version (newly-deleted positions surface
  *    as row-level delete legs).
  *
  * 100 TB story: a 1-row DELETE writes O(1) ledger bytes instead of
  * rewriting a file — the merge-on-read trade: reads pay a per-row
  * counter check until compaction amortizes the rewrite. */
private[graft] object LakeSinkDeletes {

  private val FileSep = '' // ledger line: rel <sep> p1,p2,p3

  def deletesPath(path: String): Path = Paths.get(path, "_graft_deletes.json")

  /** rel file → sorted distinct deleted positions. */
  def read(path: String): Map[String, Array[Long]] = {
    val p = deletesPath(path)
    if (!Files.isRegularFile(p)) return Map.empty
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    parse(LakeSinkFiles.jsonField(json, "files", s"deletes ledger at $p"))
  }

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

  /** Merge-and-replace (same temp + atomic-move protocol as the other
    * ledgers): `add` positions UNION into existing vectors; `remove`
    * drops whole files (retire/compaction). */
  def update(path: String, add: Map[String, Seq[Long]],
      remove: Seq[String]): Unit = {
    if (add.isEmpty && remove.isEmpty) return
    val cur = read(path) -- remove
    val merged = add.foldLeft(cur) { case (m, (rel, ps)) =>
      m.updated(rel, (m.getOrElse(rel, Array.empty[Long]) ++ ps).distinct.sorted)
    }
    val json = s"""{"files":"${LakeSink.jsonEscape(serialize(merged))}"}"""
    val tmp = Paths.get(path, s".deletes.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, deletesPath(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
