package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Per-invocation temp lake roots for the oracle queries that exercise
  * the DSv2 catalog/connector stack (t31–t49, d58).
  *
  * Two hygiene contracts (ADVICE r9):
  *  - each invocation registers its OWN uniquely-named catalog
  *    (`graft_t42.lake.t42`) over a fresh root instead of re-pointing the
  *    shared `spark.sql.catalog.graft.lake` conf — a concurrent lake
  *    query planned in the same session can therefore never resolve its
  *    tables against another query's root;
  *  - every created root is registered for END-OF-JVM recursive cleanup,
  *    so repeated bench reps do not leak disk (a rep's tables live only
  *    as long as the process — the queries are self-contained and
  *    deterministic, nothing reads them across reps).
  */
private[graft] object TempLakes {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach(r => deleteRec(Paths.get(r)))
    }, "graft-temp-lake-cleanup"))
  }

  private def deleteRec(root: Path): Unit =
    if (Files.exists(root)) {
      val it = Files.walk(root).sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) {
        try Files.deleteIfExists(it.next())
        catch { case _: java.io.IOException => () } // best-effort at exit
      }
    }

  /** Fresh lake root under its own catalog `graft_<tag>`; tables are then
    * addressed as `graft_<tag>.lake.<name>`. Returns the root. */
  def catalog(s: SparkSession, tag: String): String = {
    val root = dir(s"graft_${tag}_lake")
    s.conf.set(s"spark.sql.catalog.graft_$tag", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.graft_$tag.lake", root)
    root
  }

  /** A cleanup-registered plain temp directory (sink paths, checkpoints). */
  def dir(prefix: String): String = {
    val root = Files.createTempDirectory(prefix).toString
    roots.add(root)
    root
  }
}
