package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.connector.catalog.{View, ViewCatalog}
import org.apache.spark.sql.types.StructType

/** Stored SQL views over lake tables — the catalog state behind
  * [[GraftCatalog]]'s Spark 4.1 `ViewCatalog` implementation (the
  * reference's one declarative artifact is exactly this shape: the IoT
  * rule SQL of `phase2-iot-kinesis.yaml:61` is a stored view over a
  * stream). Each view is one JSON file under `<lakeRoot>/_views/` (the
  * `_staged` precedent: an underscore-prefixed root dir is never a
  * table — table listing keys on per-dir manifests):
  *
  * {{{
  *   {"sql":"SELECT …","aliases":"…","schema":"DDL","refs":"a;b",
  *    "curcat":"graft","comment":"…","props":"k\u0001v\u0002…"}
  * }}}
  *
  * Semantics: a graft view stores TEXT, not a plan — every query
  * re-parses and re-analyzes the text against the LIVE base tables
  * (Delta/Iceberg "schema evolution" view binding). Consequences the
  * specs pin: added base columns flow through `SELECT *` views; a
  * renamed/dropped base column a view references makes the view fail
  * LOUDLY at use (never silently wrong); stored column aliases apply by
  * position and refuse on arity drift.
  *
  * Writes are temp-file + atomic move (the manifest's protocol);
  * `refs` records the same-lake table/view NAMES the text references so
  * DROP can refuse while another view depends on the target and
  * REPLACE can refuse reference cycles before they enter the store.
  *
  * 100 TB story: a view is O(bytes of SQL) catalog state — resolution
  * cost is one small-file read at analysis; all data-plane planning
  * (pushdown, pruning, SPJ) happens on the substituted text exactly as
  * if the user had inlined it.
  */
private[graft] object GraftViews {

  /** One stored view. `refs` = same-lake-root table/view names the text
    * references (normalized at create time); `curcat` = the catalog name
    * the view was created through (informational — substitution re-reads
    * through whatever catalog name the session uses). */
  case class ViewDef(
      name: String,
      sql: String,
      aliases: Seq[String],
      schemaDDL: String,
      refs: Seq[String],
      currentCatalog: String,
      comment: Option[String],
      props: Seq[(String, String)],
      // per-alias column comments ("" = none), parallel to `aliases` —
      // an explicit DDL clause must round-trip, never drop (review r14)
      colComments: Seq[String] = Seq.empty)

  def viewsDir(lakeRoot: String): Path = Paths.get(lakeRoot, "_views")
  def viewPath(lakeRoot: String, name: String): Path =
    viewsDir(lakeRoot).resolve(name + ".json")

  /** Plain single-segment names only — a view name is a FILE name here,
    * and '../x' or a hidden/underscore prefix would escape or collide
    * with engine state. */
  def validName(n: String): Boolean =
    n.nonEmpty && !n.contains("/") && !n.contains("\\") &&
      !n.startsWith(".") && !n.startsWith("_") && !n.exists(_ < ' ')

  def exists(lakeRoot: String, name: String): Boolean =
    validName(name) && Files.isRegularFile(viewPath(lakeRoot, name))

  def list(lakeRoot: String): Seq[String] = {
    val d = viewsDir(lakeRoot)
    if (!Files.isDirectory(d)) return Seq.empty
    val out = Seq.newBuilder[String]
    val it = Files.list(d).iterator()
    while (it.hasNext) {
      val f = it.next().getFileName.toString
      if (f.endsWith(".json")) out += f.stripSuffix(".json")
    }
    out.result().sorted
  }

  def write(lakeRoot: String, vd: ViewDef): Unit = {
    require(validName(vd.name), s"invalid view name '${vd.name}'")
    val propBody = vd.props.map { case (k, v) => s"$k\u0001$v" }.mkString("\u0002")
    val json = s"""{"sql":"${LakeSink.jsonEscape(vd.sql)}"""" +
      s""","aliases":"${LakeSink.jsonEscape(vd.aliases.mkString("\u0001"))}"""" +
      s""","schema":"${LakeSink.jsonEscape(vd.schemaDDL)}"""" +
      s""","refs":"${LakeSink.jsonEscape(vd.refs.mkString(";"))}"""" +
      s""","curcat":"${LakeSink.jsonEscape(vd.currentCatalog)}"""" +
      vd.comment.map(c => s""","comment":"${LakeSink.jsonEscape(c)}"""").getOrElse("") +
      (if (vd.props.nonEmpty)
        s""","props":"${LakeSink.jsonEscape(propBody)}"""" else "") +
      (if (vd.colComments.exists(_.nonEmpty))
        s""","colcomments":"${LakeSink.jsonEscape(
          vd.colComments.mkString("\u0001"))}"""" else "") +
      "}"
    Files.createDirectories(viewsDir(lakeRoot))
    val tmp = viewsDir(lakeRoot).resolve(
      s".${vd.name}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, viewPath(lakeRoot, vd.name),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def read(lakeRoot: String, name: String): Option[ViewDef] = {
    if (!exists(lakeRoot, name)) return None
    val p = viewPath(lakeRoot, name)
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val where = s"view record $p"
    def opt(key: String): Option[String] =
      if (json.contains(s""""$key":"""")) Some(LakeSinkFiles.jsonField(json, key, where))
      else None
    Some(ViewDef(
      name = name,
      sql = LakeSinkFiles.jsonField(json, "sql", where),
      aliases = LakeSinkFiles.jsonField(json, "aliases", where)
        .split("\u0001").toSeq.filter(_.nonEmpty),
      schemaDDL = LakeSinkFiles.jsonField(json, "schema", where),
      refs = LakeSinkFiles.jsonField(json, "refs", where)
        .split(";").toSeq.filter(_.nonEmpty),
      currentCatalog = LakeSinkFiles.jsonField(json, "curcat", where),
      comment = opt("comment"),
      props = opt("props").toSeq.flatMap(_.split("\u0002").toSeq.filter(_.nonEmpty).map { e =>
        val i = e.indexOf('\u0001')
        e.substring(0, i) -> e.substring(i + 1)
      }),
      colComments = opt("colcomments").toSeq
        .flatMap(_.split("\u0001", -1).toSeq)))
  }

  def delete(lakeRoot: String, name: String): Boolean =
    validName(name) && Files.deleteIfExists(viewPath(lakeRoot, name))

  /** Views (other than `except`) whose stored refs include `name` —
    * the DROP/RENAME dependency check. */
  def referencing(lakeRoot: String, name: String,
      except: Option[String] = None): Seq[String] =
    list(lakeRoot).filter(v => !except.contains(v))
      .filter(v => read(lakeRoot, v).exists(_.refs.contains(name)))

  /** True if, with `name`'s refs REPLACED by `newRefs`, the reference
    * graph reaches `name` from `name` — the cycle a CREATE OR REPLACE
    * could introduce (plain CREATE cannot: nothing existing can
    * reference a name that did not exist). */
  def wouldCycle(lakeRoot: String, name: String, newRefs: Seq[String]): Boolean = {
    def refsOf(v: String): Seq[String] =
      if (v == name) newRefs else read(lakeRoot, v).map(_.refs).getOrElse(Seq.empty)
    val seen = scala.collection.mutable.Set.empty[String]
    def reaches(from: String): Boolean = refsOf(from).exists { r =>
      r == name || (seen.add(r) && reaches(r))
    }
    reaches(name)
  }
}

/** [[GraftViews.ViewDef]] surfaced through Spark's `View` interface. */
private[graft] class GraftStoredView(vd: GraftViews.ViewDef) extends View {
  override def name(): String = vd.name
  override def query(): String = vd.sql
  override def currentCatalog(): String = vd.currentCatalog
  override def currentNamespace(): Array[String] = Array("lake")
  override def schema(): StructType = StructType.fromDDL(vd.schemaDDL)
  override def queryColumnNames(): Array[String] = Array.empty
  override def columnAliases(): Array[String] = vd.aliases.toArray
  override def columnComments(): Array[String] =
    if (vd.colComments.exists(_.nonEmpty))
      vd.aliases.indices.map(i =>
        vd.colComments.lift(i).getOrElse("")).toArray
    else Array.empty
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    vd.props.foreach { case (k, v) => m.put(k, v) }
    vd.comment.foreach(c => m.put(ViewCatalog.PROP_COMMENT, c))
    m
  }
}
