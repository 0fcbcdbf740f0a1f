package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Advanced, Analytics, Corpus, Curation, DedupLsh, Multimodal, Relational, Similarity, Telemetry, TextOps}
import graft.ml.Maintenance

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator modules' query maps; each key has
  * a matching DuckDB-runnable oracle in `oracleSql` unless the operator is
  * not SQL-expressible (LSH, ML, streaming), in which case the driver falls
  * back to a rows-only check and a scalatest spec carries correctness.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ Advanced.queries ++
      Telemetry.queries ++ TextOps.queries ++ Corpus.queries ++
      Curation.queries ++ Similarity.queries ++ DedupLsh.queries ++
      Multimodal.queries ++ Maintenance.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytics.oracles ++ Advanced.oracles ++
      Telemetry.oracles ++ TextOps.oracles ++ Corpus.oracles ++
      Curation.oracles ++ Similarity.oracles ++ DedupLsh.oracles ++
      Multimodal.oracles ++ Maintenance.oracles
}
