package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric determinism policy (SURVEY.md §7 "Oracle parity").
  *
  * Two hazards make naive double aggregation non-reproducible between Spark
  * and the driver's DuckDB oracle:
  *
  *   1. `SUM(double)` order. Both engines sum in partition/vector order,
  *      which differs between them (and, for Spark, between runs), and double
  *      addition is not associative.
  *   2. `round(double, k)` semantics. Spark rounds the exact binary value via
  *      BigDecimal HALF_UP; DuckDB rounds the shortest decimal repr — e.g.
  *      round(2.675, 2) = 2.67 in Spark but 2.68 in DuckDB (measured, v1.0.0).
  *
  * Policy, applied to every oracle-checked query:
  *
  *   - Sums of doubles go through decimal(38,10): the per-row double→decimal
  *     cast is a deterministic value-level operation identical in both
  *     engines, decimal addition is exact → the sum is order-independent.
  *     The final result is cast back to double (exact for our magnitudes).
  *   - Rounding is floor(x * 10^k + 0.5) / 10^k: pure IEEE-double arithmetic,
  *     bit-identical in both engines (halves round toward +inf in both —
  *     consistency, not any particular tie rule, is what the oracle needs).
  *   - Per-row scalar arithmetic (x * (1 - d), subtraction, comparison) stays
  *     in double: IEEE ops are deterministic and identical across engines.
  *
  * Each helper has a Column form (Spark side) and a SQL-text form (DuckDB
  * oracle side) so the two stay in lockstep.
  */
object Num {

  private def p10(k: Int): Double = math.pow(10.0, k)

  /** floor-based half-up rounding, bit-identical across engines. */
  def r(c: Column, k: Int): Column =
    floor(c * lit(p10(k)) + lit(0.5)) / lit(p10(k))

  /** Driver/executor-side Scala twin of [[r]] — the identical IEEE ops
    * (×10^k, +0.5, floor, ÷10^k), for per-key sequential algorithms that
    * run inside mapGroups (t15 EWMA, e15 MMR) yet must stay bit-equal to
    * the SQL oracle. */
  def rD(x: Double, k: Int): Double =
    math.floor(x * p10(k) + 0.5) / p10(k)

  def rSql(e: String, k: Int): String = {
    val p = p10(k).toLong
    s"floor(($e) * $p.0 + 0.5) / $p.0"
  }

  /** order-independent exact sum of a double expression. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(38,10)")).cast("double")

  def dsumSql(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(38,10))) AS DOUBLE)"

  /** order-independent average: exact decimal sum ÷ count, in double. */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  def davgSql(e: String): String =
    s"(${dsumSql(e)} / count($e))"

  /** rounded sum/avg in one step — the common reporting shape. */
  def rsum(c: Column, k: Int): Column = r(dsum(c), k)
  def rsumSql(e: String, k: Int): String = rSql(dsumSql(e), k)
  def ravg(c: Column, k: Int): Column = r(davg(c), k)
  def ravgSql(e: String, k: Int): String = rSql(davgSql(e), k)
}
