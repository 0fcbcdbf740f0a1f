package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Num._

/** Relational operator surface (SURVEY.md §2.2/§2.4): scans, projections,
  * filters, equi/semi/anti/broadcast joins, hash aggregation, rollup/cube/
  * grouping sets, ranking + analytic windows, top-k, set ops, scalar
  * string/date/math/json functions.
  *
  * Scale notes (the 100 TB story, verified locally via `.explain`):
  *   - filters/projections are declared first so Catalyst pushes them into
  *     the parquet scan (PushedFilters / ReadSchema pruning);
  *   - dimension tables (region/nation/customer/part/supplier) are tiny
  *     relative to the fact tables at every SF, so dimension joins use
  *     `broadcast()` — no shuffle of the fact side;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *     reuse that partitioning for the following aggregation where possible;
  *   - aggregates are partial+final HashAggregate (map-side combine) for
  *     free from Catalyst;
  *   - every output carries a total-order sort so results are deterministic
  *     for the DuckDB hash compare (ties broken by primary keys).
  *
  * Oracle parity: all double sums/avgs and all rounding go through
  * [[Num]] — see there for why builtin round()/SUM(double) are not
  * reproducible across engines.
  */
object Relational {

  /** q01 — pricing summary report (TPC-H Q1 shape).
    * Reference semantics: the per-flag aggregate report a lake compaction
    * job would run over telemetry partitions (SURVEY.md §2.4 aggregation).
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        rsum($"l_quantity", 2).as("sum_qty"),
        rsum($"l_extendedprice", 2).as("sum_base_price"),
        rsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2).as("sum_disc_price"),
        rsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 2).as("sum_charge"),
        ravg($"l_quantity", 4).as("avg_qty"),
        ravg($"l_extendedprice", 4).as("avg_price"),
        ravg($"l_discount", 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${rsumSql("l_quantity", 2)} AS sum_qty,
       ${rsumSql("l_extendedprice", 2)} AS sum_base_price,
       ${rsumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS sum_disc_price,
       ${rsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 2)} AS sum_charge,
       ${ravgSql("l_quantity", 4)} AS avg_qty,
       ${ravgSql("l_extendedprice", 4)} AS avg_price,
       ${ravgSql("l_discount", 6)} AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** q02 — selective filter + projection + top-k.
    * `.explain` must show PushedFilters on l_shipdate/l_discount and a
    * 5-column ReadSchema; top-k plans as TakeOrderedAndProject (no global
    * sort of the fact table).
    */
  def q02FilterTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") && $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in this testdata; the
      // added keys make the order total (verified at sf0.01/sf0.1)
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_partkey".asc, $"l_quantity".asc)
      .limit(100)
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05
       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC,
                l_partkey ASC, l_quantity ASC
       LIMIT 100"""

  /** q03 — shipping-priority revenue (TPC-H Q3 shape): broadcast dim filter
    * (customer segment) + fact-fact equi join + agg + top-k.
    * customer is broadcast; orders⋈lineitem shuffles once on the order key.
    */
  def q03RevenueTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(rsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       ${rsumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1999-01-01'
         AND l_shipdate > TIMESTAMP '1997-01-01'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey ASC
       LIMIT 10"""

  /** q04 — left-semi join (EXISTS): orders having a high-quantity line.
    * Semi join shuffles only keys of the probe side; count by priority.
    */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigLines = Tables.lineitem(s, dir).filter($"l_quantity" > 45.0)
      .select($"l_orderkey")
    Tables.orders(s, dir)
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** q05 — left-anti join (NOT EXISTS): customers with no recent orders
    * (churned since 1998-06-01). The dedup-removal primitive
    * (SURVEY.md §2.4 joins row); the probe side is date-filtered so the
    * result is non-empty at every SF (every customer has *some* order).
    */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1998-06-01").cast("timestamp"))
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1998-06-01')
       ORDER BY c_custkey"""

  /** q06 — broadcast dimension join + agg: revenue by part brand.
    * part is always tiny vs lineitem (20k vs 600k at sf0.1; same ratio at
    * 100 TB) → `broadcast()` so the fact side never shuffles for the join;
    * the only shuffle is the final 25-group aggregation exchange.
    */
  def q06BrandRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(broadcast(Tables.part(s, dir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        rsum($"l_quantity", 2).as("sum_qty"),
        rsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  val q06Sql: String =
    s"""SELECT p_brand,
       ${rsumSql("l_quantity", 2)} AS sum_qty,
       ${rsumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue,
       count(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand
       ORDER BY p_brand"""

  /** q07 — ranking window: top-3 orders per customer by total price.
    * One shuffle on o_custkey; rank predicate is evaluated before the
    * final sort so only ≤3 rows/customer survive.
    */
  def q07TopPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         FROM orders) t
       WHERE rn <= 3
       ORDER BY o_custkey, rn"""

  /** q08 — analytic window: per-supplier running revenue + delta vs the
    * previous shipment (the lag-based spike-detection shape from
    * SURVEY.md §2.4). Running double sums accumulate in identical declared
    * order in Spark and DuckDB, so values are bit-stable before rounding.
    */
  def q08RunningAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // l_extendedprice completes the total order per supplier (verified);
    // without it running sums over tied keys are engine-dependent
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
    Tables.lineitem(s, dir)
      .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .withColumn("running_revenue",
        r(sum($"l_extendedprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("delta_prev",
        r($"l_extendedprice" - lag($"l_extendedprice", 1, 0.0).over(w), 2))
      .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
  }

  val q08Sql: String =
    s"""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice,
       ${rSql("sum(l_extendedprice) OVER w2", 2)} AS running_revenue,
       ${rSql("l_extendedprice - lag(l_extendedprice, 1, 0.0) OVER w1", 2)} AS delta_prev
       FROM lineitem
       WINDOW w1 AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice),
              w2 AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice"""

  /** q09 — rollup over the region→nation hierarchy (reporting rollups,
    * SURVEY.md §2.4 grouping-sets row). Dims broadcast; single shuffle for
    * the rollup aggregation. NULLS FIRST pinned on both engines.
    */
  def q09Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val geo = broadcast(
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name", $"r_name"))
    Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(geo, $"c_nationkey" === $"n_nationkey")
      .join(Tables.orders(s, dir).select($"o_custkey", $"o_totalprice"),
        $"c_custkey" === $"o_custkey")
      .rollup($"r_name", $"n_name")
      .agg(rsum($"o_totalprice", 2).as("total_sales"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q09Sql: String =
    s"""SELECT r_name, n_name,
       ${rsumSql("o_totalprice", 2)} AS total_sales,
       count(*) AS n_orders
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       JOIN orders ON o_custkey = c_custkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  /** q10 — cube over returnflag × linestatus.
    *
    * r14 perf: aggregate at the finest (flag, status) level FIRST, then
    * CUBE over the tiny cell frame. Cubing the raw table runs Expand ahead
    * of the partial aggregate — every lineitem row multiplied ×4 grouping
    * sets, paying 4× the double→decimal casts (the per-row dominant cost;
    * measured: one 2.4 s scan+expand+agg stage was the whole query).
    * Decimal sums and counts are exact and associative, so re-aggregating
    * per-cell decimal sums under CUBE is value-identical to cubing rows
    * (same multiset of addends per output cell; rounding only at the end,
    * exactly as [[Num.rsum]]/[[Num.ravg]] compose). */
  def q10Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pre = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("pn"),
        sum($"l_quantity".cast("decimal(38,10)")).as("pq"),
        sum($"l_discount".cast("decimal(38,10)")).as("pd"),
        count($"l_discount").as("pdn"))
    pre.cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"pn").as("n"),
        r(sum($"pq").cast("double"), 2).as("sum_qty"),
        r(sum($"pd").cast("double") / sum($"pdn"), 6).as("avg_disc"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q10Sql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       ${rsumSql("l_quantity", 2)} AS sum_qty,
       ${ravgSql("l_discount", 6)} AS avg_disc
       FROM lineitem
       GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** q11 — explicit GROUPING SETS via the SQL surface (status-only,
    * priority-only, grand total) + grouping() disambiguator.
    */
  def q11GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders_gs")
    // CAST total AS DOUBLE: rsumSql inside Spark SQL yields a DECIMAL
    // column, which pyarrow surfaces as object(Decimal) while the DuckDB
    // oracle's fetchdf gives float64 — the actual r1 hash-red cause
    // (q09/q10 pass because the Scala `rsum` already emits double).
    // grouping() also cast to INT on both sides (tinyint vs wider int).
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         CAST(grouping(o_orderstatus) AS INT) AS g_status,
         CAST(grouping(o_orderpriority) AS INT) AS g_priority,
         count(*) AS n,
         CAST(${rsumSql("o_totalprice", 2)} AS DOUBLE) AS total
         FROM graft_orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_priority, o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""")
  }

  val q11Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       count(*) AS n,
       ${rsumSql("o_totalprice", 2)} AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY g_status, g_priority, o_orderstatus ASC NULLS FIRST,
                o_orderpriority ASC NULLS FIRST"""

  /** q12 — set ops: customers active in 1996 INTERSECT 1997, plus the
    * 1996-only EXCEPT set, tagged and unioned.
    */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
    def activeIn(yr: Int): DataFrame =
      ord.filter(year($"o_orderdate") === yr).select($"o_custkey").distinct()
    val both = activeIn(1996).intersect(activeIn(1997))
      .withColumn("cohort", lit("both_years"))
    val only96 = activeIn(1996).except(activeIn(1997))
      .withColumn("cohort", lit("only_1996"))
    both.union(only96).orderBy($"cohort", $"o_custkey")
  }

  val q12Sql: String =
    """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
            y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
       SELECT o_custkey, 'both_years' AS cohort FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
       UNION ALL
       SELECT o_custkey, 'only_1996' AS cohort FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
       ORDER BY cohort, o_custkey"""

  /** q13 — scalar string functions (SURVEY.md §2.4 string row): lower,
    * substring, split+element, regexp_extract, concat, length.
    */
  def q13StringFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lower"),
        substring($"p_name", 1, 8).as("name_prefix"),
        element_at(split($"p_type", " "), 1).as("type_head"),
        regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        length($"p_name").as("name_len"))
      .orderBy($"p_partkey")
  }

  val q13Sql: String =
    """SELECT p_partkey,
       lower(p_name) AS name_lower,
       substring(p_name, 1, 8) AS name_prefix,
       string_split(p_type, ' ')[1] AS type_head,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       concat(p_brand, '/', p_type) AS brand_type,
       length(p_name) AS name_len
       FROM part
       ORDER BY p_partkey"""

  /** q14 — date/time functions: truncation hierarchy + month-grain sales
    * aggregation (the time-bucketed reporting query).
    */
  def q14DateTime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(
        year($"o_orderdate").as("o_year"),
        quarter($"o_orderdate").as("o_quarter"),
        date_trunc("month", $"o_orderdate").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        rsum($"o_totalprice", 2).as("monthly_sales"))
      .orderBy($"o_year", $"o_quarter", $"o_month")
  }

  val q14Sql: String =
    s"""SELECT year(o_orderdate) AS o_year,
       quarter(o_orderdate) AS o_quarter,
       date_trunc('month', o_orderdate) AS o_month,
       count(*) AS n_orders,
       ${rsumSql("o_totalprice", 2)} AS monthly_sales
       FROM orders
       GROUP BY 1, 2, 3
       ORDER BY o_year, o_quarter, o_month"""

  /** q15 — math functions over a pushed-down filter. sqrt is IEEE-exact in
    * both engines; ln/pow can differ in the last ulp, hidden by r6.
    */
  def q15MathFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" >= 30.0)
      .select(
        $"l_orderkey", $"l_linenumber",
        r(sqrt($"l_extendedprice"), 4).as("price_sqrt"),
        r(log($"l_extendedprice"), 6).as("price_ln"),
        r(pow($"l_discount" + 1.0, 2.0), 6).as("disc_sq"),
        ceil($"l_quantity" / 7.0).cast("long").as("qty_bucket"),
        floor($"l_extendedprice" / 1000.0).cast("long").as("price_kbucket"),
        abs($"l_discount" - 0.05).as("disc_dev"))
      // price_sqrt/disc_sq are bijective in extendedprice/discount, so this
      // output-column order is total up to fully-identical rows
      .orderBy($"l_orderkey", $"l_linenumber", $"price_sqrt", $"disc_sq", $"qty_bucket")
  }

  val q15Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       ${rSql("sqrt(l_extendedprice)", 4)} AS price_sqrt,
       ${rSql("ln(l_extendedprice)", 6)} AS price_ln,
       ${rSql("pow(l_discount + 1.0, 2.0)", 6)} AS disc_sq,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_kbucket,
       abs(l_discount - 0.05) AS disc_dev
       FROM lineitem
       WHERE l_quantity >= 30.0
       ORDER BY l_orderkey, l_linenumber, price_sqrt, disc_sq, qty_bucket"""

  /** q16 — distinct aggregation: exact distinct customers per priority
    * (Catalyst plans expand + two-phase agg; at 100 TB you'd swap in
    * approx_count_distinct — exposed separately since HLL isn't
    * oracle-comparable).
    */
  def q16DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        max($"o_totalprice").as("max_price"),
        min($"o_totalprice").as("min_price"))
      .orderBy($"o_orderpriority")
  }

  val q16Sql: String =
    """SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       max(o_totalprice) AS max_price,
       min(o_totalprice) AS min_price
       FROM orders
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** q43 — multi-column DISTINCT aggregation: several count(DISTINCT x)
    * over DIFFERENT columns in one aggregate, plus a conditional distinct
    * — the aggregation surface that forces Spark's Expand-based plan (one
    * row replicated per distinct group, grouping-id partial aggregation;
    * a single-distinct agg like q16 takes the cheaper two-stage path).
    * Scale shape: the Expand triples the shuffle input but each distinct
    * stream partial-aggregates map-side on (key, value) before the one
    * exchange — the standard engine answer; no per-distinct re-scan of
    * the fact table. */
  def q43MultiDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_part"),
        countDistinct($"l_suppkey").as("nd_supp"),
        countDistinct($"l_orderkey").as("nd_order"),
        count(when($"l_quantity" > 25, $"l_partkey")).as("n_heavy"),
        countDistinct(when($"l_quantity" > 25, $"l_partkey")).as("nd_part_heavy"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val q43Sql: String =
    """SELECT l_returnflag,
       count(DISTINCT l_partkey) AS nd_part,
       count(DISTINCT l_suppkey) AS nd_supp,
       count(DISTINCT l_orderkey) AS nd_order,
       count(CASE WHEN l_quantity > 25 THEN l_partkey END) AS n_heavy,
       count(DISTINCT CASE WHEN l_quantity > 25 THEN l_partkey END) AS nd_part_heavy,
       count(*) AS n_rows
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  /** All relational queries + oracles, keyed for SparkEntry. */
  /** q36 — fuzzy string matching: Levenshtein-close part-name pairs
    * within a brand block. The exact-edit-distance baseline of the fuzzy
    * join family (both engines implement classic Levenshtein — values are
    * integer-identical). Blocking on p_brand keeps the quadratic term
    * per-block and shuffles once on the block key; at 100 TB the block
    * would be a q-gram LSH bucket (the m01 construction) instead of a
    * catalog attribute — this is the verifier that path composes with. */
  def q36FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_name")
    // the block key p_brand has ~25 distinct values — a shuffled join
    // would serialize all pairs onto ≤25 tasks (measured 8.6 s at sf0.1);
    // repartitioning the probe side by key and broadcasting the (small)
    // name table spreads the quadratic work across every core (same
    // mitigation as d05's nearDupPairs) — 25 blocks × 800 names each is
    // broadcastable at any catalog size
    // explicit partition count: the probe rows are only ~1 MB, so AQE
    // would coalesce a bare repartition(col) to ONE partition and
    // serialize the whole quadratic join on a single task — the byte-size
    // heuristic can't see the join's compute amplification
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val a = p.select($"p_brand", $"p_partkey".as("key_a"), $"p_name".as("name_a"))
      .repartition(nPart, col("key_a"))
    val b = p.select($"p_brand".as("brand_b"), $"p_partkey".as("key_b"), $"p_name".as("name_b"))
    // lossless length-band pruning: edit distance ≥ |len(a) − len(b)|, so
    // pairs outside the ±3 band can never qualify — the cheap predicate
    // drops them before the O(m·n) Levenshtein runs (the oracle needn't
    // mirror it: it only removes non-qualifying pairs)
    a.join(broadcast(b), $"p_brand" === $"brand_b" && $"key_a" < $"key_b" &&
        abs(length($"name_a") - length($"name_b")) <= 3)
      // threshold form runs the banded O(k·n) algorithm and returns -1
      // above the bound — same qualifying distances as the full compute
      .withColumn("dist", levenshtein($"name_a", $"name_b", 3))
      .filter($"dist" >= 0 && $"dist" <= 3)
      .select($"p_brand", $"key_a", $"key_b", $"name_a", $"name_b", $"dist")
      .orderBy($"dist", $"key_a", $"key_b")
      .limit(100)
  }

  val q36Sql: String =
    """SELECT p_brand, key_a, key_b, name_a, name_b, dist FROM (
         SELECT a.p_brand AS p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
                a.p_name AS name_a, b.p_name AS name_b,
                levenshtein(a.p_name, b.p_name) AS dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey) t
       WHERE dist <= 3
       ORDER BY dist, key_a, key_b
       LIMIT 100"""

  // --- q84: TPC-H Q5 through the SQL front end --------------------------------

  /** The Q5 body, shared verbatim by both engines up to the rounded
    * revenue expression and the table-name prefix (Spark reads prefixed
    * `graft_q5_*` temp views so the session-global view namespace never
    * shadows bare base-table names for later `spark.sql` callers; the
    * DuckDB oracle reads the driver's bare table names — `p` is empty
    * there). */
  private def q5Body(rev: String, p: String): String =
    s"""SELECT n_name, $rev AS revenue
       FROM ${p}customer, ${p}orders, ${p}lineitem, ${p}supplier, ${p}nation, ${p}region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
         AND o_orderdate < CAST('1997-01-01' AS TIMESTAMP)
       GROUP BY n_name
       ORDER BY revenue DESC NULLS LAST, n_name"""

  /** q84 — TPC-H Q5 (local-supplier volume), submitted as SQL TEXT
    * through `spark.sql` over temp views (every other relational query
    * declares its plan with the DataFrame API; q84 exercises the SQL
    * front end end-to-end — parser, analyzer view resolution, join
    * reorder over a 6-table star, pushdown of the region/date filters —
    * on the most-benchmarked OLAP query shape there is). The query text
    * is shared with the oracle verbatim except the rounded-decimal
    * revenue (and Spark's decimal-literal CAST, the q11 lesson).
    *
    * Scale shape: Catalyst's own — dimension filters reach the scans,
    * region/nation/supplier/customer broadcast, the orders⋈lineitem
    * equi-join carries the one fact-sized shuffle. */
  def q84TpchQ5(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q5_$t"))
    s.sql(q5Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q5_"))
  }

  val q84Sql: String =
    q5Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  // --- q85/q86: TPC-H Q3 and Q10 through the SQL front end --------------------

  /** The Q3 body (shipping priority), shared verbatim by both engines up
    * to the rounded revenue and the view prefix. Deviations from the
    * published query, forced by this testdata: the catalog has no
    * `o_shippriority` (o_orderpriority stands in) and its dates span
    * 1995-2001 (cutoff moved to 1997-06-15); ORDER BY gains the
    * `l_orderkey` tiebreak because `(revenue, o_orderdate)` is not a
    * total order of the output — l_orderkey IS unique per group (one
    * order has one date/priority), so the extended key is total. */
  private def q3Body(rev: String, p: String): String =
    s"""SELECT l_orderkey, $rev AS revenue, o_orderdate, o_orderpriority
       FROM ${p}customer, ${p}orders, ${p}lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < CAST('1997-06-15' AS TIMESTAMP)
         AND l_shipdate > CAST('1997-06-15' AS TIMESTAMP)
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC NULLS LAST, o_orderdate, l_orderkey
       LIMIT 10"""

  /** q85 — TPC-H Q3 as SQL TEXT through `spark.sql` (q84's front-end
    * path: parser → analyzer view resolution → join reorder → pushdown).
    * Scale shape: customer's segment filter broadcasts, orders⋈lineitem
    * carries the one fact shuffle, the top-10 is a TakeOrdered — no
    * global sort materializes. */
  def q85TpchQ3(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q3_$t"))
    s.sql(q3Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q3_"))
  }

  val q85Sql: String =
    q3Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  /** The Q10 body (returned-item reporting), shared verbatim by both
    * engines up to the rounded revenue and the view prefix. This catalog
    * carries no c_address/c_phone/c_comment, so the report keeps the
    * columns that exist; quarter moved inside the data's 1995-2001 span.
    * `c_custkey` tiebreak: unique per group, so the order is total. */
  private def q10Body(rev: String, p: String): String =
    s"""SELECT c_custkey, c_name, $rev AS revenue, c_acctbal, n_name
       FROM ${p}customer, ${p}orders, ${p}lineitem, ${p}nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= CAST('1996-10-01' AS TIMESTAMP)
         AND o_orderdate < CAST('1997-01-01' AS TIMESTAMP)
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC NULLS LAST, c_custkey
       LIMIT 20"""

  /** q86 — TPC-H Q10 as SQL TEXT through `spark.sql`. Scale shape: the
    * quarter filter prunes orders before the fact join, nation broadcasts,
    * the per-customer rollup shuffles once on the (already-joined) group
    * key, top-20 via TakeOrdered. */
  def q86TpchQ10(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q10_$t"))
    s.sql(q10Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q10_"))
  }

  val q86Sql: String =
    q10Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  // --- q87/q88/q89: TPC-H Q6, Q12, Q18 through the SQL front end --------------

  /** The Q6 body (forecasting-revenue change) — a pure scan-local
    * predicate + one ungrouped sum, the classic pushdown probe: the
    * shipdate/discount/quantity conjunction must reach the parquet scan
    * (PushedFilters) and nothing shuffles but one partial-agg exchange.
    * Text shared verbatim up to the rounded revenue and the view prefix;
    * date window moved into this catalog's 1995-2001 span. */
  private def q6Body(rev: String, p: String): String =
    s"""SELECT $rev AS revenue
       FROM ${p}lineitem
       WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
         AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP)
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24
       ORDER BY revenue"""

  /** q87 — TPC-H Q6 as SQL TEXT through `spark.sql`. */
  def q87TpchQ6(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q6_lineitem")
    s.sql(q6Body(
      s"CAST(${rsumSql("l_extendedprice * l_discount", 2)} AS DOUBLE)",
      "graft_q6_"))
  }

  val q87Sql: String = q6Body(rsumSql("l_extendedprice * l_discount", 2), "")

  /** The Q12 body (shipping-mode / priority) — catalog deviations, each
    * forced by this testdata and documented: there is no `l_shipmode`
    * (l_returnflag stands in as the 3-value mode attribute) and no
    * commit/receipt dates (the published "late" predicate
    * `l_receiptdate > l_commitdate` becomes shipped >90 days after
    * order). The priority CASE split is the published one verbatim.
    * All-integer counts — no rounding policy needed; the sums are CAST
    * BIGINT on both sides (DuckDB sums int to HUGEINT). */
  private def q12Body(p: String): String =
    s"""SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM ${p}orders, ${p}lineitem
       WHERE o_orderkey = l_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 90 DAY
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  /** q88 — TPC-H Q12 as SQL TEXT through `spark.sql`. Scale shape: one
    * fact⋈fact equi-join on the order key (the only shuffle), the late
    * predicate evaluates post-join (it references both sides), 3-row
    * output. */
  def q88TpchQ12(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q12_$t"))
    s.sql(q12Body("graft_q12_"))
  }

  val q88Sql: String = q12Body("")

  /** The Q18 body (large-volume customers). `l_quantity` is integral
    * (1..50) in this testdata, so the whole query runs in exact BIGINT —
    * the HAVING threshold compares integers on both engines (no
    * double-sum boundary hazard). Threshold lowered from the published
    * 300 to 250 (this catalog's max order size is ~460). `o_orderkey`
    * is in the group key, so it is the total-order tiebreak. */
  private def q18Body(p: String): String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM ${p}customer, ${p}orders, ${p}lineitem
       WHERE o_orderkey IN (
           SELECT l_orderkey FROM ${p}lineitem
           GROUP BY l_orderkey
           HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
       LIMIT 100"""

  /** q89 — TPC-H Q18 as SQL TEXT through `spark.sql`. Scale shape: the
    * HAVING subquery is a semi-join filter on the order key (aggregated
    * once, then joined — Spark plans it as an aggregate + semi join, no
    * correlated re-execution), customer broadcasts against the surviving
    * orders, top-100 via TakeOrdered. */
  def q89TpchQ18(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q18_$t"))
    s.sql(q18Body("graft_q18_"))
  }

  val q89Sql: String = q18Body("")

  /** The Q13 body (customer order-count distribution): customers LEFT
    * OUTER JOIN orders, per-customer order count, then the histogram of
    * counts — the classic "distribution of engagement" shape whose outer
    * join must keep zero-order customers. This catalog has no o_comment,
    * so the published NOT-LIKE exclusion is dropped (documented
    * deviation). All-integer; `c_count` is unique per output row, so the
    * DESC pair is a total order. */
  private def q13Body(p: String): String =
    s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             FROM ${p}customer LEFT OUTER JOIN ${p}orders
               ON c_custkey = o_custkey
             GROUP BY c_custkey) c_orders
       GROUP BY c_count
       ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST"""

  /** q93 — TPC-H Q13 as SQL TEXT through `spark.sql`. Scale shape: the
    * outer join shuffles once on the customer key (or broadcasts the
    * customer side), both aggregations are partial+final. */
  def q93TpchQ13(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q13_$t"))
    s.sql(q13Body("graft_q13_"))
  }

  val q93Sql: String = q13Body("")

  /** The Q19 body (discounted revenue under disjunctive brand/size/
    * quantity bands) — the OR-of-ANDs predicate is the point: Catalyst
    * must extract the common `p_partkey = l_partkey` join key, push the
    * disjunction's common sub-predicates, and still broadcast the part
    * side. Deviations: this catalog has no p_container (p_type's 6 plain
    * values stand in) and no l_shipmode/l_shipinstruct (those conjuncts
    * dropped). */
  private def q19Body(rev: String, p: String): String =
    s"""SELECT $rev AS revenue
       FROM ${p}lineitem, ${p}part
       WHERE p_partkey = l_partkey AND (
            (p_brand = 'Brand#1' AND p_type = 'SMALL'
              AND l_quantity >= 1 AND l_quantity <= 11
              AND p_size BETWEEN 1 AND 15)
         OR (p_brand = 'Brand#2' AND p_type = 'MEDIUM'
              AND l_quantity >= 10 AND l_quantity <= 20
              AND p_size BETWEEN 1 AND 25)
         OR (p_brand = 'Brand#3' AND p_type = 'LARGE'
              AND l_quantity >= 20 AND l_quantity <= 30
              AND p_size BETWEEN 1 AND 35))
       ORDER BY revenue"""

  /** q94 — TPC-H Q19 as SQL TEXT through `spark.sql`. */
  def q94TpchQ19(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q19_$t"))
    s.sql(q19Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q19_"))
  }

  val q94Sql: String =
    q19Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  // --- q95/q96/q97: TPC-H's correlated-subquery tier (Q21, Q17, Q22) ----------

  /** The Q21 body (suppliers who kept orders waiting) — the hardest
    * decorrelation shape in TPC-H: a correlated EXISTS (another supplier
    * contributed to the order) nested next to a correlated NOT EXISTS
    * (no OTHER supplier was late on it), both over the same fact table.
    * Deviations forced by this catalog, documented: there are no
    * commit/receipt dates, so "kept waiting" = shipped >90 days after
    * the order date (the q88 convention) — note l3's lateness correlates
    * on BOTH l1.l_orderkey (equi) and o_orderdate (non-equi), which is
    * exactly the mixed-condition existence join the optimizer must
    * build; the published single-nation filter widens to the ASIA
    * region (sf0.001 has only 10 suppliers spread over 10 nations — a
    * single nation is empty there). All-integer counts; `s_name` is the
    * group key, so (numwait DESC, s_name) is a total order. */
  private def q21Body(p: String): String =
    s"""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM ${p}supplier, ${p}lineitem l1, ${p}orders, ${p}nation, ${p}region
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
         AND EXISTS (SELECT * FROM ${p}lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT * FROM ${p}lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
       GROUP BY s_name
       ORDER BY numwait DESC NULLS LAST, s_name
       LIMIT 100"""

  /** q95 — TPC-H Q21 as SQL TEXT through `spark.sql`. Scale shape: both
    * existence subqueries decorrelate to join-based semi/anti joins on
    * the order key (no per-row re-execution — the plan must show no
    * CartesianProduct); the l3 anti join carries the non-equi
    * o_orderdate condition alongside the equi key; region/nation/
    * supplier broadcast. */
  def q95TpchQ21(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q21_$t"))
    s.sql(q21Body("graft_q21_"))
  }

  val q95Sql: String = q21Body("")

  /** The Q17 body (small-quantity-order revenue) — the correlated SCALAR
    * subquery shape: each part's lineitems compare against 0.2× that
    * part's own average quantity. Deviations: p_container → p_type (this
    * catalog's 6-value container stand-in); the /7.0 "yearly" divisor is
    * kept from the published text. Numeric policy: l_quantity is
    * integral-valued (1..50), so avg(l_quantity) = exact-sum/count is
    * order-independent in both engines and the 0.2× threshold compares
    * bit-identically; the revenue sum rides the decimal-sum path. */
  private def q17Body(rev: String, p: String): String =
    s"""SELECT $rev AS avg_yearly
       FROM ${p}lineitem, ${p}part
       WHERE p_partkey = l_partkey
         AND p_brand = 'Brand#4' AND p_type = 'LARGE'
         AND l_quantity < 0.2 * (SELECT avg(l_quantity)
                                 FROM ${p}lineitem l2
                                 WHERE l2.l_partkey = p_partkey)
       ORDER BY avg_yearly"""

  /** q96 — TPC-H Q17 as SQL TEXT through `spark.sql`. Scale shape: the
    * correlated scalar subquery decorrelates to ONE per-part aggregate
    * of lineitem joined back on the part key (no per-row re-execution);
    * the brand/type-filtered part side broadcasts into both the fact
    * join and the aggregate join. */
  def q96TpchQ17(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q17_$t"))
    s.sql(q17Body(
      s"CAST(${rSql(s"${dsumSql("l_extendedprice")} / 7.0", 2)} AS DOUBLE)",
      "graft_q17_"))
  }

  val q96Sql: String =
    q17Body(rSql(s"${dsumSql("l_extendedprice")} / 7.0", 2), "")

  /** The Q22 body (global sales opportunity) — an uncorrelated scalar
    * threshold (above-average positive account balance) plus a
    * correlated NOT EXISTS anti join. Deviations: this catalog has no
    * c_phone, so the published country-code prefix becomes the
    * market-segment trio (the catalog's only customer partitioning
    * attribute); "has no orders" (always empty here — every customer
    * ordered) becomes "no orders since 1999-01-01", i.e. lapsed
    * customers, which keeps the anti join load-bearing at every scale.
    * The scalar threshold is the order-independent decimal avg — an
    * unrounded double gate is safe because both engines compute the
    * identical exact-sum/count value. `cntrycode` is the group key →
    * total order. */
  private def q22Body(tot: String, p: String): String =
    s"""SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust, $tot AS totacctbal
       FROM (SELECT c_mktsegment AS cntrycode, c_acctbal
             FROM ${p}customer
             WHERE c_mktsegment IN ('MACHINERY', 'HOUSEHOLD', 'FURNITURE')
               AND c_acctbal > (SELECT ${davgSql("c_acctbal")}
                                FROM ${p}customer
                                WHERE c_acctbal > 0.0
                                  AND c_mktsegment IN ('MACHINERY', 'HOUSEHOLD', 'FURNITURE'))
               AND NOT EXISTS (SELECT * FROM ${p}orders
                               WHERE o_custkey = c_custkey
                                 AND o_orderdate >= CAST('1999-01-01' AS TIMESTAMP))) custsale
       GROUP BY cntrycode
       ORDER BY cntrycode"""

  /** q97 — TPC-H Q22 as SQL TEXT through `spark.sql`. Scale shape: the
    * scalar average is ONE 1-row broadcast aggregate; NOT EXISTS
    * decorrelates to a left-anti join of customer against the
    * date-filtered orders (the filter pushes below the anti join);
    * 3-row output. */
  def q97TpchQ22(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q22_$t"))
    s.sql(q22Body(
      s"CAST(${rsumSql("c_acctbal", 2)} AS DOUBLE)",
      "graft_q22_"))
  }

  val q97Sql: String = q22Body(rsumSql("c_acctbal", 2), "")

  // --- q99: TPC-H Q4 (order-priority checking) ---------------------------------

  /** The Q4 body — the plain correlated-EXISTS shape (Q21's simpler
    * sibling; together they cover semi + anti existence joins): orders in
    * one quarter having at least one late lineitem, counted by priority.
    * Deviations: no commit/receipt dates, so "late" = shipped >90 days
    * after the order date (the q88/q95 convention — the EXISTS correlates
    * on the order key AND the outer o_orderdate); quarter moved into this
    * catalog's span. All-integer counts; the 5-value priority is the
    * group key → total order. */
  private def q4Body(p: String): String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM ${p}orders
       WHERE o_orderdate >= CAST('1996-07-01' AS TIMESTAMP)
         AND o_orderdate < CAST('1996-10-01' AS TIMESTAMP)
         AND EXISTS (SELECT * FROM ${p}lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** q99 — TPC-H Q4 as SQL TEXT through `spark.sql`. Scale shape: the
    * EXISTS decorrelates to a LeftSemi join on the order key carrying the
    * non-equi date condition; the quarter filter pushes to the orders
    * scan and bounds the semi join's probe side. */
  def q99TpchQ4(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q4_$t"))
    s.sql(q4Body("graft_q4_"))
  }

  val q99Sql: String = q4Body("")

  // --- q100: NOT IN → null-aware anti join -------------------------------------

  /** The NOT-IN body (parts never returned in bulk — TPC-H Q16's
    * `NOT IN` shape on this catalog): SQL's three-valued NOT IN is NOT a
    * plain anti join — one NULL in the subquery empties the result, and a
    * NULL probe never qualifies — so the optimizer must plan the
    * null-aware variant. Both engines implement the same standard
    * semantics, so the text is shared verbatim. `p_partkey` is unique →
    * total order. */
  private def notInBody(p: String): String =
    s"""SELECT p_partkey, p_brand, p_type
       FROM ${p}part
       WHERE p_partkey NOT IN (SELECT l_partkey FROM ${p}lineitem
                               WHERE l_returnflag = 'R' AND l_quantity >= 40)
       ORDER BY p_partkey"""

  /** q100 — NOT IN through `spark.sql`: the one existence-join variant
    * the TPC-H tier hadn't exercised. Scale shape: Spark's
    * `optimizeNullAwareAntiJoin` plans a single-column NOT IN as a
    * broadcast null-aware anti hash join (NAAJ) — the returned-parts set
    * builds once and broadcasts; without the rewrite this is a
    * BroadcastNestedLoopJoin, quadratic at scale. The plan is pinned in
    * PlanShapeSpec. */
  def q100NullAwareAnti(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_nin_$t"))
    s.sql(notInBody("graft_nin_"))
  }

  val q100Sql: String = notInBody("")

  // --- q101-q104: TPC-H Q14, Q15, Q7, Q8 ---------------------------------------
  // With these, every TPC-H query expressible on this catalog is covered:
  // Q1 (q01's DSL twin), Q3-Q8, Q10, Q12-Q15, Q17-Q19, Q21, Q22 — 17 of 22.
  // The other five (Q2, Q9, Q11, Q16, Q20) all require the PARTSUPP table
  // (ps_supplycost / ps_availqty), which this testdata does not ship —
  // documented impossibility, not a coverage gap.

  /** The Q14 body (promotion-effect revenue share): one month's revenue
    * share of PROMO-typed parts. This catalog's p_type IS the 6-value
    * promo attribute (exact 'PROMO' value — no LIKE needed); month moved
    * into the data span. Both decimal sums are order-independent; the
    * ratio and ×100 are pure IEEE. */
  private def q14Body(share: String, p: String): String =
    s"""SELECT $share AS promo_revenue
       FROM ${p}lineitem, ${p}part
       WHERE l_partkey = p_partkey
         AND l_shipdate >= CAST('1996-09-01' AS TIMESTAMP)
         AND l_shipdate < CAST('1996-10-01' AS TIMESTAMP)
       ORDER BY promo_revenue"""

  private val q14Share = rSql(
    s"""100.0 * ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
        / ${dsumSql("l_extendedprice * (1 - l_discount)")}""", 6)

  /** q101 — TPC-H Q14 as SQL TEXT through `spark.sql`. Scale shape: the
    * month filter prunes the fact scan, part broadcasts, one ungrouped
    * partial+final aggregate. */
  def q101TpchQ14(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q14_$t"))
    s.sql(q14Body(s"CAST($q14Share AS DOUBLE)", "graft_q14_"))
  }

  val q101Sql: String = q14Body(q14Share, "")

  /** The Q15 body (top supplier): the published revenue VIEW becomes a
    * CTE; the max is an uncorrelated scalar subquery over it. Per-supplier
    * revenue is the ROUNDED decimal sum, so the max-equality join compares
    * identical doubles in both engines (ties would return every tied
    * supplier — s_suppkey keeps the order total). Quarter moved into the
    * data span; this catalog has no s_address/s_phone. */
  private def q15Body(rev: String, p: String): String =
    s"""WITH revenue AS (SELECT l_suppkey AS supplier_no, $rev AS total_revenue
         FROM ${p}lineitem
         WHERE l_shipdate >= CAST('1996-07-01' AS TIMESTAMP)
           AND l_shipdate < CAST('1996-10-01' AS TIMESTAMP)
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM ${p}supplier, revenue
       WHERE s_suppkey = supplier_no
         AND total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s_suppkey"""

  /** q102 — TPC-H Q15 as SQL TEXT through `spark.sql`. Scale shape: ONE
    * per-supplier aggregate feeds both the scalar max (1-row broadcast)
    * and the equality filter; supplier broadcasts against the 1-row
    * survivor set. */
  def q102TpchQ15(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "supplier")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q15_$t"))
    s.sql(q15Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q15_"))
  }

  val q102Sql: String =
    q15Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  /** The Q7 body (volume shipping between two trade partners): revenue by
    * (supplier side, customer side, ship year) for both directions of one
    * trade lane. Deviation: the published NATION pair widens to the
    * ASIA↔EUROPE REGION pair (sf0.001 has 10 suppliers across 10 nations —
    * any single nation pair is empty there; the q95 precedent). Year is
    * CAST BIGINT on both engines. */
  private def q7Body(rev: String, p: String): String =
    s"""SELECT supp_region, cust_region, l_year, $rev AS revenue
       FROM (SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice, l_discount
             FROM ${p}supplier, ${p}lineitem, ${p}orders, ${p}customer,
               ${p}nation n1, ${p}nation n2, ${p}region r1, ${p}region r2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND n1.n_regionkey = r1.r_regionkey
               AND n2.n_regionkey = r2.r_regionkey
               AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
                 OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
               AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
               AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP)) shipping
       GROUP BY supp_region, cust_region, l_year
       ORDER BY supp_region, cust_region, l_year"""

  /** q103 — TPC-H Q7 as SQL TEXT through `spark.sql`. Scale shape: the
    * region/nation dimension chain broadcasts down both sides, the
    * disjunctive lane filter evaluates post-join on broadcast columns,
    * orders⋈lineitem carries the one fact shuffle, 4-row output. */
  def q103TpchQ7(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "customer", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q7_$t"))
    s.sql(q7Body(
      s"CAST(${rsumSql("l_extendedprice * (1 - l_discount)", 2)} AS DOUBLE)",
      "graft_q7_"))
  }

  val q103Sql: String =
    q7Body(rsumSql("l_extendedprice * (1 - l_discount)", 2), "")

  /** The Q8 body (national market share): one nation's share of a
    * region's revenue in one part type, by order year. The share is a
    * conditional-decimal-sum over total-decimal-sum ratio — both
    * order-independent, the ratio pure IEEE. Deviations: p_type stands in
    * for the published p_type ('STANDARD'), window moved into the span.
    * NATION_12 is an ASIA supplier nation present at every scale. */
  private def q8Body(share: String, p: String): String =
    s"""SELECT o_year, $share AS mkt_share
       FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice, l_discount, n2.n_name AS nation
             FROM ${p}part, ${p}supplier, ${p}lineitem, ${p}orders,
               ${p}customer, ${p}nation n1, ${p}nation n2, ${p}region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey
               AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
               AND s_nationkey = n2.n_nationkey
               AND o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
               AND o_orderdate < CAST('1998-01-01' AS TIMESTAMP)
               AND p_type = 'STANDARD') all_nations
       GROUP BY o_year
       ORDER BY o_year"""

  private val q8Share = rSql(
    s"""${dsumSql("CASE WHEN nation = 'NATION_12' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
        / ${dsumSql("l_extendedprice * (1 - l_discount)")}""", 6)

  /** q104 — TPC-H Q8 as SQL TEXT through `spark.sql`. Scale shape: same
    * broadcast-dimension star as q103 plus the part filter pruning the
    * fact side before its join; 2-row output. */
  def q104TpchQ8(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q8_$t"))
    s.sql(q8Body(s"CAST($q8Share AS DOUBLE)", "graft_q8_"))
  }

  val q104Sql: String = q8Body(q8Share, "")

  // --- q98: TPC-H Q6 over CATALOG-qualified names ------------------------------

  /** q98 — TPC-H Q6 resolved by NAME through the `graft` DSv2 catalog
    * ([[graft.sources.GraftCatalog]]): `FROM graft.sf.lineitem`, ZERO
    * temp-view prep — the analyzer asks the catalog plugin for the table,
    * which serves Spark's own parquet connector. Same text as q87
    * otherwise, so the two keys differentially pin that catalog
    * resolution changes nothing about the result or the plan (pushed
    * shipdate/discount/quantity filters, one partial-agg exchange).
    * The catalog re-reads its namespace dir from the session conf on
    * every resolution, so re-pointing `...ns.sf` re-targets the scale. */
  def q98CatalogQ6(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.ns.sf", dir)
    s.sql(q6Body(
      s"CAST(${rsumSql("l_extendedprice * l_discount", 2)} AS DOUBLE)",
      "graft.sf."))
  }

  val q98Sql: String = q87Sql

  // --- q105: catalog FUNCTION resolution ----------------------------------------

  /** q105 — a catalog FUNCTION under the differential:
    * `graft.fns.h60(…)` ([[graft.sources.GraftCatalog]]'s FunctionCatalog,
    * the V2 function API with the no-boxing `invoke` magic method)
    * resolved by NAME inside SQL text over a catalog-resolved table —
    * zero temp views, zero session UDF registration. The oracle is
    * h60's DuckDB twin, so the function's cross-engine hash parity is
    * hash-checked end-to-end, not just spec-asserted. Scale shape: one
    * scan-local projection. */
  def q105CatalogFn(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.ns.sf", dir)
    s.sql("""SELECT doc_id, graft.fns.h60(CAST(doc_id AS STRING)) % 10 AS h
             FROM graft.sf.documents ORDER BY doc_id""")
  }

  val q105Sql: String =
    s"""SELECT doc_id, ${DedupLsh.h60Sql("CAST(doc_id AS VARCHAR)")} % 10 AS h
       FROM documents ORDER BY doc_id"""

  /** q112 — DSv2 catalog AGGREGATE function (r11:
    * [[graft.sources.GraftDsumFunction]], the
    * `connector.catalog.functions.AggregateFunction` tier next to q105's
    * ScalarFunction): the pricing-summary shape runs its sums through
    * `graft.fns.dsum` resolved BY NAME from the catalog — Spark plans it
    * as a V2Aggregator with partial `update` map-side and `merge` at the
    * exchange, and the oracle recomputes with `Num.dsumSql`'s
    * decimal(38,10) text. The function IS `Num.dsum` (exact decimal
    * accumulation, order-independent), so the hash check proves the V2
    * aggregate path delivers the policy sum bit-for-bit.
    *
    * Scale shape: identical to any built-in sum — map-side partials,
    * one exchange on the group keys, O(1) state per group. */
  def q112CatalogAgg(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.ns.sf", dir)
    // the V2 aggregate returns the RAW double of the exact decimal sum;
    // the final decimal→double conversion is the one step the two
    // engines disagree on by an ulp (invariant 1 — the reason every
    // reporting sum is a ROUNDED rsum), so the policy rounding applies
    // on top exactly as it does over Num.dsum
    s.sql("""SELECT l_returnflag, l_linestatus,
               graft.fns.dsum(l_quantity) AS sq,
               graft.fns.dsum(l_extendedprice) AS sp,
               count(*) AS n
             FROM graft.sf.lineitem
             GROUP BY l_returnflag, l_linestatus""")
      .select(col("l_returnflag"), col("l_linestatus"),
        Num.r(col("sq"), 4).as("sum_qty"), Num.r(col("sp"), 4).as("sum_price"),
        col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q112Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
         ${Num.rsumSql("l_quantity", 4)} AS sum_qty,
         ${Num.rsumSql("l_extendedprice", 4)} AS sum_price,
         count(*) AS n
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --- q106-q110: TPC-H's PARTSUPP tier over a DERIVED partsupp ----------------
  //
  // The five remaining TPC-H queries (Q2, Q9, Q11, Q16, Q20) all read the
  // PARTSUPP table, which this testdata does not ship. Rather than leave
  // the tier unimplemented, partsupp is DERIVED deterministically from the
  // facts the catalog does have: the observed (l_partkey, l_suppkey)
  // relationships in lineitem become the part-supplier rows (every
  // lineitem therefore joins to exactly one partsupp row, as in dbgen),
  // and the two synthetic attributes are integer hash mixes of the key
  // pair — ps_availqty in dbgen's 1..9999 range and the supply cost as
  // INTEGER CENTS (ps_costc, $1.00..$1000.00) so every min/sum/compare
  // stays in exact integer arithmetic (the Num policy applied at the
  // data-generation layer). The identical CTE text runs in both engines,
  // so the derivation itself is under the differential. Documented
  // deviation, not a drop-in dbgen clone; with it, all 22 TPC-H queries
  // run on this catalog.
  //
  // Scale shape of the derivation: one DISTINCT over the fact's key pair
  // (a single shuffle, map-side combinable) followed by scan-local
  // arithmetic — at 100 TB this is the standard build-a-dimension pass,
  // and every consumer below joins it on its own key.

  private def psCteSql(p: String): String =
    s"""partsupp AS (
         SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                CAST(1 + (l_partkey * 419 + l_suppkey * 721) % 9999 AS BIGINT) AS ps_availqty,
                CAST(100 + (l_partkey * 7919 + l_suppkey * 104729) % 99901 AS BIGINT) AS ps_costc
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM ${p}lineitem) ps0)"""

  /** The Q2 body (minimum-cost supplier): for each qualifying part, the
    * EUROPE suppliers achieving that part's region-wide MINIMUM supply
    * cost — the classic correlated scalar subquery whose body is itself
    * a 4-table join. Deviations: partsupp derived (see [[psCteSql]]);
    * p_type = 'STANDARD' + p_size ≤ 25 stand in for the published
    * type/size pair (this catalog's p_type has 6 plain values); no
    * s_address/s_phone/s_comment columns exist to project. The min and
    * the equality ride integer cents — no double compare anywhere.
    * (ps_partkey, ps_suppkey) is unique in partsupp, so the appended
    * (p_partkey, s_suppkey) pair makes the published sort a total order. */
  private def q2Body(p: String): String =
    s"""WITH ${psCteSql(p)}
       SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
              CAST(ps_costc AS DOUBLE) / 100.0 AS ps_supplycost
       FROM ${p}part, ${p}supplier, partsupp, ${p}nation, ${p}region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_size <= 25 AND p_type = 'STANDARD'
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND ps_costc = (SELECT min(ps2.ps_costc)
                         FROM partsupp ps2, ${p}supplier s2, ${p}nation n2, ${p}region r2
                         WHERE p_partkey = ps2.ps_partkey
                           AND s2.s_suppkey = ps2.ps_suppkey
                           AND s2.s_nationkey = n2.n_nationkey
                           AND n2.n_regionkey = r2.r_regionkey
                           AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC NULLS LAST, n_name, s_name, p_partkey, s_suppkey
       LIMIT 100"""

  /** q106 — TPC-H Q2 as SQL TEXT through `spark.sql`. Scale shape: the
    * correlated scalar min decorrelates to ONE per-part aggregate of the
    * region-filtered partsupp joined back on the part key (no per-row
    * re-execution); region/nation/supplier broadcast into both branches;
    * top-100 via TakeOrdered. */
  def q106TpchQ2(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q2_$t"))
    s.sql(q2Body("graft_q2_"))
  }

  val q106Sql: String = q2Body("")

  /** The Q9 body (product-type profit measure): profit = revenue minus
    * supply cost, by supplier nation and order year, over parts whose
    * name carries one adjective. Deviations: partsupp derived — and
    * because it is derived FROM lineitem's key pairs, every lineitem
    * matches exactly one partsupp row, preserving dbgen's join
    * cardinality; 'red' stands in for the published '%green%'. The
    * per-row amount is pure IEEE; the group sum rides the decimal path.
    * (nation, o_year) is the group key → total order. */
  private def q9Body(profit: String, p: String): String =
    s"""WITH ${psCteSql(p)}
       SELECT nation, o_year, $profit AS sum_profit
       FROM (SELECT n_name AS nation,
                    CAST(year(o_orderdate) AS BIGINT) AS o_year,
                    l_extendedprice * (1 - l_discount)
                      - (CAST(ps_costc AS DOUBLE) / 100.0) * l_quantity AS amount
             FROM ${p}part, ${p}supplier, ${p}lineitem, partsupp, ${p}orders, ${p}nation
             WHERE s_suppkey = l_suppkey
               AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
               AND p_partkey = l_partkey AND o_orderkey = l_orderkey
               AND s_nationkey = n_nationkey
               AND p_name LIKE '%red%') profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC NULLS LAST"""

  /** q107 — TPC-H Q9 as SQL TEXT through `spark.sql` — the widest join
    * tree in the suite (6 tables informing one fact scan). Scale shape:
    * part/supplier/nation broadcast; partsupp co-shuffles with lineitem
    * on (partkey, suppkey) — or broadcasts below its threshold; orders
    * joins on the order key; ONE partial+final group aggregate. */
  def q107TpchQ9(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "nation")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q9_$t"))
    s.sql(q9Body(s"CAST(${rsumSql("amount", 2)} AS DOUBLE)", "graft_q9_"))
  }

  val q107Sql: String = q9Body(rsumSql("amount", 2), "")

  /** The Q11 body (important stock identification): per-part stock value
    * held by one region's suppliers, kept where the part's value exceeds
    * a fixed fraction of the regional total. Deviations: partsupp
    * derived; the published single nation widens to the EUROPE region
    * (the q95 convention — one nation holds ≤1 supplier at sf0.001) and
    * the published 0.0001/SF fraction — tuned to dbgen volumes, and
    * scale-VARIANT (at sf0.1 no part reaches 1/10000 of the regional
    * total) — becomes "above 2× the mean part value", the
    * scale-invariant reading of the same intent. Everything up to the
    * displayed value is exact BIGINT — the comparison is
    * `cv * count > 2 * total`, integer on both sides; the display
    * division is exact-in-double (cv < 2^53).
    * `ps_partkey` is unique per output row → total order. */
  private def q11Body(p: String): String =
    s"""WITH ${psCteSql(p)},
         esup AS (SELECT s_suppkey FROM ${p}supplier, ${p}nation, ${p}region
                  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                    AND r_name = 'EUROPE'),
         pv AS (SELECT ps_partkey,
                       CAST(sum(ps_costc * ps_availqty) AS BIGINT) AS cv
                FROM partsupp, esup
                WHERE ps_suppkey = s_suppkey
                GROUP BY ps_partkey)
       SELECT ps_partkey, CAST(cv AS DOUBLE) / 100.0 AS value
       FROM pv
       WHERE cv * (SELECT CAST(count(*) AS BIGINT) FROM pv)
               > 2 * (SELECT sum(cv) FROM pv)
       ORDER BY value DESC NULLS LAST, ps_partkey"""

  /** q108 — TPC-H Q11 as SQL TEXT through `spark.sql`. Scale shape: the
    * region's supplier set broadcasts as a semi-join filter into the
    * partsupp scan; ONE per-part aggregate feeds both the scalar total
    * (1-row broadcast) and the filtered output — Spark materializes the
    * CTE once per consumer, each a partial+final aggregate over the
    * filtered partsupp, no re-derivation of the base. */
  def q108TpchQ11(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q11_$t"))
    s.sql(q11Body("graft_q11_"))
  }

  val q108Sql: String = q11Body("")

  /** The Q16 body (parts/supplier relationship): distinct supplier count
    * per (brand, type, size) over parts not matching an exclusion, with
    * the published NOT IN over flagged suppliers. Deviations: partsupp
    * derived; there is no s_comment, so "customer complaints" becomes
    * the negative-account-balance suppliers (6 exist at sf0.01 — the
    * NOT IN stays load-bearing); brand/type exclusions use this
    * catalog's values; the published 8-value size list keeps its shape.
    * All-integer output; the full group key appended to the count makes
    * the published sort a total order. */
  private def q16Body(p: String): String =
    s"""WITH ${psCteSql(p)}
       SELECT p_brand, p_type, p_size,
              CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       FROM partsupp, ${p}part
       WHERE p_partkey = ps_partkey
         AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         AND p_size IN (1, 2, 4, 9, 16, 25, 36, 49)
         AND ps_suppkey NOT IN (SELECT s_suppkey FROM ${p}supplier
                                WHERE s_acctbal < 0.0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC NULLS LAST, p_brand, p_type, p_size"""

  /** q109 — TPC-H Q16 as SQL TEXT through `spark.sql`. Scale shape: part
    * broadcasts into the partsupp scan with brand/type/size pushed; the
    * NOT IN plans as a broadcast null-aware anti join (the q100 shape);
    * the distinct-count aggregate expands (partial distinct, then
    * count) — two exchanges total. */
  def q109TpchQ16(s: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "lineitem")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q16_$t"))
    s.sql(q16Body("graft_q16_"))
  }

  val q109Sql: String = q16Body("")

  /** The Q20 body (potential part promotion): suppliers in one region
    * holding MORE of some matching part than half of what they shipped
    * of it in one year — IN-subquery nesting with a correlated scalar
    * aggregate at the bottom, TPC-H's deepest nesting. Deviations:
    * partsupp derived; 'red%' stands in for 'forest%'; the published
    * single nation widens to the EUROPE region; the year window sits in
    * this catalog's span. The threshold compare is exact on both sides:
    * availqty×2 is integer-in-double, the shipped quantity is the
    * order-independent decimal sum (pairs with NO shipments in the year
    * compare against NULL and drop, as in the published semantics).
    * `s_suppkey` is unique → total order. */
  private def q20Body(p: String): String =
    s"""WITH ${psCteSql(p)}
       SELECT s_suppkey, s_name
       FROM ${p}supplier, ${p}nation, ${p}region
       WHERE s_suppkey IN (
           SELECT ps_suppkey FROM partsupp
           WHERE ps_partkey IN (SELECT p_partkey FROM ${p}part
                                WHERE p_name LIKE 'red%')
             AND CAST(ps_availqty AS DOUBLE) * 2.0 >
                 (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)
                  FROM ${p}lineitem
                  WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                    AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
                    AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP)))
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
       ORDER BY s_suppkey"""

  /** q110 — TPC-H Q20 as SQL TEXT through `spark.sql`. Scale shape: the
    * correlated scalar sum decorrelates to ONE per-(partkey, suppkey)
    * aggregate of the year-filtered lineitem joined back to partsupp;
    * the part-name IN is a broadcast semi join; the outer IN is a
    * LeftSemi on the supplier key; region/nation broadcast. With q95
    * (EXISTS/NOT EXISTS), q96 (correlated scalar), q97 (scalar-in-scan),
    * and q100 (null-aware NOT IN), this completes every subquery
    * decorrelation shape TPC-H exercises — and completes the suite:
    * all 22 queries run on this catalog. */
  def q110TpchQ20(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "part", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q20_$t"))
    s.sql(q20Body("graft_q20_"))
  }

  val q110Sql: String = q20Body("")

  // --- q92: data-quality expectation report -----------------------------------

  /** q92 — a declarative data-quality expectation suite (the
    * Great-Expectations/dbt-test shape; the platform-side generalization
    * of the reference's per-record quality thresholds,
    * `realtime_inference.py:100-118`): ten checks across five tables —
    * primary-key uniqueness, range/sign assertions, referential
    * integrity, temporal bounds, derived-column consistency — each
    * reported as (table, check, rows, violations, share, pass). NULL in a
    * checked column counts as a violation (the good-predicate is
    * three-valued; only TRUE passes).
    *
    * Scale shape: every value check is ONE scan-local conditional count
    * (map-side combinable — a 100 TB table costs one pass per CHECKED
    * TABLE, not per check, once Spark shares the scan); the two
    * referential checks are anti-join counts (customer broadcasts;
    * lineitem⋈orders rides the standard fact-key shuffle). The report
    * itself is 10 rows. */
  def q92DqReport(s: SparkSession, dir: String): DataFrame =
    dqReport(Tables(s, dir, "customer"), Tables(s, dir, "orders"),
      Tables(s, dir, "lineitem"), Tables.events(s, dir),
      Tables.documents(s, dir))

  /** q92's core over explicit frames — exposed so the spec can plant a
    * duplicate key, an orphan row, a NULL metric, and range violations. */
  private[graft] def dqReport(cust: DataFrame, ord: DataFrame, li: DataFrame,
      ev: DataFrame, docs: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    // good is three-valued: NULL is NOT good → violation
    def viol(df: DataFrame, tbl: String, chk: String, good: Column) =
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(good, 0L).otherwise(1L)).as("n_viol"))
        .select(lit(tbl).as("tbl"), lit(chk).as("chk"), $"n_rows", $"n_viol")
    def fk(child: DataFrame, tbl: String, chk: String, key: Column,
        parent: DataFrame, pkey: Column) =
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(child.join(parent, key === pkey, "left_anti")
          .agg(count(lit(1)).as("n_viol")))
        .select(lit(tbl).as("tbl"), lit(chk).as("chk"), $"n_rows", $"n_viol")
    val checks = Seq(
      cust.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - countDistinct($"c_custkey")).as("n_viol"))
        .select(lit("customer").as("tbl"), lit("pk_unique").as("chk"),
          $"n_rows", $"n_viol"),
      viol(ord, "orders", "totalprice_positive", $"o_totalprice" > 0),
      viol(ord, "orders", "orderdate_in_range",
        $"o_orderdate" >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          $"o_orderdate" < lit("2002-01-01 00:00:00").cast("timestamp")),
      fk(ord, "orders", "fk_customer", $"o_custkey", cust, $"c_custkey"),
      viol(li, "lineitem", "quantity_in_range",
        $"l_quantity" >= 1 && $"l_quantity" <= 50),
      viol(li, "lineitem", "discount_in_range",
        $"l_discount" >= 0 && $"l_discount" <= 0.5),
      fk(li, "lineitem", "fk_orders", $"l_orderkey", ord, $"o_orderkey"),
      viol(ev, "events", "ts_in_range",
        $"ts" >= lit("2024-01-01 00:00:00").cast("timestamp") &&
          $"ts" < lit("2024-02-01 00:00:00").cast("timestamp")),
      viol(ev, "events", "user_not_null", $"user_id".isNotNull),
      viol(docs, "documents", "chars_consistent", $"n_chars" === length($"text")))
    checks.reduce(_ union _)
      .select($"tbl", $"chk", $"n_rows", $"n_viol",
        r($"n_viol".cast("double") / $"n_rows", 6).as("viol_share"),
        when($"n_viol" === 0, 1).otherwise(0).as("pass"))
      .orderBy($"tbl", $"chk")
  }

  val q92Sql: String = {
    def v(tbl: String, chk: String, good: String) =
      s"""SELECT '$tbl' AS tbl, '$chk' AS chk,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN $good THEN 0 ELSE 1 END) AS BIGINT) AS n_viol
         FROM $tbl"""
    s"""SELECT tbl, chk, n_rows, n_viol,
         ${rSql("CAST(n_viol AS DOUBLE) / n_rows", 6)} AS viol_share,
         CASE WHEN n_viol = 0 THEN 1 ELSE 0 END AS pass
       FROM (
         SELECT 'customer' AS tbl, 'pk_unique' AS chk,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_viol
         FROM customer
         UNION ALL ${v("orders", "totalprice_positive", "o_totalprice > 0")}
         UNION ALL ${v("orders", "orderdate_in_range",
           "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '2002-01-01 00:00:00'")}
         UNION ALL
         SELECT 'orders' AS tbl, 'fk_customer' AS chk,
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
              LEFT JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_custkey IS NULL) AS n_viol
         UNION ALL ${v("lineitem", "quantity_in_range",
           "l_quantity >= 1 AND l_quantity <= 50")}
         UNION ALL ${v("lineitem", "discount_in_range",
           "l_discount >= 0 AND l_discount <= 0.5")}
         UNION ALL
         SELECT 'lineitem' AS tbl, 'fk_orders' AS chk,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderkey IS NULL) AS n_viol
         UNION ALL ${v("events", "ts_in_range",
           "ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'")}
         UNION ALL ${v("events", "user_not_null", "user_id IS NOT NULL")}
         UNION ALL ${v("documents", "chars_consistent", "n_chars = length(text)")}
       ) checks
       ORDER BY tbl, chk"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_fuzzy_match" -> (q36FuzzyMatch _),
    "q84_tpch_q5" -> (q84TpchQ5 _),
    "q85_tpch_q3" -> (q85TpchQ3 _),
    "q86_tpch_q10" -> (q86TpchQ10 _),
    "q87_tpch_q6" -> (q87TpchQ6 _),
    "q88_tpch_q12" -> (q88TpchQ12 _),
    "q89_tpch_q18" -> (q89TpchQ18 _),
    "q92_dq_report" -> (q92DqReport _),
    "q93_tpch_q13" -> (q93TpchQ13 _),
    "q94_tpch_q19" -> (q94TpchQ19 _),
    "q95_tpch_q21" -> (q95TpchQ21 _),
    "q96_tpch_q17" -> (q96TpchQ17 _),
    "q97_tpch_q22" -> (q97TpchQ22 _),
    "q98_catalog_q6" -> (q98CatalogQ6 _),
    "q99_tpch_q4" -> (q99TpchQ4 _),
    "q100_null_aware_anti" -> (q100NullAwareAnti _),
    "q101_tpch_q14" -> (q101TpchQ14 _),
    "q102_tpch_q15" -> (q102TpchQ15 _),
    "q103_tpch_q7" -> (q103TpchQ7 _),
    "q104_tpch_q8" -> (q104TpchQ8 _),
    "q105_catalog_fn" -> (q105CatalogFn _),
    "q112_catalog_agg" -> (q112CatalogAgg _),
    "q106_tpch_q2" -> (q106TpchQ2 _),
    "q107_tpch_q9" -> (q107TpchQ9 _),
    "q108_tpch_q11" -> (q108TpchQ11 _),
    "q109_tpch_q16" -> (q109TpchQ16 _),
    "q110_tpch_q20" -> (q110TpchQ20 _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_topk" -> (q02FilterTopk _),
    "q03_revenue_topn" -> (q03RevenueTopN _),
    "q04_semi_join" -> (q04SemiJoin _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_brand_revenue" -> (q06BrandRevenue _),
    "q07_top_per_group" -> (q07TopPerGroup _),
    "q08_running_agg" -> (q08RunningAgg _),
    "q09_rollup" -> (q09Rollup _),
    "q10_cube" -> (q10Cube _),
    "q11_grouping_sets" -> (q11GroupingSets _),
    "q12_set_ops" -> (q12SetOps _),
    "q13_string_fns" -> (q13StringFns _),
    "q14_date_time" -> (q14DateTime _),
    "q15_math_fns" -> (q15MathFns _),
    "q16_distinct_agg" -> (q16DistinctAgg _),
    "q43_multi_distinct" -> (q43MultiDistinct _))

  val oracles: Map[String, String] = Map(
    "q36_fuzzy_match" -> q36Sql,
    "q84_tpch_q5" -> q84Sql,
    "q85_tpch_q3" -> q85Sql,
    "q86_tpch_q10" -> q86Sql,
    "q87_tpch_q6" -> q87Sql,
    "q88_tpch_q12" -> q88Sql,
    "q89_tpch_q18" -> q89Sql,
    "q92_dq_report" -> q92Sql,
    "q93_tpch_q13" -> q93Sql,
    "q94_tpch_q19" -> q94Sql,
    "q95_tpch_q21" -> q95Sql,
    "q96_tpch_q17" -> q96Sql,
    "q97_tpch_q22" -> q97Sql,
    "q98_catalog_q6" -> q98Sql,
    "q99_tpch_q4" -> q99Sql,
    "q100_null_aware_anti" -> q100Sql,
    "q101_tpch_q14" -> q101Sql,
    "q102_tpch_q15" -> q102Sql,
    "q103_tpch_q7" -> q103Sql,
    "q104_tpch_q8" -> q104Sql,
    "q105_catalog_fn" -> q105Sql,
    "q112_catalog_agg" -> q112Sql,
    "q106_tpch_q2" -> q106Sql,
    "q107_tpch_q9" -> q107Sql,
    "q108_tpch_q11" -> q108Sql,
    "q109_tpch_q16" -> q109Sql,
    "q110_tpch_q20" -> q110Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_topk" -> q02Sql,
    "q03_revenue_topn" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_brand_revenue" -> q06Sql,
    "q07_top_per_group" -> q07Sql,
    "q08_running_agg" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_cube" -> q10Sql,
    "q11_grouping_sets" -> q11Sql,
    "q12_set_ops" -> q12Sql,
    "q13_string_fns" -> q13Sql,
    "q14_date_time" -> q14Sql,
    "q15_math_fns" -> q15Sql,
    "q16_distinct_agg" -> q16Sql,
    "q43_multi_distinct" -> q43Sql)
}
