package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends GraftSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfTiny)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle with identical key set") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q01 aggregates match hand-computed values on sf0.001") {
    val row = Relational.q01PricingSummary(spark, sfTiny)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect()
    assert(row.length == 1)
    val li = Tables.lineitem(spark, sfTiny)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    val expected = li.agg(round(sum("l_quantity"), 2)).collect()(0).getDouble(0)
    assert(row(0).getAs[Double]("sum_qty") == expected)
    assert(row(0).getAs[Long]("count_order") == li.count())
  }

  test("q02 top-k is plans TakeOrderedAndProject, not a global sort") {
    val plan = Relational.q02FilterTopk(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q02 pushes filters into the parquet scan") {
    val plan = Relational.q02FilterTopk(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("l_shipdate")),
      plan.take(2000))
  }

  test("q03/q06 broadcast the dimension side") {
    Seq(Relational.q03RevenueTopN _, Relational.q06BrandRevenue _).foreach { q =>
      val plan = q(spark, sfTiny).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    }
  }

  test("q07 keeps at most 3 rows per customer, ranked correctly") {
    val df = Relational.q07TopPerGroup(spark, sfTiny)
    val maxPerCust = df.groupBy("o_custkey").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerCust <= 3)
    // rank 1 row per customer has the max totalprice for that customer
    val r1 = df.filter(col("rn") === 1).select("o_custkey", "o_totalprice")
    val mx = Tables.orders(spark, sfTiny).groupBy("o_custkey")
      .agg(max("o_totalprice").as("o_totalprice"))
    assert(r1.except(mx).count() == 0)
  }

  test("q09 rollup includes grand-total row equal to full sum") {
    val df = Relational.q09Rollup(spark, sfTiny)
    val total = df.filter(col("r_name").isNull && col("n_name").isNull).collect()
    assert(total.length == 1)
    val n = total(0).getAs[Long]("n_orders")
    assert(n == Tables.orders(spark, sfTiny).count())
  }

  test("q12 cohorts are disjoint") {
    val df = Relational.q12SetOps(spark, sfTiny).cache()
    val dup = df.groupBy("o_custkey").count().filter(col("count") > 1).count()
    assert(dup == 0)
    df.unpersist()
  }

  test("q43 multi-distinct: Expand plan, bounds between distinct streams hold") {
    val df = Relational.q43MultiDistinct(spark, sfTiny).cache()
    try {
      // multi-column DISTINCT must take Spark's Expand-based path
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), "expected an Expand-based distinct plan")
      df.collect().foreach { r =>
        assert(r.getAs[Long]("nd_part_heavy") <= r.getAs[Long]("nd_part"))
        assert(r.getAs[Long]("nd_part_heavy") <= r.getAs[Long]("n_heavy"))
        assert(r.getAs[Long]("n_heavy") <= r.getAs[Long]("n_rows"))
        assert(r.getAs[Long]("nd_order") <= r.getAs[Long]("n_rows"))
      }
    } finally df.unpersist(blocking = false)
  }

  test("q84 TPC-H Q5: SQL front end agrees with a DataFrame-API recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = operators.Relational.q84TpchQ5(spark, sfSmall).collect()
    assert(out.nonEmpty)
    // revenue ranking is descending
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // DataFrame-API recomputation of the same semantics
    val asiaNations = Tables.nation(spark, sfSmall)
      .join(Tables.region(spark, sfSmall).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
    val df = Tables.lineitem(spark, sfSmall)
      .join(Tables.orders(spark, sfSmall)
        .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfSmall), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, sfSmall),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(asiaNations, $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(operators.Num.rsum($"l_extendedprice" * (lit(1) - $"l_discount"), 2)
        .as("revenue"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("revenue")).toMap
    val got = out.map(r => r.getString(0) -> r.getAs[Double]("revenue")).toMap
    assert(got == df, s"$got vs $df")
  }
  test("q92 DQ report: planted duplicate key, orphan rows, NULLs and range breaks all counted") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts0 = Timestamp.valueOf("2024-01-05 00:00:00")
    val cust = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("c_custkey", "c_name")
    // order 20: NULL totalprice (a violation — NULL is not good), out-of-range
    // date, and an orphan custkey all at once
    val ord = Seq(
      (10L, 1L, Some(5.0), Timestamp.valueOf("1996-03-01 00:00:00")),
      (20L, 9L, None, Timestamp.valueOf("1990-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val li = Seq(
      (10L, 5.0, 0.1),    // clean
      (10L, 99.0, 0.1),   // quantity out of range
      (30L, 5.0, 0.9))    // discount out of range AND orphan orderkey
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val ev = Seq((1L, ts0), (2L, Timestamp.valueOf("2025-06-01 00:00:00")))
      .toDF("user_id", "ts")
    val docs = Seq((100L, "abc", 3L), (101L, "abcd", 9L))
      .toDF("doc_id", "text", "n_chars")
    val got = operators.Relational.dqReport(cust, ord, li, ev, docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(5)))).toMap
    assert(got(("customer", "pk_unique")) == ((3L, 1L, 0)))
    assert(got(("orders", "totalprice_positive")) == ((2L, 1L, 0)), "NULL must violate")
    assert(got(("orders", "orderdate_in_range")) == ((2L, 1L, 0)))
    assert(got(("orders", "fk_customer")) == ((2L, 1L, 0)))
    assert(got(("lineitem", "quantity_in_range")) == ((3L, 1L, 0)))
    assert(got(("lineitem", "discount_in_range")) == ((3L, 1L, 0)))
    assert(got(("lineitem", "fk_orders")) == ((3L, 1L, 0)))
    assert(got(("events", "ts_in_range")) == ((2L, 1L, 0)))
    assert(got(("events", "user_not_null")) == ((2L, 0L, 1)), "clean check must pass")
    assert(got(("documents", "chars_consistent")) == ((2L, 1L, 0)))
  }

  test("q92 on testdata: ten checks, all green, shares consistent") {
    val rows = operators.Relational.q92DqReport(spark, sfTiny).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L && r.getInt(5) == 1, s"synthetic data must be clean: $r")
      assert(r.getAs[Double]("viol_share") == 0.0, r.toString)
    }
  }
}
