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
}
