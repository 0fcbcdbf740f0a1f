package graft

import org.apache.spark.sql.functions.udaf
import graft.functions.TopKAggregator

class TopKAggregatorSpec extends GraftSpec {

  test("single-pass top-k matches window-rank top-k per group") {
    import spark.implicits._
    val topk = udaf(new TopKAggregator(3))
    val got = Tables.orders(spark, sfTiny)
      .groupBy($"o_custkey")
      .agg(topk($"o_totalprice", $"o_orderkey").as("top"))
      .selectExpr("o_custkey", "inline(top)")
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val expected = graft.operators.Relational.q07TopPerGroup(spark, sfTiny)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(got.except(expected).count() == 0)
    assert(expected.except(got).count() == 0)
  }

  test("merge is order-insensitive: repartitioned input gives same result") {
    import spark.implicits._
    val topk = udaf(new TopKAggregator(2))
    def run(parts: Int) = Tables.orders(spark, sfTiny)
      .repartition(parts)
      .groupBy($"o_custkey")
      .agg(topk($"o_totalprice", $"o_orderkey").as("top"))
      .orderBy("o_custkey").collect()
    assert(run(2).sameElements(run(7)))
  }
}
