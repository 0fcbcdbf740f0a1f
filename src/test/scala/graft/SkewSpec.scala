package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends GraftSpec {

  test("salted join equals the plain join") {
    import spark.implicits._
    val fact = Tables.lineitem(spark, sfTiny)
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    val dim = Tables.part(spark, sfTiny).select($"p_partkey", $"p_brand")
    val plain = fact.join(dim, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(fact, dim, $"l_partkey", $"p_partkey",
      $"l_orderkey", salts = 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salted sum equals the direct aggregation") {
    import spark.implicits._
    val direct = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag".as("k"))
      .agg(sum($"l_quantity".cast("decimal(38,10)")).cast("double").as("total"))
    val salted = Skew.saltedSum(Tables.lineitem(spark, sfTiny),
      $"l_returnflag", $"l_quantity", salts = 16, $"l_orderkey")
    assert(salted.except(direct).count() == 0)
    assert(direct.except(salted).count() == 0)
  }

  test("salted join spreads a hot key over multiple shuffle keys") {
    import spark.implicits._
    // all fact rows share ONE key — the degenerate hot-key case
    val fact = spark.range(1000).select(lit(1L).as("fk"), $"id")
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val out = Skew.saltedJoin(fact, dim, $"fk", $"dk", $"id", salts = 4)
    assert(out.count() == 1000)
    // the salt column (pre-drop) takes >1 distinct value across the rows
    val saltCount = fact.withColumn("s", pmod(hash($"id"), lit(4)))
      .select("s").distinct().count()
    assert(saltCount == 4)
  }
}
