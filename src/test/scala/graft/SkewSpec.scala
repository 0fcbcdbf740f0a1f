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

  test("AQE splits a skewed shuffle join (OptimizeSkewedJoin fires)") {
    import spark.implicits._
    // one hot key carries ~all left rows; thresholds lowered so the
    // planted skew crosses AQE's size gates at test scale (defaults are
    // 256 MB / factor 5 — calibrated for real clusters)
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      // the hot side must be incompressible in the SHUFFLE (MapStatus
      // sizes are post-compression): a constant key alone lz4-compresses
      // to nothing, so the distinct payload v rides through the join
      val left = spark.range(400000)
        .select(when($"id" % 100 === 0, $"id" % 7).otherwise(lit(3L)).as("k"),
          xxhash64($"id").as("v"))
      val right = spark.range(7).select($"id".as("k"), ($"id" * 10).as("w"))
      // the consumer must not REQUIRE the join key's partitioning: a
      // groupBy(k) downstream makes OptimizeSkewedJoin decline (the split
      // breaks hashpartitioning(k) and the rule refuses to add the
      // repair shuffle unless forced) — a global aggregate is
      // partitioning-agnostic, so the default rule is free to split
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max($"v").as("mv"))
      val rows = joined.collect()
      // correctness first: the split must not change the result
      assert(rows(0).getLong(0) == 400000L)
      // the FINAL adaptive plan must show the skew-split join
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
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
