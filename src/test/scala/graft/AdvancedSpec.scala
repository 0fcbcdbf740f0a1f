package graft

import org.apache.spark.sql.functions._
import graft.operators.Advanced

class AdvancedSpec extends GraftSpec {

  test("q63 attribution: hand-credited touches, organic purchases, window cutoff") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: click then view then purchase — last = view, linear splits
      (1L, "click", t(0), 1L, 0.0), (1L, "view", t(10), 2L, 0.0),
      (1L, "purchase", t(20), 3L, 100.0),
      // user 2: organic purchase (no touches at all)
      (2L, "purchase", t(0), 4L, 40.0),
      // user 3: the only touch is outside the 24 h lookback
      (3L, "click", t(0), 5L, 0.0),
      (3L, "purchase", t(25 * 3600), 6L, 60.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val rows = Advanced.attribution(ev).collect()
      .map(r => r.getAs[String]("touch_type") -> r).toMap
    assert(rows.keySet == Set("(none)", "click", "view"))
    assert(rows("view").getAs[Long]("n_last") == 1L &&
      rows("view").getAs[Double]("last_revenue") == 100.0, s"${rows("view")}")
    assert(rows("view").getAs[Double]("linear_credit") == 0.5 &&
      rows("view").getAs[Double]("linear_revenue") == 50.0)
    assert(rows("click").getAs[Long]("n_last") == 0L &&
      rows("click").getAs[Double]("linear_credit") == 0.5 &&
      rows("click").getAs[Double]("linear_revenue") == 50.0, s"${rows("click")}")
    assert(rows("(none)").getAs[Long]("n_last") == 2L &&
      rows("(none)").getAs[Double]("last_revenue") == 100.0, s"${rows("(none)")}")
  }

  test("q63 on testdata: last-touch counts and revenue are conserved") {
    import spark.implicits._
    val out = Advanced.q63Attribution(spark, sfTiny).cache()
    try {
      val p = Tables.events(spark, sfTiny).filter($"event_type" === "purchase")
      assert(out.agg(sum($"n_last")).collect()(0).getLong(0) == p.count())
      val totRev = p.agg(operators.Num.rsum($"value", 2)).collect()(0).getDouble(0)
      val attRev = out.agg(sum($"last_revenue")).collect()(0).getDouble(0)
      assert(math.abs(attRev - totRev) < 0.1, s"$attRev vs $totRev")
    } finally out.unpersist(blocking = false)
  }

  test("q60 stage latency: agrees with t12 and is internally ordered") {
    import spark.implicits._
    val q = Advanced.q60StageLatency(spark, sfTiny).collect()(0)
    val t = Advanced.t12Funnel(spark, sfTiny).collect()(0)
    assert(q.getAs[Long]("n_signup_users") == t.getAs[Long]("n_signup_users"))
    assert(q.getAs[Long]("n_converted") == t.getAs[Long]("n_converted"))
    val ps = Seq("p25_hours", "p50_hours", "p75_hours", "p90_hours").map(q.getAs[Double])
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, ps.mkString(","))
    val ws = Seq("within_1h", "within_24h", "within_7d").map(q.getAs[Double])
    assert(ws.zip(ws.tail).forall { case (a, b) => a <= b }, ws.mkString(","))
    // time-bounded conversions are a subset of all conversions
    val rate = q.getAs[Long]("n_converted").toDouble / q.getAs[Long]("n_signup_users")
    assert(ws.last <= rate + 1e-6)
  }

  test("s05 group split: group purity holds and volumes are conserved") {
    import spark.implicits._
    val out = Advanced.s05GroupSplit(spark, sfTiny).cache()
    try {
      val docs = Tables.documents(spark, sfTiny)
      // every source is in exactly one fold → fold source counts sum to
      // the distinct-source total (a source split across folds would
      // double-count here)
      val nSrc = docs.select(coalesce($"source", lit(""))).distinct().count()
      assert(out.agg(sum($"n_sources")).collect()(0).getLong(0) == nSrc)
      assert(out.agg(sum($"n_docs")).collect()(0).getLong(0) == docs.count())
      val shares = out.agg(sum($"doc_share")).collect()(0).getDouble(0)
      assert(math.abs(shares - 1.0) < 1e-5, shares.toString)
    } finally out.unpersist(blocking = false)
  }

  test("t20 RFM: planted spend ladder lands in hand-computed quintile cells") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 customers, one same-day order each: rec = 0 and freq = 1 for all
    // (both quintile chains collapse to bucket 1); spend 10..100 cuts at
    // interpolated 28/46/64/82 → monetary pairs {10,20}..{90,100}
    val d = Timestamp.valueOf("2024-01-15 00:00:00")
    val orders = (1 to 10).map(i => (i.toLong, d, i * 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val rows = Advanced.rfm(orders).collect()
    assert(rows.length == 5, rows.mkString(";"))
    assert(rows.forall(r => r.getAs[Long]("r_q") == 1L && r.getAs[Long]("f_q") == 1L))
    val cells = rows.map(r => r.getAs[Long]("m_q") ->
      (r.getAs[Long]("n_customers"), r.getAs[Double]("avg_monetary"))).toMap
    assert(cells == Map(1L -> (2L, 15.0), 2L -> (2L, 35.0), 3L -> (2L, 55.0),
      4L -> (2L, 75.0), 5L -> (2L, 95.0)), cells.toString)
  }

  test("t20 on testdata: customer total conserved, quintiles within 1..5") {
    import spark.implicits._
    val out = Advanced.t20Rfm(spark, sfTiny).cache()
    try {
      val nCust = Tables.orders(spark, sfTiny)
        .select($"o_custkey").distinct().count()
      assert(out.agg(sum($"n_customers")).collect()(0).getLong(0) == nCust)
      Seq("r_q", "f_q", "m_q").foreach { c =>
        assert(out.filter(col(c) < 1 || col(c) > 5).count() == 0, c)
      }
    } finally out.unpersist(blocking = false)
  }

  test("q28 quartiles balanced within each segment, ranks in [0,1]") {
    import spark.implicits._
    val out = Advanced.q28WindowDistribution(spark, sfTiny).cache()
    try {
      val byQ = out.groupBy($"c_mktsegment", $"quartile").count()
        .groupBy($"c_mktsegment")
        .agg((max($"count") - min($"count")).as("spread"))
        .collect()
      assert(byQ.nonEmpty)
      byQ.foreach(r => assert(r.getAs[Long]("spread") <= 1,
        s"ntile(4) spread > 1 in ${r.get(0)}"))
      val bad = out.filter($"pct_rank" < 0 || $"pct_rank" > 1 ||
        $"cume" <= 0 || $"cume" > 1).count()
      assert(bad == 0)
    } finally out.unpersist()
  }

  test("q29 multiset intersection is bounded by both cohorts") {
    import spark.implicits._
    val ord = Tables.orders(spark, sfTiny)
      .select($"o_custkey", $"o_orderstatus", year($"o_orderdate").as("y"))
    val na = ord.filter($"y" <= 1996).count()
    val nb = ord.filter($"y" >= 1997).count()
    val ni = Advanced.q29IntersectAll(spark, sfTiny)
      .agg(sum($"n_pairs")).collect()(0).getLong(0)
    assert(ni > 0 && ni <= math.min(na, nb))
  }

  test("q30 emits at most 3 ordered positions per doc, tokens non-empty") {
    import spark.implicits._
    val out = Advanced.q30LateralTokens(spark, sfTiny).cache()
    try {
      assert(out.filter($"pos" < 0 || $"pos" > 2).count() == 0)
      assert(out.filter(length($"token") === 0).count() == 0)
      val perDoc = out.groupBy($"doc_id").count()
      assert(perDoc.filter($"count" > 3).count() == 0)
    } finally out.unpersist()
  }

  test("q31 cohort week-0 retention is 1.0 and offsets are non-negative") {
    import spark.implicits._
    val out = Advanced.q31CohortRetention(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"week_offset" < 0).count() == 0)
      val w0 = out.filter($"week_offset" === 0)
      assert(w0.filter($"retention" =!= 1.0).count() == 0,
        "every user is active in their own first week")
      assert(out.filter($"n_active" > $"cohort_size").count() == 0)
    } finally out.unpersist()
  }

  test("s01 sample is a deterministic subset honoring per-stratum rates") {
    import spark.implicits._
    val a = Advanced.s01StratifiedSample(spark, sfTiny).collect()
    val b = Advanced.s01StratifiedSample(spark, sfTiny).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be reproducible")
    val keys = a.map(_.getLong(0)).toSet
    val cust = Tables.customer(spark, sfTiny)
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(keys.subsetOf(cust.map(_._1).toSet))
    // the LCG filter is exactly reproducible on the driver
    def permille(seg: String): Long = seg match {
      case "BUILDING" => 200L; case "AUTOMOBILE" => 100L; case _ => 50L
    }
    val expected = cust.collect {
      case (k, seg) if ((k * 48271L + 11L) % 1000003L) % 1000L < permille(seg) => k
    }.toSet
    assert(keys == expected)
  }

  test("q32 EXISTS/NOT EXISTS matches the DataFrame semi/anti composition") {
    import spark.implicits._
    val out = Advanced.q32ExistsSubquery(spark, sfTiny)
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val cust = Tables.customer(spark, sfTiny)
    val ord = Tables.orders(spark, sfTiny)
    val expected = cust
      .join(ord.filter($"o_totalprice" > 300000.0), $"c_custkey" === $"o_custkey", "left_semi")
      .join(ord.filter(year($"o_orderdate") === 1998), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(out == expected && out.nonEmpty)
  }

  test("t12 funnel: converted ⊆ signups, rate consistent, hours non-negative") {
    import spark.implicits._
    val r = Advanced.t12Funnel(spark, sfTiny).collect()(0)
    val nS = r.getAs[Long]("n_signup_users")
    val nC = r.getAs[Long]("n_converted")
    assert(nS > 0 && nC >= 0 && nC <= nS)
    assert(math.abs(r.getAs[Double]("conversion_rate") - nC.toDouble / nS) < 1e-6)
    if (nC > 0) assert(r.getAs[Double]("avg_hours_to_convert") >= 0.0)
  }

  test("q34 full outer keeps one-sided customers from both cohorts") {
    import spark.implicits._
    val out = Advanced.q34FullOuter(spark, sfTiny).cache()
    try {
      val statuses = out.groupBy($"status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(statuses.getOrElse("only_1995", 0L) > 0, "left-only rows survive")
      assert(statuses.getOrElse("only_1998", 0L) > 0, "right-only rows survive")
      // row count = distinct customers active in either year
      val ord = Tables.orders(spark, sfTiny)
        .select($"o_custkey", year($"o_orderdate").as("y"))
      val expected = ord.filter($"y" === 1995 || $"y" === 1998)
        .select($"o_custkey").distinct().count()
      assert(out.count() == expected)
    } finally out.unpersist()
  }

  test("q33 percentiles are ordered and bracketed by group min/max") {
    import spark.implicits._
    val out = Advanced.q33Percentiles(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("qty_p50") <= r.getAs[Double]("qty_p90"))
      assert(r.getAs[Double]("price_p50") <= r.getAs[Double]("price_p99"))
    }
    val bounds = Tables.lineitem(spark, sfTiny).groupBy($"l_returnflag")
      .agg(min($"l_quantity").as("lo"), max($"l_quantity").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      val p50 = r.getAs[Double]("qty_p50")
      assert(p50 >= lo && p50 <= hi)
    }
  }

  test("t11 rolling window contains the current row and stays within value bounds") {
    import spark.implicits._
    val out = Advanced.t11RollingWindow(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"n_window" < 1).count() == 0,
        "RANGE frame always includes the current row")
      // a frame of one row must average to exactly that row's value (r6)
      val singletons = out.filter($"n_window" === 1)
        .filter(abs($"roll_avg" - $"value") > 1e-6).count()
      assert(singletons == 0)
      // global bounds: every rolling mean lies within [min, max] of values
      val Array(lo, hi) = out.agg(min($"value"), max($"value")).collect()(0)
        .toSeq.map(_.asInstanceOf[Double]).toArray
      assert(out.filter($"roll_avg" < lo - 1e-9 || $"roll_avg" > hi + 1e-9).count() == 0)
    } finally out.unpersist()
  }

  test("t10 spine has consecutive days and conserves the error count") {
    import spark.implicits._
    val out = Advanced.t10DateSpine(spark, sfTiny).collect()
    val days = out.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b.toEpochDay - a.toEpochDay == 1, s"gap $a→$b")
      case _ =>
    }
    val total = out.map(_.getLong(1)).sum
    val expected = Tables.events(spark, sfTiny)
      .filter($"event_type" === "error").count()
    assert(total == expected)
  }

  test("q42 histogram: 20 dense buckets conserving row count") {
    import spark.implicits._
    val out = Advanced.q42Histogram(spark, sfTiny).cache()
    try {
      val buckets = out.select($"bucket").as[Int].collect().sorted
      assert(buckets.head >= 1 && buckets.last == 20)
      assert(out.filter($"n_items" < 1).count() == 0)
      val total = out.agg(sum($"n_items")).collect()(0).getLong(0)
      assert(total == Tables.lineitem(spark, sfTiny).count())
    } finally out.unpersist()
  }

  test("t16 SCD2 intervals: chained per user, exactly one open interval each") {
    import spark.implicits._
    val out = Advanced.t16Scd2Intervals(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // exactly one open (NULL valid_to) interval per user — the latest
      val users = out.select($"user_id").distinct().count()
      assert(out.filter($"valid_to".isNull).count() == users)
      // intervals chain: this row's valid_to is the user's next valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"valid_from", $"event_id")
      val chained = out.withColumn("nxt", lead($"valid_from", 1).over(w))
      assert(chained.filter($"nxt".isNotNull && $"valid_to" =!= $"nxt").count() == 0)
      // no negative-length intervals
      assert(out.filter($"valid_to".isNotNull && $"valid_to" < $"valid_from").count() == 0)
    } finally out.unpersist()
  }

  test("s02 weighted sample: 50 ranked rows, priorities ordered, biased to heavy rows") {
    import spark.implicits._
    val out = Advanced.s02WeightedSample(spark, sfSmall).cache()
    try {
      assert(out.count() == 50)
      assert(out.agg(min($"rank"), max($"rank")).collect()(0) ===
        org.apache.spark.sql.Row(1, 50))
      // ln(u) <= 0 and weights are positive, so priorities are <= 0 and
      // non-increasing in rank
      assert(out.filter($"priority" > 0).count() == 0)
      val ordered = out.orderBy($"rank").select($"priority").as[Double].collect()
      assert(ordered.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
      // A-Res selects proportionally to weight: the sampled orders skew
      // heavy (sample mean totalprice well above the corpus mean)
      val sampleMean = out.agg(avg($"o_totalprice")).collect()(0).getDouble(0)
      val corpusMean = Tables.orders(spark, sfSmall)
        .agg(avg($"o_totalprice")).collect()(0).getDouble(0)
      assert(sampleMean > corpusMean, s"sample $sampleMean corpus $corpusMean")
    } finally out.unpersist()
  }

  test("q41 bloom prefilter: no false negatives, real pruning, result ≡ plain semi join") {
    import spark.implicits._
    val dim = Tables.part(spark, sfSmall).filter($"p_brand" === "Brand#23")
    val fact = Tables.lineitem(spark, sfSmall)
      .select($"l_partkey", $"l_linestatus", $"l_extendedprice")
    val probed = Advanced.bloomPrefilter(fact, "l_partkey",
      Advanced.bloomArray(dim, "p_partkey")).cache()
    try {
      // pruning is real: the surviving fraction is close to the true ~4 %
      // match rate (false positives bounded well under 10× the truth)
      val kept = probed.count()
      val all = fact.count()
      assert(kept < all / 5, s"bloom kept $kept of $all")
      // no false negatives: the exact semi join loses nothing to the bloom
      val viaBloom = probed.join(broadcast(dim.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "left_semi").count()
      val plain = fact.join(broadcast(dim.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "left_semi").count()
      assert(viaBloom == plain, s"bloom dropped true members: $viaBloom vs $plain")
      // the full query is value-identical to its no-bloom twin
      val twin = fact.join(broadcast(dim.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          graft.operators.Num.rsum($"l_extendedprice", 2).as("revenue"))
        .orderBy($"l_linestatus").collect()
      val got = Advanced.q41BloomSemijoin(spark, sfSmall).collect()
      assert(got.sameElements(twin))
    } finally probed.unpersist()
  }

  test("s03 hash split: total partition, ~80/10/10 overall and per lang, shuffle-free") {
    import spark.implicits._
    val out = Advanced.s03HashSplit(spark, sfSmall).cache()
    try {
      val n = Tables.documents(spark, sfSmall).count()
      assert(out.count() == n, "every document gets exactly one split")
      // overall fractions: binomial ±3σ at n=500 keeps these loose bounds
      val frac = out.groupBy($"split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
      assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
      assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06)
      assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06)
      // stratification in expectation: every lang keeps a train majority
      val perLang = out.groupBy($"lang").agg(
        (sum(when($"split" === "train", 1).otherwise(0)).cast("double") /
          count(lit(1))).as("tf")).collect()
      perLang.foreach(r => assert(math.abs(r.getDouble(1) - 0.8) < 0.2,
        s"lang ${r.getString(0)} train fraction ${r.getDouble(1)}"))
      // the split itself is a scan-local map: the only exchange in the
      // plan is the final presentation sort (rangepartitioning) — no
      // hash-partition shuffle anywhere (AQE prints the plan twice, so
      // count kinds, not lines)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "hash split must not shuffle on a key")
      // deterministic across runs
      assert(out.collect().sameElements(Advanced.s03HashSplit(spark, sfSmall).collect()))
    } finally out.unpersist()
  }

  test("q44 merge upsert: actions partition the keyspace, balances follow the changeset") {
    import spark.implicits._
    val out = Advanced.q44MergeUpsert(spark, sfSmall).cache()
    try {
      val tgt = Tables.customer(spark, sfSmall)
        .select($"c_custkey", $"c_acctbal").cache()
      val n = tgt.count()
      val nUpd = tgt.filter($"c_custkey" % 5 === 0).count()
      val nIns = tgt.filter($"c_custkey" % 7 === 3).count()
      // post-merge table: every target key exactly once + the inserts
      assert(out.count() == n + nIns)
      assert(out.select($"custkey").distinct().count() == n + nIns)
      val acts = out.groupBy($"action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(acts == Map("update" -> nUpd, "insert" -> nIns,
        "keep" -> (n - nUpd)), s"got $acts")
      // updated rows carry old balance + 100, kept rows the old balance,
      // inserted rows zero — checked row-by-row via a join back
      val j = out.join(tgt, out("custkey") === tgt("c_custkey"), "left")
      assert(j.filter($"action" === "update" &&
        $"bal" =!= $"c_acctbal" + 100.0).count() == 0)
      assert(j.filter($"action" === "keep" && $"bal" =!= $"c_acctbal").count() == 0)
      assert(j.filter($"action" === "insert" &&
        ($"c_custkey".isNotNull || $"bal" =!= 0.0)).count() == 0)
      tgt.unpersist(blocking = false)
    } finally out.unpersist(blocking = false)
  }

  test("s04 balanced sample: exact per-stratum budgets, salted two-phase ≡ single window") {
    import spark.implicits._
    val out = Advanced.s04BalancedSample(spark, sfSmall).cache()
    try {
      // exactly min(B, |stratum|) per lang, ranks dense from 1
      val strata = Tables.documents(spark, sfSmall).groupBy($"lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = out.groupBy($"lang").agg(count(lit(1)).as("n"), max($"rk").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      assert(got.nonEmpty)
      got.foreach { case (l, n, mx) =>
        val want = math.min(Advanced.S04Budget.toLong, strata(l))
        assert(n == want && mx.toLong == want, s"lang $l: n=$n max_rk=$mx want=$want")
      }
      // the salted pre-aggregation is lossless: equal to the plain
      // single-window ranking computed directly
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"hk", $"doc_id")
      val plain = Tables.documents(spark, sfSmall)
        .select($"doc_id", $"lang", md5($"doc_id".cast("string")).as("hk"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= Advanced.S04Budget)
        .select($"lang", $"rk", $"doc_id")
        .orderBy($"lang", $"rk")
      assert(out.collect().sameElements(plain.collect()),
        "two-phase result must equal the single-window ranking")
    } finally out.unpersist(blocking = false)
  }

  test("s07: epoch permutations reproduce exactly and genuinely differ") {
    import graft.operators.Advanced
    def run() = Advanced.s07EpochReshuffle(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6))).toSeq
    val a = run()
    // REPRODUCIBLE: the permutation is a pure function of (epoch, doc_id)
    assert(a == run(), "re-running an epoch must reproduce it bit-for-bit")
    // the two epochs place the SAME corpus in DIFFERENT orders
    def orderOf(e: Int): Seq[Long] =
      a.filter(_._1 == e).sortBy(t => (t._2, t._4, t._3)).map(_._3)
    val o1 = orderOf(1)
    val o2 = orderOf(2)
    assert(o1.sorted == o2.sorted, "both epochs must cover the same docs")
    assert(o1 != o2, "two epochs must not share a permutation")
    // the start-rule bounds every offset inside its shard budget
    assert(a.forall(t => t._6 >= 0 && t._6 < 16384L),
      "offsets must lie inside the shard budget")
    // shard ids are dense from 0 within each (epoch, grp)
    a.groupBy(t => (t._1, t._2)).values.foreach { g =>
      val ids = g.map(_._5).distinct.sorted
      assert(ids == (0L until ids.length.toLong), s"non-dense shards: $ids")
    }
  }
}
