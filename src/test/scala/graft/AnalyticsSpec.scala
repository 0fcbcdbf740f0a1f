package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends GraftSpec {

  test("q51 KS: hand-computed distance, identical distributions give zero") {
    import spark.implicits._
    // a = {1,2,3,4}, b = {3,4,5,6}: F_a - F_b peaks at v=2 (0.5 - 0) and
    // the step functions agree again beyond 6 → D = 0.5
    val m1 = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)))
      .toDF("source", "x")
    val r1 = Analytics.ksTest(m1).collect()(0)
    assert(r1.getAs[Long]("n_a") == 4L && r1.getAs[Long]("n_b") == 4L)
    assert(r1.getAs[Double]("ks_stat") == 0.5, s"$r1")
    // identical distributions → D = 0 exactly
    val m2 = (Seq(1, 2, 2, 7).map(("a", _)) ++ Seq(1, 2, 2, 7).map(("b", _)))
      .toDF("source", "x")
    assert(Analytics.ksTest(m2).collect()(0).getAs[Double]("ks_stat") == 0.0)
  }

  test("q51 on testdata: pair count and [0,1] bounds") {
    import spark.implicits._
    val out = Analytics.q51KsTest(spark, sfTiny).cache()
    try {
      val srcs = Tables.documents(spark, sfTiny)
        .filter($"source".isNotNull).select($"source").distinct().count()
      assert(out.count() == srcs * (srcs - 1) / 2)
      assert(out.filter($"ks_stat" < 0 || $"ks_stat" > 1).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q65 new vs returning: planted two-day arrivals split and accumulate exactly") {
    import spark.implicits._
    import java.sql.Date
    val d1 = Date.valueOf("2024-03-01"); val d2 = Date.valueOf("2024-03-02")
    val act = Seq((1L, d1), (2L, d1), (1L, d2), (3L, d2), (1L, d2)) // dup row ignored
      .toDF("user_id", "d")
    val rows = Analytics.newVsReturning(act).orderBy($"d").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_active") == 2 && rows(0).getAs[Long]("n_new") == 2
      && rows(0).getAs[Long]("n_returning") == 0 && rows(0).getAs[Long]("cum_users") == 2)
    assert(rows(1).getAs[Long]("n_active") == 2 && rows(1).getAs[Long]("n_new") == 1
      && rows(1).getAs[Long]("n_returning") == 1 && rows(1).getAs[Long]("cum_users") == 3)
  }

  test("q64 basket rules: hand-computed support, confidence, and lift") {
    import spark.implicits._
    // baskets: {A,B}, {A,B}, {A}, {B,C} over N=4 users
    val ev = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "B"), (4L, "C"), (1L, "A")) // dup row must not double-count
      .toDF("user_id", "event_type")
    val rows = Analytics.basketRules(ev).collect()
      .map(r => (r.getAs[String]("ante"), r.getAs[String]("cons")) -> r).toMap
    assert(rows.keySet == Set(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")))
    val ab = rows(("A", "B"))
    assert(ab.getAs[Long]("n_both") == 2L && ab.getAs[Double]("support") == 0.5, s"$ab")
    assert(ab.getAs[Double]("confidence") == 0.666667 &&
      ab.getAs[Double]("lift") == 0.888889, s"$ab")
    val cb = rows(("C", "B"))
    assert(cb.getAs[Double]("confidence") == 1.0 &&
      cb.getAs[Double]("lift") == 1.333333, s"$cb")
  }

  test("q62 robust outliers: planted wild hour flagged, constant series scores NULL") {
    import spark.implicits._
    // {10,11,10,11,10,50}: med = 10.5, MAD = 0.5 → M(50) = 0.6745·79 =
    // 53.2855 (flagged); every quiet hour scores ±0.6745 (not flagged)
    val xs = Seq(10.0, 11.0, 10.0, 11.0, 10.0, 50.0)
    val series = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong * 3600, x) }
      .toDF("event_type", "hx", "x")
    val rows = Analytics.robustOutliers(series).orderBy($"rk").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Double]("x") == 50.0 && rows(0).getAs[Double]("mz") == 53.2855
      && rows(0).getAs[Int]("is_outlier") == 1, s"${rows(0)}")
    assert(rows.tail.forall(r => r.getAs[Int]("is_outlier") == 0), rows.mkString(";"))
    // a constant series has MAD = 0 → no defined score, nothing flagged
    val flat = Seq.tabulate(5)(i => ("a", i.toLong * 3600, 7.0))
      .toDF("event_type", "hx", "x")
    val fr = Analytics.robustOutliers(flat).collect()
    assert(fr.length == 3 && fr.forall(r => r.isNullAt(r.fieldIndex("mz"))))
  }

  test("q61 Holt: hand-traced 3-point recursion, constant series is a fixed point") {
    import spark.implicits._
    // y = 1,2,3: l₁=1,b₁=0 → l₂=1.5,b₂=0.125 (err 1) → l₃=2.3125,
    // b₃=0.296875 (err 1.375) — sse = 2.890625, mse = 1.4453125
    val series = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0))
      .toDF("event_type", "di", "y")
    val r1 = Analytics.holtForecast(series).collect()(0)
    assert(r1.getAs[Long]("n_days") == 3L)
    assert(r1.getAs[Double]("level") == 2.3125 && r1.getAs[Double]("trend") == 0.296875, s"$r1")
    assert(r1.getAs[Double]("mse_1step") == 1.445313, s"$r1")
    assert(r1.getAs[Double]("fc_1") == 2.609375 && r1.getAs[Double]("fc_2") == 2.90625
      && r1.getAs[Double]("fc_3") == 3.203125, s"$r1")
    // a constant series is a fixed point: zero trend, zero error, flat forecast
    val flat = Seq.tabulate(4)(i => ("a", i.toLong, 5.0)).toDF("event_type", "di", "y")
    val r2 = Analytics.holtForecast(flat).collect()(0)
    assert(r2.getAs[Double]("level") == 5.0 && r2.getAs[Double]("trend") == 0.0)
    assert(r2.getAs[Double]("mse_1step") == 0.0 && r2.getAs[Double]("fc_3") == 5.0)
  }

  test("q61 on testdata: one row per type, day counts line up, errors non-negative") {
    import spark.implicits._
    val out = Analytics.q61HoltForecast(spark, sfTiny).cache()
    try {
      val days = Tables.events(spark, sfTiny)
        .select($"event_type", date_trunc("day", $"ts").as("d")).distinct()
        .groupBy($"event_type").agg(count(lit(1)).as("nd"))
      assert(out.join(days, "event_type")
        .filter($"n_days" =!= $"nd").count() == 0)
      assert(out.filter($"mse_1step" < 0).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q59 seasonal: planted two-factor signal recovered exactly with R² = 1") {
    import spark.implicits._
    // balanced grid, zero-sum effects: v = 10 + a_h + b_d with
    // a = (−3,−1,1,3) over hods 0..3 and b = (−2,2) over dows 0..1
    val a = Map(0L -> -3.0, 1L -> -1.0, 2L -> 1.0, 3L -> 3.0)
    val b = Map(0L -> -2.0, 1L -> 2.0)
    val ev = (for { h <- 0L to 3L; d <- 0L to 1L }
      yield ("x", h, d, 10.0 + a(h) + b(d))).toDF("event_type", "hod", "dow", "value")
    val rows = Analytics.seasonalDecomp(ev).collect()
    assert(rows.length == 6) // 4 hod effects + 2 dow effects
    rows.foreach { r =>
      val eff = r.getAs[Double]("effect")
      val want = if (r.getAs[String]("kind") == "hod") a(r.getAs[Long]("idx"))
        else b(r.getAs[Long]("idx"))
      assert(eff == want, s"$r")
      assert(r.getAs[Double]("var_total") == 9.0, s"$r") // mean(a²)+mean(b²)
      assert(r.getAs[Double]("var_resid") == 0.0 && r.getAs[Double]("r2") == 1.0, s"$r")
    }
  }

  test("q59 on testdata: effects weighted-sum to zero per type, R² ≤ 1") {
    import spark.implicits._
    val out = Analytics.q59SeasonalDecomp(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"r2" > 1).count() == 0)
      // Σ n·effect = 0 per (type, kind) up to rounding (≤ 1e-3 over 24 cells)
      val sums = out.groupBy($"event_type", $"kind")
        .agg(sum($"n_obs".cast("double") * $"effect").as("se"),
          sum($"n_obs").cast("double").as("nn")).collect()
      assert(sums.forall(r => math.abs(r.getAs[Double]("se") / r.getAs[Double]("nn")) < 1e-3),
        sums.mkString(";"))
    } finally out.unpersist(blocking = false)
  }

  test("q58 Markov: hand-counted branching chain, user boundaries never pair") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // user 1: A→B, user 2: A→C, user 3: A→B. p(A→B)=2/3, p(A→C)=1/3;
    // dst marginals are the same shares, so every lift is exactly 1.
    val ev = Seq(
      (1L, t(0), 1L, "A"), (1L, t(10), 2L, "B"),
      (2L, t(0), 3L, "A"), (2L, t(10), 4L, "C"),
      (3L, t(0), 5L, "A"), (3L, t(10), 6L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = Analytics.markov(ev).collect()
    assert(rows.length == 2) // no B→A / C→A pairs across user boundaries
    val ab = rows.find(r => r.getAs[String]("dst_type") == "B").get
    val ac = rows.find(r => r.getAs[String]("dst_type") == "C").get
    assert(ab.getAs[Long]("n_pairs") == 2L && ab.getAs[Double]("p") == 0.666667, s"$ab")
    assert(ac.getAs[Long]("n_pairs") == 1L && ac.getAs[Double]("p") == 0.333333, s"$ac")
    assert(ab.getAs[Double]("lift") == 1.0 && ac.getAs[Double]("lift") == 1.0)
  }

  test("q58 on testdata: rows bound by types², conditional rows sum to 1 per src") {
    import spark.implicits._
    val out = Analytics.q58Markov(spark, sfTiny).cache()
    try {
      val types = Tables.events(spark, sfTiny)
        .select($"event_type").distinct().count()
      assert(out.count() <= types * types && out.count() > 0)
      // each src row-sums to 1 within rounding slack (25 cells × 5e-7)
      val sums = out.groupBy($"src_type").agg(sum($"p").as("sp")).collect()
      assert(sums.forall(r => math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4), sums.mkString(";"))
    } finally out.unpersist(blocking = false)
  }

  test("q57 Gini: uniform segment scores 0, single holder (n-1)/n, exact top-decile share") {
    import spark.implicits._
    // uniform: every order identical → G = 0; single holder of all spend
    // among n=4 → G = (n−1)/n = 0.75
    val planted = (Seq.fill(4)(10.0).zipWithIndex.map { case (x, i) => ("u", i.toLong, x) } ++
      Seq(0.0, 0.0, 0.0, 10.0).zipWithIndex.map { case (x, i) => ("h", i.toLong, x) })
      .toDF("seg", "k", "x")
    val byseg = Analytics.gini(planted).collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(byseg("u").getAs[Double]("gini") == 0.0, s"${byseg("u")}")
    assert(byseg("h").getAs[Double]("gini") == 0.75, s"${byseg("h")}")
    // ranks 19,20 of 1..20 are the top decile: share = 39/210 → 0.185714
    val twenty = (1 to 20).map(i => ("t", i.toLong, i.toDouble)).toDF("seg", "k", "x")
    val r20 = Analytics.gini(twenty).collect()(0)
    assert(r20.getAs[Long]("n_orders") == 20L)
    assert(r20.getAs[Double]("top10_share") == 0.185714, s"$r20")
  }

  test("q77 weighted quantiles: heavy tail value pulls the weighted median, unweighted agrees with counts") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7 (W=10): cum 1,2,3,10 →
    // p25 first ≥ 2.5 → 3; p50 first ≥ 5 → 4; p75 first ≥ 7.5 → 4
    val planted = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0),
      ("a", 4.0, 7.0)).toDF("seg", "x", "wt")
    val r0 = Analytics.weightedQuantiles(planted).collect()(0)
    assert(r0.getAs[Double]("total_weight") == 10.0)
    assert(r0.getAs[Double]("wp25") == 3.0 && r0.getAs[Double]("wp50") == 4.0 &&
      r0.getAs[Double]("wp75") == 4.0, s"$r0")
    // unit weights reduce to the lower (type-1) quantile of the values
    val unit = (1 to 10).map(i => ("u", i.toDouble, 1.0)).toDF("seg", "x", "wt")
    val ru = Analytics.weightedQuantiles(unit).collect()(0)
    assert(ru.getAs[Double]("wp50") == 5.0 && ru.getAs[Double]("wp25") == 3.0 &&
      ru.getAs[Double]("wp75") == 8.0, s"$ru")
  }

  test("q76 event paths: windows never cross users, shares sum to 1 over the top set") {
    import spark.implicits._
    val out = Analytics.q76EventPaths(spark, sfTiny).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty && rows.length <= 20)
      // counts descend under the pinned ordering
      val ns = rows.map(_.getAs[Long]("n_paths"))
      assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
      // total conservation: Σ over ALL paths = Σ per-user max(0, n_events−2)
      val totalTriples = Tables.events(spark, sfTiny)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .agg(sum(greatest($"n" - 2, lit(0L)))).collect()(0).getLong(0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val allPaths = Tables.events(spark, sfTiny)
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e2".isNotNull && $"e3".isNotNull).count()
      assert(allPaths == totalTriples, s"$allPaths vs $totalTriples")
      assert(rows.forall(r => r.getAs[Double]("share") > 0 &&
        r.getAs[Double]("share") <= 1))
    } finally out.unpersist(blocking = false)
  }

  test("q75 skew report: one row per join key, conserved totals, coherent skew stats") {
    import spark.implicits._
    val out = Analytics.q75SkewReport(spark, sfTiny).cache()
    try {
      val rows = out.collect()
      assert(rows.length == 3)
      val total = Tables.lineitem(spark, sfTiny).count()
      rows.foreach { r =>
        assert(r.getAs[Long]("n_rows") == total, s"$r")
        assert(r.getAs[Long]("max_rows") >= 1L)
        assert(r.getAs[Double]("skew_factor") >= 1.0 - 1e-9, s"$r")
        assert(r.getAs[Double]("p99_rows") <= r.getAs[Long]("max_rows") + 1e-9)
        assert(r.getAs[Double]("mean_rows") <= r.getAs[Long]("max_rows").toDouble)
      }
      // suppkey is the lowest-cardinality key here → highest mean load
      val byKey = rows.map(r => r.getAs[String]("join_key") ->
        r.getAs[Double]("mean_rows")).toMap
      assert(byKey("l_suppkey") >= byKey("l_orderkey"), byKey.toString)
    } finally out.unpersist(blocking = false)
  }

  test("q74 active users: hand-computed DAU/WAU/MAU on a two-cohort plant") {
    import spark.implicits._
    // user 1 active on days 0 and 10, user 2 on day 0 only:
    // day 0 → dau 2, wau 2, mau 2, stickiness 1.0
    // day 10 → dau 1 (u1), wau 1 ([4,10] = u1), mau 2 (day 0 within 28) → 0.5
    val ev = Seq((1L, 0L), (1L, 10L), (2L, 0L), (2L, 0L))
      .toDF("user_id", "di")
    val out = Analytics.activeUsers(ev).collect()
      .map(r => r.getAs[Long]("di") -> r).toMap
    val d0 = out(0L); val d10 = out(10L)
    assert(d0.getAs[Long]("dau") == 2 && d0.getAs[Long]("wau") == 2 &&
      d0.getAs[Long]("mau") == 2 && d0.getAs[Double]("stickiness") == 1.0, s"$d0")
    assert(d10.getAs[Long]("dau") == 1 && d10.getAs[Long]("wau") == 1 &&
      d10.getAs[Long]("mau") == 2 && d10.getAs[Double]("stickiness") == 0.5, s"$d10")
    // only days with activity report (2 rows)
    assert(out.size == 2, out.keys.mkString(","))
  }

  test("q73 equi-depth: 1..100 splits into ten 10-item buckets at the decile grid") {
    import spark.implicits._
    val vals = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("x")
    val out = Analytics.equidepthHist(vals).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_items") == 10L), out.mkString(";"))
    // boundary b1 = 10.9 ((n−1)p interpolation): bucket 1 = {1..10}
    val b1 = out.find(_.getAs[Int]("bucket") == 1).get
    assert(b1.getAs[Double]("lo") == 1.0 && b1.getAs[Double]("hi") == 10.0, s"$b1")
    val b10 = out.find(_.getAs[Int]("bucket") == 10).get
    assert(b10.getAs[Double]("lo") == 91.0 && b10.getAs[Double]("hi") == 100.0)
    // tie masses fall LOW: all-equal input lands in one bucket
    val ties = Seq.fill(20)(Tuple1(5.0)).toDF("x")
    val tout = Analytics.equidepthHist(ties).collect()
    assert(tout.length == 1 && tout(0).getAs[Int]("bucket") == 1 &&
      tout(0).getAs[Long]("n_items") == 20L, tout.mkString(";"))
  }

  test("q72 LTTB: the spike survives downsampling, selections are hx-monotone, short series drop") {
    import spark.implicits._
    val spike = (0 until 30).map(i =>
      ("s", i.toLong, if (i == 17) 100.0 else 1.0))
    val short = (0 until 12).map(i => ("x", i.toLong, i.toDouble))
    val out = Analytics.lttb((spike ++ short).toDF("event_type", "hx", "y"))
      .collect()
    assert(out.forall(_.getAs[String]("event_type") == "s")) // short series dropped
    assert(out.length == 12, out.mkString(";"))
    val bysel = out.map(r => r.getAs[Int]("sel") ->
      (r.getAs[Long]("hx"), r.getAs[Double]("y"))).toMap
    assert(bysel(0) == (0L, 1.0) && bysel(11) == (29L, 1.0))
    // the spike's bucket champion must be the spike itself — naive
    // striding (every 3rd point) would have erased it
    assert(out.exists(r => r.getAs[Long]("hx") == 17L &&
      r.getAs[Double]("y") == 100.0), out.mkString(";"))
    // selections advance strictly in time
    val hxs = out.sortBy(_.getAs[Int]("sel")).map(_.getAs[Long]("hx"))
    assert(hxs.zip(hxs.tail).forall { case (a, b) => a < b }, hxs.mkString(","))
  }

  test("q71 winsorized: 1..100 trims to 6..95 and clamps symmetrically to mean 50.5") {
    import spark.implicits._
    // p05 = 5.95, p95 = 95.05 ((n−1)p interpolation); trimmed keeps 6..95
    // (mean 50.5); clamping is symmetric here so winsor mean is also 50.5
    val vals = (1 to 100).map(i => ("a", i.toDouble)).toDF("seg", "x")
    val r0 = Analytics.winsorizedStats(vals).collect()(0)
    assert(r0.getAs[Double]("p05") == 5.95 && r0.getAs[Double]("p95") == 95.05, s"$r0")
    assert(r0.getAs[Long]("n") == 100L && r0.getAs[Long]("n_kept") == 90L)
    assert(r0.getAs[Double]("trimmed_mean") == 50.5)
    assert(r0.getAs[Double]("winsor_mean") == 50.5)
    // asymmetric outlier: one wild max pulls the raw mean but not the
    // trimmed one
    val wild = ((1 to 99).map(i => ("w", i.toDouble)) :+ ("w", 100000.0)).toDF("seg", "x")
    val rw = Analytics.winsorizedStats(wild).collect()(0)
    assert(rw.getAs[Double]("trimmed_mean") < 60.0, s"$rw")
    assert(rw.getAs[Double]("winsor_mean") < 60.0, s"$rw")
  }

  test("q70 runs test: alternating series hits max runs with the exact z, trend scores negative") {
    import spark.implicits._
    // alternating 10,0,...: median 5, signs alternate → r = 8 (max);
    // trending 1..8: median 4.5, signs ---- ++++ → r = 2 (min)
    val alt = (0 until 8).map(i => ("a", i.toLong, if (i % 2 == 0) 10.0 else 0.0))
    val tr = (1 to 8).map(i => ("t", i.toLong, i.toDouble))
    val const = (0 until 8).map(i => ("c", i.toLong, 5.0)) // all tied → dropped
    val out = Analytics.runsTest((alt ++ tr ++ const).toDF("event_type", "hx", "y"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(!out.contains("c") && out.size == 2)
    val mu = 2.0 * 4.0 * 4.0 / 8.0 + 1.0
    val v = (mu - 1.0) * (mu - 2.0) / 7.0
    val a = out("a")
    assert(a.getAs[Long]("n_runs") == 8L && a.getAs[Long]("n_pos") == 4L)
    assert(a.getAs[Double]("z") == operators.Num.rD((8.0 - mu) / math.sqrt(v), 6), s"$a")
    val t = out("t")
    assert(t.getAs[Long]("n_runs") == 2L)
    assert(t.getAs[Double]("z") == operators.Num.rD((2.0 - mu) / math.sqrt(v), 6), s"$t")
    assert(t.getAs[Double]("z") < 0 && a.getAs[Double]("z") > 0)
  }

  test("q69 Holt-Winters: pure period-7 series tracks exactly, short types drop") {
    import spark.implicits._
    // periodic pattern (mean 29 exact in binary): after first-cycle init
    // l = 29, s_j = y_j − 29, every later step has y − s_j = 29 → the
    // recursion is a fixed point: sse = 0, trend 0, forecasts replay the
    // pattern (positions n%7, (n+1)%7, (n+2)%7 = indices 0,1,2)
    val pat = Seq(7.0, 14.0, 21.0, 28.0, 35.0, 42.0, 56.0)
    val per = (0 until 21).map(i => ("p", i.toLong, pat(i % 7)))
    val const = (0 until 21).map(i => ("c", i.toLong, 5.0))
    val short = (0 until 7).map(i => ("s", i.toLong, 1.0)) // < 8 days → dropped
    val out = Analytics.holtWinters((per ++ const ++ short)
      .toDF("event_type", "di", "y")).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(!out.contains("s") && out.size == 2)
    val p = out("p")
    assert(p.getAs[Double]("level") == 29.0 && p.getAs[Double]("trend") == 0.0)
    assert(p.getAs[Double]("mse_1step") == 0.0)
    assert(p.getAs[Double]("fc_1") == 7.0, s"$p")
    assert(p.getAs[Double]("fc_2") == 14.0, s"$p")
    assert(p.getAs[Double]("fc_3") == 21.0, s"$p")
    val c = out("c")
    assert(c.getAs[Double]("level") == 5.0 && c.getAs[Double]("trend") == 0.0)
    assert(c.getAs[Double]("mse_1step") == 0.0 && c.getAs[Double]("fc_3") == 5.0)
  }

  test("q68 histogram Gini: equals exact q57 on singleton-bucket distributions, lower-bounds it under spread") {
    import spark.implicits._
    // u: hi = lo → one bucket → 0 exactly; h: {0,0,0}→bucket 1, {10}→bucket 20
    // — within-bucket values identical so the trapezoid is exact (0.75);
    // t: 20 distinct values land in 20 distinct buckets → singleton identity,
    // trapezoid ≡ rank-sum Gini bit-for-bit
    val planted = (Seq.fill(4)(10.0).zipWithIndex.map { case (x, i) => ("u", i.toLong, x) } ++
      Seq(0.0, 0.0, 0.0, 10.0).zipWithIndex.map { case (x, i) => ("h", i.toLong, x) } ++
      (1 to 20).map(i => ("t", i.toLong, i.toDouble))).toDF("seg", "k", "x")
    val exact = Analytics.gini(planted).collect()
      .map(r => r.getAs[String]("seg") -> r.getAs[Double]("gini")).toMap
    val hist = Analytics.giniHist(planted).collect()
      .map(r => r.getAs[String]("seg") -> r.getAs[Double]("gini_hist")).toMap
    assert(hist("u") == 0.0 && exact("u") == 0.0)
    assert(hist("h") == 0.75 && exact("h") == 0.75)
    assert(hist("t") == exact("t"), s"${hist("t")} vs ${exact("t")}")
    // within-bucket spread (1..100 → 5 values per bucket): convexified
    // Lorenz → G_hist ≤ G_exact; hand-computed gap 0.00079
    val spread = (1 to 100).map(i => ("s", i.toLong, i.toDouble)).toDF("seg", "k", "x")
    val ge = Analytics.gini(spread).collect()(0).getAs[Double]("gini")
    val gh = Analytics.giniHist(spread).collect()(0).getAs[Double]("gini_hist")
    assert(gh <= ge && ge - gh <= 0.005, s"hist $gh exact $ge")
  }

  test("q57 on testdata: one row per segment, gini within [0,1]") {
    import spark.implicits._
    val out = Analytics.q57Gini(spark, sfTiny).cache()
    try {
      assert(out.count() == 5)
      assert(out.filter($"gini" < 0 || $"gini" > 1).count() == 0)
      assert(out.filter($"top10_share" <= 0.1).count() == 0) // top decile holds > its head count share
    } finally out.unpersist(blocking = false)
  }

  test("q56 CUSUM: locates a planted level shift at its exact hour") {
    import spark.implicits._
    // step series 0,0,0 → 6,6,6 (μ = 3): S = −3,−6,−9,−6,−3,0 — the CUSUM
    // trough |S| = 9 sits at the last pre-shift hour (hx = 7200)
    val series = Seq(0L -> 0.0, 3600L -> 0.0, 7200L -> 0.0,
      10800L -> 6.0, 14400L -> 6.0, 18000L -> 6.0)
      .map { case (h, x) => ("a", h, x) }.toDF("event_type", "hx", "x")
    val r1 = Analytics.cusum(series).collect()(0)
    assert(r1.getAs[Long]("n_hours") == 6L && r1.getAs[Double]("mean_x") == 3.0)
    assert(r1.getAs[Long]("cp_hour") == 7200L, s"$r1")
    assert(r1.getAs[Double]("cusum_max") == 9.0, s"$r1")
    // a constant series never alarms: max |S| = 0 at the first hour
    val flat = Seq(0L, 3600L, 7200L).map(h => ("a", h, 5.0))
      .toDF("event_type", "hx", "x")
    val r2 = Analytics.cusum(flat).collect()(0)
    assert(r2.getAs[Double]("cusum_max") == 0.0 && r2.getAs[Long]("cp_hour") == 0L)
  }

  test("q111 Page–Hinkley: alarms on a planted level shift, stays silent on flat") {
    import spark.implicits._
    // step series 0,0,0 → 6,6,6 with δ = 0.005 and an ADAPTIVE mean:
    // pre-shift terms are −δ (m walks to −0.015, ph pinned at 0); after
    // the shift the running mean lags (1.5, 2.4, 3.0), so m climbs by
    // 4.495 + 3.595 + 2.995 — PH peaks at the LAST hour ≈ 11.085
    val series = Seq(0L -> 0.0, 3600L -> 0.0, 7200L -> 0.0,
      10800L -> 6.0, 14400L -> 6.0, 18000L -> 6.0)
      .map { case (h, x) => ("a", h, x) }.toDF("event_type", "hx", "x")
    val r1 = Analytics.pageHinkley(series).collect()(0)
    assert(r1.getAs[Long]("n_hours") == 6L)
    assert(r1.getAs[Long]("ph_hour") == 18000L, s"$r1")
    // decimal accumulation makes the trace EXACT: 4.495+3.595+2.995+0.015
    assert(r1.getAs[Double]("ph_max") == 11.085, s"$r1")
    // a constant series never alarms: every prefix min IS m, PH ≡ 0,
    // and the all-ties champion is the earliest hour
    val flat = Seq(0L, 3600L, 7200L).map(h => ("a", h, 5.0))
      .toDF("event_type", "hx", "x")
    val r2 = Analytics.pageHinkley(flat).collect()(0)
    assert(r2.getAs[Double]("ph_max") == 0.0 && r2.getAs[Long]("ph_hour") == 0L)
  }

  test("q113 Brown–Forsythe: location-shifted equal shapes give W = 0, spread shows up") {
    import spark.implicits._
    // groups {1,2,3} and {11,12,13}: same SHAPE, shifted location —
    // median-centered deviations are identical {1,0,1}, so the between-
    // group sum of squares is exactly zero: W = 0 (Levene ignores means)
    val same = Seq(("m", "a", 1), ("m", "a", 2), ("m", "a", 3),
      ("m", "b", 11), ("m", "b", 12), ("m", "b", 13))
      .toDF("metric", "source", "x")
    val r1 = Analytics.leveneW(same).collect()(0)
    assert(r1.getAs[Double]("f_stat") == 0.0 && r1.getAs[Double]("ssb") == 0.0, s"$r1")
    // doubling one group's spread: z = {1,0,1} vs {2,0,2} → W > 0
    val spread = Seq(("m", "a", 1), ("m", "a", 2), ("m", "a", 3),
      ("m", "b", 11), ("m", "b", 13), ("m", "b", 15))
      .toDF("metric", "source", "x")
    val r2 = Analytics.leveneW(spread).collect()(0)
    assert(r2.getAs[Double]("f_stat") > 0.0, s"$r2")
    // on testdata: both metrics present, η² in [0, 1]
    val out = Analytics.q113Levene(spark, sfTiny).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("n_chars", "n_tokens"))
    assert(out.forall(r => r.getAs[Double]("eta_sq") >= 0.0 &&
      r.getAs[Double]("eta_sq") <= 1.0))
  }

  test("q56 on testdata: one row per event type, CUSUM closes near zero") {
    import spark.implicits._
    val out = Analytics.q56Cusum(spark, sfTiny).cache()
    try {
      val types = Tables.events(spark, sfTiny)
        .select($"event_type").distinct().count()
      assert(out.count() == types)
      assert(out.filter($"cusum_max" < 0).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q55 Theil–Sen: recovers a planted line through one gross outlier") {
    import spark.implicits._
    // y = 2d + 5 at d = 0..3, then a wild outlier at d = 4: 6 of the 10
    // pairwise slopes are exactly 2 → median 2; residuals {5,5,5,5,92} →
    // intercept 5. OLS would be dragged to slope ≈ 20.
    val series = Seq((0L, 5.0), (1L, 7.0), (2L, 9.0), (3L, 11.0), (4L, 100.0))
      .map { case (d, y) => ("a", d, y) }.toDF("event_type", "di", "y")
    val r1 = Analytics.theilSen(series).collect()(0)
    assert(r1.getAs[Long]("n_days") == 5L && r1.getAs[Long]("n_pairs") == 10L)
    assert(r1.getAs[Double]("ts_slope") == 2.0, s"$r1")
    assert(r1.getAs[Double]("ts_intercept") == 5.0, s"$r1")
  }

  test("q55 on testdata: one row per event type, calendar-bounded pairs") {
    import spark.implicits._
    val out = Analytics.q55TheilSen(spark, sfTiny).cache()
    try {
      val types = Tables.events(spark, sfTiny)
        .select($"event_type").distinct().count()
      assert(out.count() == types)
      // n_pairs = C(n_days, 2) exactly
      assert(out.filter($"n_pairs" =!= $"n_days" * ($"n_days" - 1) / 2).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q54 mutual info: zero on independence, NMI = 1 on a diagonal table") {
    import spark.implicits._
    // proportional 2×2 → MI rounds to 0; marginal entropy hand-computed
    // through the same decimal(38,10) Σ n·ln n path the query uses
    val indep = (Seq.fill(10)(("p", "s")) ++ Seq.fill(20)(("p", "t")) ++
      Seq.fill(30)(("q", "s")) ++ Seq.fill(60)(("q", "t"))).toDF("lang", "source")
    val r1 = Analytics.mutualInfo(indep).collect()(0)
    assert(r1.getAs[Long]("n_docs") == 120L)
    assert(r1.getAs[Double]("mi") == 0.0 && r1.getAs[Double]("nmi") == 0.0, s"$r1")
    def d10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val hl = math.log(120.0) -
      (d10(30 * math.log(30.0)) + d10(90 * math.log(90.0))).toDouble / 120.0
    assert(r1.getAs[Double]("h_lang") == graft.operators.Num.rD(hl, 6), s"$r1")
    // diagonal 2×2 → H(L) = H(S) = H(L,S) → MI = H(L), NMI = 1
    val diag = (Seq.fill(25)(("p", "s")) ++ Seq.fill(25)(("q", "t")))
      .toDF("lang", "source")
    val r2 = Analytics.mutualInfo(diag).collect()(0)
    assert(r2.getAs[Double]("mi") == r2.getAs[Double]("h_lang")
      && r2.getAs[Double]("h_joint") == r2.getAs[Double]("h_lang")
      && r2.getAs[Double]("nmi") == 1.0, s"$r2")
  }

  test("q54 on testdata: one row, MI within its entropy bounds") {
    val out = Analytics.q54MutualInfo(spark, sfTiny).collect()
    assert(out.length == 1)
    val row = out(0)
    val (hl, hs, mi) = (row.getAs[Double]("h_lang"),
      row.getAs[Double]("h_source"), row.getAs[Double]("mi"))
    assert(hl >= 0 && hs >= 0 && mi >= 0)
    assert(mi <= math.min(hl, hs) + 1e-6, s"$row")
    val nmi = row.getAs[Double]("nmi")
    assert(nmi >= 0 && nmi <= 1)
  }

  test("q53 Benford: digit extraction across magnitudes, hand-computed terms") {
    import spark.implicits._
    // all five amounts lead with digit 1 across four orders of magnitude,
    // plus one digit-9 value from the sub-unit range (0.99 → cents 99)
    val amt = Seq(1.00, 19.99, 123.45, 1999.00, 0.99).toDF("x")
    val out = Analytics.benford(amt).collect()
    assert(out.length == 9)
    val d1 = out.find(_.getAs[Long]("digit") == 1L).get
    assert(d1.getAs[Long]("n_obs") == 4L && d1.getAs[Double]("obs_share") == 0.8)
    val d9 = out.find(_.getAs[Long]("digit") == 9L).get
    assert(d9.getAs[Long]("n_obs") == 1L && d9.getAs[Double]("obs_share") == 0.2)
    // an absent digit still reports: share 0, χ² term = n·p(d) exactly
    val d5 = out.find(_.getAs[Long]("digit") == 5L).get
    assert(d5.getAs[Long]("n_obs") == 0L && d5.getAs[Double]("obs_share") == 0.0)
    assert(d5.getAs[Double]("chi2_term") ==
      graft.operators.Num.rD(5 * 0.07918124604762482, 6), s"$d5")
  }

  test("q53 on testdata: 9 rows covering every order") {
    import spark.implicits._
    val out = Analytics.q53Benford(spark, sfTiny).cache()
    try {
      assert(out.count() == 9)
      assert(out.agg(sum($"n_obs")).collect()(0).getLong(0) ==
        Tables.orders(spark, sfTiny).count())
      assert(out.filter($"obs_share" < 0 || $"obs_share" > 1).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q52 Mann–Whitney: hand-computed U and z, tie-corrected") {
    import spark.implicits._
    // a = {1,2}, b = {3,4}: every b beats every a → U = 0;
    // σ² = (4/12)·(5 − 0) = 5/3, z = (0 − 2)/√(5/3) = −1.5491933…
    val m1 = (Seq(1, 2).map(("a", _)) ++ Seq(3, 4).map(("b", _)))
      .toDF("source", "x")
    val r1 = Analytics.mannWhitneyU(m1).collect()(0)
    assert(r1.getAs[Long]("n_a") == 2L && r1.getAs[Long]("n_b") == 2L)
    assert(r1.getAs[Double]("u_stat") == 0.0, s"$r1")
    assert(r1.getAs[Double]("z") == -1.549193, s"$r1")
    // label swap mirrors: a = {3,4}, b = {1,2} → U = nA·nB = 4, z = +1.549193
    val m2 = (Seq(3, 4).map(("a", _)) ++ Seq(1, 2).map(("b", _)))
      .toDF("source", "x")
    val r2 = Analytics.mannWhitneyU(m2).collect()(0)
    assert(r2.getAs[Double]("u_stat") == 4.0 && r2.getAs[Double]("z") == 1.549193, s"$r2")
    // identical tied samples {1,2,2,7}: U = nA·nB/2 = 8 exactly, z = 0 —
    // exercises both the ½·tie credit in U and the Σ(t³−t) correction
    val m3 = (Seq(1, 2, 2, 7).map(("a", _)) ++ Seq(1, 2, 2, 7).map(("b", _)))
      .toDF("source", "x")
    val r3 = Analytics.mannWhitneyU(m3).collect()(0)
    assert(r3.getAs[Double]("u_stat") == 8.0 && r3.getAs[Double]("z") == 0.0, s"$r3")
  }

  test("q52 on testdata: pair count and 0 ≤ U ≤ nA·nB") {
    import spark.implicits._
    val out = Analytics.q52MannWhitneyU(spark, sfTiny).cache()
    try {
      val srcs = Tables.documents(spark, sfTiny)
        .filter($"source".isNotNull).select($"source").distinct().count()
      assert(out.count() == srcs * (srcs - 1) / 2)
      assert(out.filter($"u_stat" < 0 ||
        $"u_stat" > $"n_a".cast("double") * $"n_b").count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q67 lag features: time-lag identity, window mean identity, series head NULLs") {
    import spark.implicits._
    val out = Analytics.q67LagFeatures(spark, sfTiny).cache()
    try {
      val rows = out.collect()
      val byKey = rows.map(r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("hx")) -> r).toMap
      // lag1_x at hour h must be x at hour h−1 (and NULL when h−1 is silent)
      rows.foreach { r =>
        val k = (r.getAs[String]("event_type"), r.getAs[Long]("hx"))
        val prev = byKey.get((k._1, k._2 - 1))
        (prev, Option(r.getAs[java.lang.Double]("lag1_x"))) match {
          case (Some(p), Some(l)) => assert(l == p.getAs[Double]("x"), s"$r")
          case (None, l)          => assert(l.isEmpty, s"$r")
          case (Some(_), None)    => fail(s"missing lag despite present hour: $r")
        }
        val l24 = Option(r.getAs[java.lang.Double]("lag24_x"))
        assert(l24 == byKey.get((k._1, k._2 - 24)).map(_.getAs[Double]("x")), s"$r")
      }
      // a window holding one hour reports its own x as the mean
      rows.filter(_.getAs[Long]("nz24") == 1).foreach { r =>
        assert(r.getAs[Double]("ma24_x") == r.getAs[Double]("x"), s"$r")
      }
      // each series' first hour has no 1h lag
      rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
        val head = rs.minBy(_.getAs[Long]("hx"))
        assert(head.isNullAt(head.fieldIndex("lag1_x")), s"$head")
      }
    } finally out.unpersist(blocking = false)
  }

  test("q66 Kruskal–Wallis: hand-computed H, tie correction, eta2") {
    import spark.implicits._
    // a = {1,2}, b = {3,4}: ranks 1,2 | 3,4 → R = 3, 7;
    // H = 12/20 · (9/2 + 49/2) − 15 = 2.4; no ties → h_adj = 2.4;
    // η² = (2.4 − 2 + 1)/(4 − 2) = 0.7
    val m1 = (Seq(1, 2).map(("a", _)) ++ Seq(3, 4).map(("b", _)))
      .toDF("source", "x")
    val r1 = Analytics.kruskalWallis(m1).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(r1("a").getAs[Double]("mean_rank") == 1.5 &&
      r1("b").getAs[Double]("mean_rank") == 3.5, r1.toSeq)
    assert(r1("a").getAs[Double]("h") == 2.4 &&
      r1("a").getAs[Double]("h_adj") == 2.4 &&
      r1("a").getAs[Double]("eta2") == 0.7, r1("a").toString)
    // fully tied split a = {1,1}, b = {2,2}: midranks 1.5, 3.5 → same
    // H = 2.4; Σ(t³−t) = 12 → C = 1 − 12/60 = 0.8 → h_adj = 3.0
    val m2 = (Seq(1, 1).map(("a", _)) ++ Seq(2, 2).map(("b", _)))
      .toDF("source", "x")
    val r2 = Analytics.kruskalWallis(m2).collect()(0)
    assert(r2.getAs[Double]("h") == 2.4 && r2.getAs[Double]("h_adj") == 3.0, s"$r2")
    // identical distributions: equal mean ranks → H = 0 exactly
    val m3 = (Seq(1, 2).map(("a", _)) ++ Seq(1, 2).map(("b", _)))
      .toDF("source", "x")
    val r3 = Analytics.kruskalWallis(m3).collect()(0)
    assert(r3.getAs[Double]("h") == 0.0 &&
      r3.getAs[Double]("mean_rank") == 2.5, s"$r3")
  }

  test("q66 on testdata: one row per source, grand mean rank is (N+1)/2") {
    import spark.implicits._
    val out = Analytics.q66KruskalWallis(spark, sfTiny).cache()
    try {
      val rows = out.collect()
      val srcs = Tables.documents(spark, sfTiny)
        .select($"source").distinct().count()
      assert(rows.length == srcs)
      assert(rows.forall(_.getAs[Double]("h_adj") >= 0.0))
      // Σ nᵢ·r̄ᵢ = N(N+1)/2 → weighted mean of mean_rank = (N+1)/2
      val n = rows.map(_.getAs[Long]("n_total")).head.toDouble
      val wm = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("mean_rank")).sum / n
      assert(math.abs(wm - (n + 1) / 2) < 1e-3, s"$wm vs ${(n + 1) / 2}")
    } finally out.unpersist(blocking = false)
  }

  test("q50 chi-square: zero on a proportional table, V = 1 on a diagonal one") {
    import spark.implicits._
    // perfectly proportional 2×2 (independence): chi2 = 0, V = 0
    val indep = (Seq.fill(10)(("p", "s")) ++ Seq.fill(20)(("p", "t")) ++
      Seq.fill(30)(("q", "s")) ++ Seq.fill(60)(("q", "t"))).toDF("lang", "source")
    val r1 = Analytics.chi2Independence(indep).collect()(0)
    assert(r1.getAs[Long]("n_docs") == 120L)
    assert(r1.getAs[Long]("dof") == 1L)
    assert(r1.getAs[Double]("chi2") == 0.0)
    assert(r1.getAs[Double]("cramers_v") == 0.0)
    // diagonal 2×2 (perfect association): chi2 = n, V = 1
    val diag = (Seq.fill(25)(("p", "s")) ++ Seq.fill(25)(("q", "t")))
      .toDF("lang", "source")
    val r2 = Analytics.chi2Independence(diag).collect()(0)
    assert(r2.getAs[Double]("chi2") == 50.0)
    assert(r2.getAs[Double]("cramers_v") == 1.0)
  }

  test("q50 on testdata: one summary row with coherent category counts") {
    import spark.implicits._
    val out = Analytics.q50Chi2Independence(spark, sfTiny).collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getAs[Long]("n_docs") ==
      Tables.documents(spark, sfTiny).count())
    assert(row.getAs[Double]("chi2") >= 0.0)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.000001)
  }

  test("q49 Welch t: hand-computed statistic and df on a planted two-sample frame") {
    import spark.implicits._
    // A = {1..8} (mean 4.5, var 6), B = {11..14} (mean 12.5, var 5/3)
    val docs = ((1 to 8).map(x => ("a", x)) ++ (11 to 14).map(x => ("b", x)))
      .toDF("source", "x")
    val rows = Analytics.welchTtest(docs).collect()
    assert(rows.length == 1)
    val row = rows(0)
    assert(row.getAs[String]("source_a") == "a" && row.getAs[String]("source_b") == "b")
    assert(row.getAs[Long]("n_a") == 8L && row.getAs[Long]("n_b") == 4L)
    assert(row.getAs[Double]("mean_a") == 4.5 && row.getAs[Double]("mean_b") == 12.5)
    val va = 6.0 / 8; val vb = (5.0 / 3) / 4
    val se = va + vb
    val t = (4.5 - 12.5) / math.sqrt(se)
    val df = se * se / (va * va / 7 + vb * vb / 3)
    assert(math.abs(row.getAs[Double]("t_stat") - t) < 1e-5, s"t ${row.getAs[Double]("t_stat")} vs $t")
    assert(math.abs(row.getAs[Double]("df") - df) < 1e-5, s"df ${row.getAs[Double]("df")} vs $df")
  }

  test("q49 on testdata: one row per source pair, symmetric magnitude") {
    import spark.implicits._
    val out = Analytics.q49WelchTtest(spark, sfTiny).cache()
    try {
      val srcs = Tables.documents(spark, sfTiny)
        .filter($"source".isNotNull).select($"source").distinct().count()
      assert(out.count() == srcs * (srcs - 1) / 2)
      assert(out.filter($"source_a" >= $"source_b").count() == 0)
      // df is bounded by min(n)-1 below and na+nb-2 above (Welch property)
      assert(out.filter($"df" > $"n_a" + $"n_b" - 2 + 0.001).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q78 ANOVA: hand-computed F and eta_sq on a planted three-group frame") {
    import spark.implicits._
    // groups {1,2,3}, {4,5,6}, {7,8,9}: means 2/5/8, grand 5;
    // SSB = 3·(9+0+9) = 54, SSW = 2 per group → 6, F = (54/2)/(6/6) = 27,
    // eta² = 54/60 = 0.9
    val m = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
      ("c", 7), ("c", 8), ("c", 9))
      .map { case (g, x) => ("m", g, x) }.toDF("metric", "source", "x")
    val rows = Analytics.anovaF(m).collect()
    assert(rows.length == 1)
    val row = rows(0)
    assert(row.getAs[Long]("n_docs") == 9L && row.getAs[Long]("k_groups") == 3L)
    assert(row.getAs[Double]("ssb") == 54.0 && row.getAs[Double]("ssw") == 6.0)
    assert(row.getAs[Double]("f_stat") == 27.0)
    assert(row.getAs[Double]("eta_sq") == 0.9)
  }

  test("q115 Tukey HSD: hand-computed two-group q, three-group pairs, q78 cell consistency") {
    import spark.implicits._
    // groups a = {0,2}, b = {4,6}: means 1/5, SSW = 2+2 = 4, N−k = 2,
    // MSW = 2; q = |1−5| / √(2/2·(1/2+1/2)) = 4
    val two = Seq(("m", "a", 0), ("m", "a", 2), ("m", "b", 4), ("m", "b", 6))
      .toDF("metric", "source", "x")
    val r0 = Analytics.tukeyHsd(two).collect()
    assert(r0.length == 1)
    assert(r0(0).getAs[Long]("na") == 2L && r0(0).getAs[Long]("nb") == 2L)
    assert(r0(0).getAs[Double]("mean_diff") == 4.0)
    assert(r0(0).getAs[Double]("q_stat") == 4.0, r0(0).toString)
    // three groups → exactly the 3 ordered pairs; q78's own trio: means
    // 2/5/8, MSW = 6/6 = 1 → q(a,b) = 3/√(1/2·(2/3)) = 3/√(1/3)
    val m = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
      ("c", 7), ("c", 8), ("c", 9))
      .map { case (g, x) => ("m", g, x) }.toDF("metric", "source", "x")
    val rows = Analytics.tukeyHsd(m).collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val qab = operators.Num.rD(3.0 / math.sqrt(1.0 / 2.0 * (2.0 / 3.0)), 6)
    assert(rows(0).getAs[Double]("q_stat") == qab, rows(0).toString)
    assert(rows(1).getAs[Double]("mean_diff") == 6.0)
    // identical groups → every pair's q is exactly 0… MSW 0 filters all
    val same = Seq("a", "b").flatMap(g => Seq(1, 2).map(x => ("m", g, x)))
      .toDF("metric", "source", "x")
    val rs = Analytics.tukeyHsd(same).collect()
    assert(rs.length == 1 && rs(0).getAs[Double]("q_stat") == 0.0)
    // on testdata: per metric exactly C(k,2) pairs for q78's k_groups
    val k = Analytics.q78Anova(spark, sfTiny)
      .select($"k_groups").as[Long].collect().head
    val cnt = Analytics.q115TukeyHsd(spark, sfTiny)
      .filter($"metric" === "n_chars").count()
    assert(cnt == k * (k - 1) / 2, s"$cnt vs C($k,2)")
  }

  test("q78 ANOVA: identical groups give SSB = 0 exactly (all-decimal path)") {
    import spark.implicits._
    val m = Seq("a", "b", "c").flatMap(g => Seq(1, 2, 3).map(x => ("m", g, x)))
      .toDF("metric", "source", "x")
    val row = Analytics.anovaF(m).collect()(0)
    assert(row.getAs[Double]("ssb") == 0.0 && row.getAs[Double]("f_stat") == 0.0)
    assert(row.getAs[Double]("eta_sq") == 0.0)
  }

  test("q78 on testdata: two metric rows, eta_sq in [0,1]") {
    import spark.implicits._
    val out = Analytics.q78Anova(spark, sfTiny).cache()
    try {
      assert(out.count() == 2)
      assert(out.select($"metric").as[String].collect().sorted.toSeq ==
        Seq("n_chars", "n_tokens"))
      assert(out.filter($"eta_sq" < 0 || $"eta_sq" > 1).count() == 0)
      assert(out.filter($"f_stat" < 0).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q79 Spearman: monotone cubic scores rho = 1 while Pearson stays below") {
    import spark.implicits._
    val m = (1 to 8).map(x => ("aa", x.toLong, (x.toLong * x * x)))
      .toDF("lang", "x", "y")
    val row = Analytics.spearman(m).collect()(0)
    assert(row.getAs[Double]("spearman_rho") == 1.0)
    val r = row.getAs[Double]("pearson_r")
    assert(r > 0.8 && r < 1.0, s"pearson $r")
  }

  test("q79 Spearman: hand-computed tie-corrected rho") {
    import spark.implicits._
    // x = 1..4, y = (1,3,3,4): midranks y = (1, 2.5, 2.5, 4),
    // rho = 18 / sqrt(20·18) = 0.948683...
    val m = Seq((1L, 1L), (2L, 3L), (3L, 3L), (4L, 4L))
      .map { case (x, y) => ("aa", x, y) }.toDF("lang", "x", "y")
    val row = Analytics.spearman(m).collect()(0)
    val want = 18.0 / math.sqrt(20.0 * 18.0)
    assert(math.abs(row.getAs[Double]("spearman_rho") - want) < 1e-5)
  }

  test("q79 on testdata: one row per lang, chars track tokens strongly") {
    import spark.implicits._
    val out = Analytics.q79Spearman(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"spearman_rho" < 0.5).count() == 0,
        "chars and tokens should be strongly monotone-related")
      assert(out.filter(abs($"pearson_r") > 1.000001 ||
        abs($"spearman_rho") > 1.000001).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q80 Mann-Kendall: monotone series hit tau ±1, tie case hand-computed, constant drops") {
    import spark.implicits._
    val up = (1 to 5).map(i => ("up", i.toLong, i.toDouble))
    val dn = (1 to 5).map(i => ("dn", i.toLong, (6 - i).toDouble))
    val tie = Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex.map { case (y, i) => ("tie", i.toLong, y) }
    val const = (1 to 5).map(i => ("const", i.toLong, 7.0))
    val rows = Analytics.mannKendall((up ++ dn ++ tie ++ const)
      .toDF("event_type", "di", "y")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!rows.contains("const")) // fully tied: no variance to test
    assert(rows("up").getAs[Long]("s_stat") == 10L &&
      rows("up").getAs[Double]("tau_b") == 1.0)
    assert(rows("dn").getAs[Long]("s_stat") == -10L &&
      rows("dn").getAs[Double]("tau_b") == -1.0)
    // untied n=5: var = 5·4·15/18
    val v5 = operators.Num.rD(300.0 / 18.0, 6)
    assert(rows("up").getAs[Double]("var_s") == v5)
    assert(rows("up").getAs[Double]("z") ==
      operators.Num.rD(9.0 / math.sqrt(300.0 / 18.0), 6))
    // tie case: S = 5, tsum = 18 → var = 138/18, n0 = 6, n1 = 1
    assert(rows("tie").getAs[Long]("s_stat") == 5L)
    assert(rows("tie").getAs[Double]("tau_b") ==
      operators.Num.rD(5.0 / math.sqrt(5.0 * 6.0), 6))
    assert(rows("tie").getAs[Double]("var_s") == operators.Num.rD(138.0 / 18.0, 6))
    assert(rows("tie").getAs[Double]("z") ==
      operators.Num.rD(4.0 / math.sqrt(138.0 / 18.0), 6))
  }

  test("q80 on testdata: one row per type, tau and z sign-coherent with S") {
    import spark.implicits._
    val out = Analytics.q80MannKendall(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(abs($"tau_b") > 1.000001).count() == 0)
      assert(out.filter($"s_stat" > 0 && ($"tau_b" <= 0 || $"z" < 0)).count() == 0)
      assert(out.filter($"s_stat" < 0 && ($"tau_b" >= 0 || $"z" > 0)).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q81 recursive EWMA: Spark's WITH RECURSIVE folds a planted series exactly") {
    import spark.implicits._
    val series = Seq(("a", 1L, 8.0), ("a", 2L, 4.0), ("a", 3L, 16.0),
      ("b", 5L, 2.0)).toDF("event_type", "di", "y")
    val rows = Analytics.recursiveEwma(series).collect()
      .map(r => (r.getString(0), r.getAs[Int]("rn")) -> r.getAs[Double]("ewma")).toMap
    // hand fold: 8; 0.25·4+0.75·8 = 7; 0.25·16+0.75·7 = 9.25
    assert(rows(("a", 1)) == 8.0 && rows(("a", 2)) == 7.0 && rows(("a", 3)) == 9.25)
    assert(rows(("b", 1)) == 2.0)
    assert(rows.size == 4)
  }

  test("q81 on testdata: every daily row present, recursion matches a driver fold") {
    import spark.implicits._
    val out = Analytics.q81RecursiveEwma(spark, sfTiny).collect()
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("rn"))
      var e = ordered.head.getAs[Double]("y")
      assert(ordered.head.getAs[Double]("ewma") == operators.Num.rD(e, 6))
      ordered.tail.foreach { r =>
        e = 0.25 * r.getAs[Double]("y") + 0.75 * e
        assert(r.getAs[Double]("ewma") == operators.Num.rD(e, 6), r.toString)
      }
    }
    assert(out.nonEmpty)
  }

  test("q82 sketched MAU: constant population stabilizes, estimate tracks q74's exact") {
    import spark.implicits._
    // same 40 users every day for 40 days: every full window sees the
    // same register table, so mau_est is CONSTANT once windows fill
    val const = for (d <- 0L until 40L; u <- 1L to 40L) yield (d, u)
    val rows = Analytics.sketchedMau(const.toDF("di", "user_id")).collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.length == 40)
    val full = rows.filter(_.getAs[Long]("window_days") == 28L)
    assert(full.nonEmpty)
    assert(full.map(_.getAs[Double]("mau_est")).distinct.length == 1)
    // small-range linear counting keeps the estimate near 40
    val est = full.head.getAs[Double]("mau_est")
    assert(math.abs(est - 40.0) / 40.0 < 0.25, s"est $est")
    // sketch vs exact on the real table: within HLL's error envelope
    val sk = Analytics.q82SketchedMau(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("mau_est")).toMap
    val exact = Analytics.q74ActiveUsers(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("di") -> r.getAs[Long]("mau")).toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (d, ex) =>
      assert(math.abs(sk(d) - ex) / ex.toDouble < 0.25,
        s"day $d sketch ${sk(d)} vs exact $ex")
    }
  }

  test("q83 cross-correlation: a shifted copy peaks at exactly its lag") {
    import spark.implicits._
    // b(t) = a(t − 3600): a leads b by 1 h → xcorr(a→b) = 1 at lag +1,
    // and xcorr(b→a) = 1 at lag −1
    val base = (0 until 48).map(h => h.toLong * 3600L -> (10.0 + (h % 7)))
    val a = base.map { case (hx, v) => ("a", hx, v) }
    val b = base.map { case (hx, v) => ("b", hx + 3600L, v) }
    val rows = Analytics.crossCorrelation((a ++ b).toDF("event_type", "hx", "x"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Int]("lag")) ->
        r.getAs[Double]("xcorr")).toMap
    assert(rows(("a", "b", 1)) == 1.0, rows.toString)
    assert(rows(("b", "a", -1)) == 1.0)
    // at the wrong lag the periodic pattern decorrelates below 1
    assert(rows(("a", "b", 0)) < 1.0)
  }

  test("q83 on testdata: ordered pairs at every lag, correlations bounded") {
    import spark.implicits._
    val out = Analytics.q83CrossCorrelation(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"type_a" === $"type_b").count() == 0)
      assert(out.filter(abs($"xcorr") > 1.000001).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q48 bootstrap CI: constant metric collapses the whole resampling path") {
    import spark.implicits._
    // every Poisson-weighted mean of a constant is that constant, so the
    // CI must collapse to [c, c] — pinning weights, replicate means, and
    // the percentile tail in one shot
    val docs = ((1 to 40).map(i => (i.toLong, "aa", 7)) ++
      (41 to 80).map(i => (i.toLong, "bb", 3))).toDF("doc_id", "lang", "x")
    val rows = Analytics.bootstrapCi(docs).collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    val a = rows(0); val b = rows(1)
    assert(a.getAs[Long]("n_docs") == 40L && b.getAs[Long]("n_docs") == 40L)
    for ((row, c) <- Seq((a, 7.0), (b, 3.0))) {
      assert(row.getAs[Double]("mean_x") == c)
      assert(row.getAs[Double]("boot_lo") == c, s"lo ${row}")
      assert(row.getAs[Double]("boot_hi") == c, s"hi ${row}")
    }
  }

  test("q48 on testdata: intervals ordered and bracket the point estimate") {
    import spark.implicits._
    val out = Analytics.q48BootstrapCi(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"boot_lo" > $"boot_hi").count() == 0)
      // the point estimate sits inside (or within one width of) the CI —
      // 32 replicates leave some slack, but not mean-outside-by-a-width
      val viol = out.filter(
        $"mean_x" < $"boot_lo" - ($"boot_hi" - $"boot_lo") ||
        $"mean_x" > $"boot_hi" + ($"boot_hi" - $"boot_lo")).count()
      assert(viol == 0)
    } finally out.unpersist(blocking = false)
  }

  test("q47 autocorrelation: bounded coefficients, pair algebra, corr cross-check") {
    import spark.implicits._
    val out = Analytics.q47Autocorr(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // a correlation is in [-1, 1] (tiny rounding slack)
      assert(out.filter(abs($"acf") > 1.000001).count() == 0)
      // longer lags can only lose pairs on a fixed time span
      val mono = out.groupBy($"event_type")
        .agg(min(when($"lag" === 1, $"n_pairs")).as("p1"),
          min(when($"lag" === 24, $"n_pairs")).as("p24"))
        .filter($"p1".isNotNull && $"p24".isNotNull && $"p24" > $"p1")
        .count()
      assert(mono == 0)
      // cross-check the decimal-moment formula against Spark's own corr()
      // on the identically-constructed lag-1 pairs
      val hourly = Tables.events(spark, sfTiny)
        .groupBy($"event_type", unix_timestamp(date_trunc("hour", $"ts")).as("hx"))
        .agg(operators.Num.r(operators.Num.davg($"value"), 6).as("x"))
      val b = hourly.select($"event_type".as("et2"), $"hx".as("hx2"), $"x".as("y"))
      val ref = hourly.join(b, $"et2" === $"event_type" && $"hx2" === $"hx" + 3600)
        .groupBy($"event_type").agg(corr($"x", $"y").as("c"))
      val viol = out.filter($"lag" === 1).join(ref, "event_type")
        .filter(abs($"acf" - $"c") > 1e-4).count()
      assert(viol == 0, "moment-formula ACF must agree with corr() at lag 1")
    } finally out.unpersist(blocking = false)
  }

  test("q17 as-of values reference a genuine prior click of the same user") {
    import spark.implicits._
    val asof = Analytics.q17AsofJoin(spark, sfTiny)
      .filter($"last_click_ts".isNotNull).limit(50).collect()
    assert(asof.nonEmpty)
    val clicks = Tables.events(spark, sfTiny).filter($"event_type" === "click")
      .select($"user_id", $"ts", $"value").collect()
      .groupBy(_.getLong(0))
    asof.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val errTs = r.getAs[java.sql.Timestamp]("ts")
      val ct = r.getAs[java.sql.Timestamp]("last_click_ts")
      assert(!ct.after(errTs), s"click after error for user $u")
      assert(clicks(u).exists(c => c.getTimestamp(1) == ct &&
        c.getDouble(2) == r.getAs[Double]("last_click_value")))
    }
  }

  test("q18 bands partition all lineitems exactly once") {
    val total = Analytics.q18RangeJoin(spark, sfTiny)
      .agg(sum("n_lines")).collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sfTiny).count())
  }

  test("q19 approx distinct within 5% of exact") {
    val bad = Analytics.q19ApproxDistinct(spark, sfTiny)
      .filter(abs(col("approx_customers") - col("exact_customers")) >
        col("exact_customers") * 0.05)
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }

  test("q20 returns only above-average parts and at least one") {
    val df = Analytics.q20ScalarSubquery(spark, sfTiny).cache()
    val n = df.count()
    assert(n > 0 && n < Tables.part(spark, sfTiny).count())
    df.unpersist()
  }

  test("q22 pivot row sums equal per-user event counts") {
    import spark.implicits._
    val pivoted = Analytics.q22Pivot(spark, sfTiny)
      .withColumn("total", $"click" + $"error" + $"purchase" + $"signup" + $"view")
      .select($"user_id", $"total")
    val direct = Tables.events(spark, sfTiny).groupBy($"user_id")
      .agg(count(lit(1)).as("total"))
    assert(pivoted.except(direct).count() == 0)
  }

  test("q37 approx percentiles within GK rank-error bound of exact") {
    import spark.implicits._
    val approx = Analytics.q37ApproxPercentile(spark, sfTiny)
    // exact interpolation-free reference: GK bounds RANK error by
    // n/accuracy, so compare against exact percentile_disc-style values
    // with a generous relative tolerance (prices span ~[900, 105000])
    val exact = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        expr("percentile(l_extendedprice, 0.9D)").as("p90"),
        expr("percentile(l_extendedprice, 0.99D)").as("p99"))
    val bad = approx.join(exact, "l_returnflag")
      .filter(abs($"p50_approx" - $"p50") / $"p50" > 0.02 ||
        abs($"p90_approx" - $"p90") / $"p90" > 0.02 ||
        abs($"p99_approx" - $"p99") / $"p99" > 0.02)
    assert(bad.count() == 0)
    assert(approx.count() == exact.count())
  }

  test("q39 sampled percentiles: ~5% sample, estimates near exact") {
    import spark.implicits._
    val df = Analytics.q39SampledPercentile(spark, sfSmall).cache()
    try {
      // deterministic md5-rank sampling keeps ~1/20 of each group
      val nTotal = Tables.lineitem(spark, sfSmall).count()
      val nSample = df.agg(sum("n_sample")).collect()(0).getLong(0)
      val rate = nSample.toDouble / nTotal
      assert(rate > 0.03 && rate < 0.07, s"sample rate $rate")
      // sampled percentiles track the exact q33-style values
      val exact = Tables.lineitem(spark, sfSmall)
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5D)").as("e50"),
          expr("percentile(l_extendedprice, 0.99D)").as("e99"))
      val bad = df.join(exact, "l_returnflag")
        .filter(abs($"price_p50" - $"e50") / $"e50" > 0.10 ||
          abs($"price_p99" - $"e99") / $"e99" > 0.10)
      assert(bad.count() == 0)
    } finally df.unpersist()
  }

  test("q40 portable HLL within 25% of exact on every group, both branches") {
    // sfTiny (~130 distinct/group) exercises the linear-counting branch,
    // sfSmall (~1300) the raw-estimator branch (2.5m boundary = 640)
    Seq(sfTiny, sfSmall).foreach { sf =>
      val bad = Analytics.q40PortableHll(spark, sf)
        .filter(abs(col("hll_customers") - col("exact_customers")) /
          col("exact_customers") > 0.25)
      assert(bad.count() == 0, s"estimate off by >25% at $sf")
    }
  }

  test("analytics oracles cover the SQL-expressible queries") {
    assert(Analytics.oracles.keySet == Analytics.queries.keySet --
      Set("q19_approx_distinct", "q37_approx_percentile"))
  }

  test("q46 robust stats: median agrees with q33, MAD bounded and consistent") {
    import spark.implicits._
    val out = Analytics.q46RobustStats(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // med is the same rounded exact percentile q33 reports
    val q33 = graft.operators.Advanced.q33Percentiles(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("price_p50")).toMap
    assert(out.keySet == q33.keySet)
    out.foreach { case (f, (n, med, mad, sig)) =>
      assert(n > 0 && med == q33(f), s"$f median")
      assert(mad >= 0.0, s"$f mad $mad")
      assert(sig == graft.operators.Num.rD(mad * 1.4826, 6), s"$f sigma")
    }
  }

  test("q90 CUPED: perfectly-correlated plant gives theta = slope, var_reduction = 1") {
    import spark.implicits._
    import java.sql.Timestamp
    // user u: x = u pre-period events, y = 2u + 3 post-period events —
    // y is an exact affine function of x, so rho^2 = 1 and theta = 2
    val ev = (1 to 6).flatMap { u =>
      val pre = (1 to u).map(i =>
        (u.toLong, Timestamp.valueOf(f"2024-01-10 00:$i%02d:00")))
      val post = (1 to 2 * u + 3).map(i =>
        (u.toLong, Timestamp.valueOf(f"2024-01-20 00:$i%02d:00")))
      pre ++ post
    }.toDF("user_id", "ts")
    val got = operators.Analytics.cuped(ev).collect()(0)
    assert(got.getAs[Long]("n") == 6L)
    assert(got.getAs[Double]("theta") == 2.0, got.toString)
    assert(got.getAs[Double]("var_reduction") == 1.0, got.toString)
    // adjusted lift: recompute from the spec's own variant assignment
    val v = (1 to 6).map { u =>
      u.toLong -> spark.range(1).select(
        (operators.DedupLsh.h60(lit(u.toString)) % 2).cast("long"))
        .collect()(0).getLong(0)
    }.toMap
    val g0 = (1 to 6).filter(u => v(u.toLong) == 0)
    val g1 = (1 to 6).filter(u => v(u.toLong) == 1)
    assert(g0.nonEmpty && g1.nonEmpty, v.toString)
    def mean(xs: Seq[Int]) = xs.sum.toDouble / xs.size
    val lift = mean(g1.map(u => 2 * u + 3)) - mean(g0.map(u => 2 * u + 3))
    val liftCv = lift - 2.0 * (mean(g1) - mean(g0))
    assert(math.abs(got.getAs[Double]("lift") - lift) < 1e-6, got.toString)
    // y affine in x => the adjusted lift removes ALL covariate imbalance:
    // lift_cv is exactly the intercept difference (zero here)
    assert(math.abs(got.getAs[Double]("lift_cv") - liftCv) < 1e-6, got.toString)
    assert(math.abs(got.getAs[Double]("lift_cv")) < 1e-6, got.toString)
  }

  test("q90 on testdata: one row, reduction in [0,1], variant means consistent") {
    val got = operators.Analytics.q90Cuped(spark, sfTiny).collect()
    assert(got.length == 1)
    val r0 = got(0)
    assert(r0.getAs[Long]("n") == r0.getAs[Long]("n0") + r0.getAs[Long]("n1"))
    val vr = r0.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0, r0.toString)
    assert(math.abs(r0.getAs[Double]("lift") -
      (r0.getAs[Double]("mean_y1") - r0.getAs[Double]("mean_y0"))) < 2e-6, r0.toString)
  }

  test("q91 ratio SE: proportional plant collapses jackknife AND delta to zero") {
    import spark.implicits._
    // user u: m = u+1 clicks, y = 2(u+1) purchases — y_i = 2 m_i for every
    // user, so every leave-one-out ratio equals 2 and both SEs vanish
    val ev = (1 to 5).flatMap { u =>
      Seq.fill(2 * (u + 1))((u.toLong, 1L, 0L)) ++
        Seq.fill(u + 1)((u.toLong, 0L, 1L))
    }.toDF("user_id", "yy", "mm")
    val got = operators.Analytics.ratioJackknife(ev).collect()(0)
    assert(got.getAs[Double]("ratio") == 2.0, got.toString)
    assert(got.getAs[Double]("se_jack") == 0.0, got.toString)
    assert(got.getAs[Double]("se_delta") == 0.0, got.toString)
    assert(got.getAs[Long]("sum_y") == 2L * got.getAs[Long]("sum_m"))
  }

  test("q91 on testdata: SEs positive and the two estimators agree in magnitude") {
    val r0 = operators.Analytics.q91RatioJackknife(spark, sfTiny).collect()(0)
    assert(r0.getAs[Long]("n_users") > 0)
    assert(r0.getAs[Double]("ratio") > 0.0)
    val (sj, sd) = (r0.getAs[Double]("se_jack"), r0.getAs[Double]("se_delta"))
    assert(sj > 0.0 && sd > 0.0, r0.toString)
    // asymptotically equal estimators: same order of magnitude even at n=15
    assert(sj / sd < 5.0 && sd / sj < 5.0, r0.toString)
  }

  test("q45 KMV sketch: exact below k, bounded error above, union merge law holds") {
    import spark.implicits._
    val out = Analytics.q45KmvSketch(spark, sfTiny).cache()
    try {
      val rows = out.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(rows.contains("_union"))
      rows.foreach { case (t, (n, _, est, err)) =>
        if (n < 64) assert(est == n.toDouble, s"$t: sketch not full must be exact")
        else assert(err <= 0.5, s"$t: rel_err $err (est $est vs exact $n)")
      }
      // union row counts ALL distinct users, ≥ any single type
      val unionN = rows("_union")._1
      rows.filter(_._1 != "_union").foreach { case (t, (n, _, _, _)) =>
        assert(n <= unionN, s"$t exceeds the union") }
      // merge law: the union's k-th smallest hash can only move down
      val unionKth = rows("_union")._2
      rows.filter(_._1 != "_union").foreach { case (t, (n, kth, _, _)) =>
        if (n >= 64) assert(unionKth <= kth,
          s"$t: union kth $unionKth must be <= per-type kth $kth") }
      assert(out.collect().sameElements(Analytics.q45KmvSketch(spark, sfTiny).collect()))
    } finally out.unpersist(blocking = false)
  }

  test("q114 Granger: a planted one-lag dependence is asymmetric; degenerate series guard") {
    import spark.implicits._
    // x is a deterministic pseudo-random walk input; y follows x's LAG
    // plus small deterministic noise -> x Granger-causes y, not the
    // reverse
    val xs = (0 until 200).map(t => ((t * 37) % 11).toDouble)
    val noise = (0 until 200).map(t => ((t * 13) % 7) * 0.01)
    val rows = (1 until 200).map { t =>
      (t.toLong * 3600L, xs(t), xs(t - 1) + noise(t))
    }
    val hourly = rows.toDF("hx", "x", "y")
    val out = Analytics.grangerOf(hourly).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    assert(out("x_causes_y") > 100.0,
      s"planted dependence must yield a large F: ${out("x_causes_y")}")
    assert(out("y_causes_x") < out("x_causes_y") / 10.0,
      s"the reverse direction must be far weaker: $out")
    // a CONSTANT input series degenerates (A = 0 / det = 0) -> NULL, no crash
    val const = (1 until 50).map(t => (t.toLong * 3600L, 1.0, (t % 5).toDouble))
      .toDF("hx", "x", "y")
    val c = Analytics.grangerOf(const).collect()
      .map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(c("y_causes_x"), "constant-u regression must be NULL (guarded)")
    // too-short series (n <= 3) -> NULL
    val short = (1 until 4).map(t => (t.toLong * 3600L, t.toDouble, (t * 2).toDouble))
      .toDF("hx", "x", "y")
    assert(Analytics.grangerOf(short).collect().forall(_.isNullAt(2)))
  }

  test("q116: Dunn post-hoc — hand-computed z, zero law, q66 agreement") {
    import spark.implicits._
    import graft.operators.Analytics
    // groups a={1,2}, b={3,4}: pooled ranks 1..4, no ties;
    // mean ranks 1.5 / 3.5, sigma2 = 4*5/12 = 5/3,
    // z = -2 / sqrt(5/3 * 1) = -1.549193 (6 dp)
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("source", "x")
    val d = Analytics.dunnPosthoc(rows).collect()
    assert(d.length == 1)
    assert(d(0).getAs[Double]("mean_rank_a") == 1.5 &&
      d(0).getAs[Double]("mean_rank_b") == 3.5, d(0).toString)
    assert(math.abs(d(0).getAs[Double]("z_stat") + 1.549193) < 1e-6,
      d(0).toString)
    // identically-distributed groups: z = 0 exactly (shared ranks)
    val z0 = Analytics.dunnPosthoc(
      Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L)).toDF("source", "x"))
      .collect()(0)
    assert(z0.getAs[Double]("z_stat") == 0.0, z0.toString)
    // pair count is C(k,2) over the same sources q66 reports
    val full = Analytics.dunnPosthoc(
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("source", "x"))
    assert(full.count() == 6)
  }

  test("q117: Cramer-von Mises — hand-computed T, zero law, KS companionship") {
    import spark.implicits._
    import graft.operators.Analytics
    // A={1,2}, B={3,4}: gaps at pooled points 1..4 are .5,1,.5,0 →
    // squared .25+1+.25+0 = 1.5; T = (2*2/16)*1.5 = 0.375
    val t = Analytics.cvmTest(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("source", "x"))
      .collect()(0)
    assert(t.getAs[Long]("n_a") == 2L && t.getAs[Long]("n_b") == 2L)
    assert(math.abs(t.getAs[Double]("cvm_stat") - 0.375) < 1e-6, t.toString)
    // identical samples: T = 0 exactly
    val z = Analytics.cvmTest(
      Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L)).toDF("source", "x"))
      .collect()(0)
    assert(z.getAs[Double]("cvm_stat") == 0.0, z.toString)
    // the "differs a little everywhere" case CvM exists for: a constant
    // shift spreads mass KS reads only at its single worst point
    val sh = Analytics.cvmTest(
      (1L to 40L).map(i => ("a", i)).union((1L to 40L).map(i => ("b", i + 1)))
        .toDF("source", "x")).collect()(0)
    assert(sh.getAs[Double]("cvm_stat") > 0.0, sh.toString)
  }

  test("q123: Mood median — hand-computed chi2, proportional zero, degenerate empty") {
    import spark.implicits._
    import graft.operators.Analytics
    // a={1,9,9,9}, b={1,1,1,9}: grand median 5, above = (3,1), margins
    // M=4 N=8 → e=2 per cell → chi2 = 4 * (1/2) = 2.0 exactly
    val rows = Seq(("a", 1L), ("a", 9L), ("a", 9L), ("a", 9L),
      ("b", 1L), ("b", 1L), ("b", 1L), ("b", 9L)).toDF("source", "x")
    val m = Analytics.moodMedian(rows).collect()
    assert(m.length == 2, m.mkString(";"))
    assert(m.forall(_.getAs[Double]("chi2_stat") == 2.0), m.mkString(";"))
    assert(m.find(_.getAs[String]("source") == "a").get
      .getAs[Double]("frac_above") == 0.75, m.mkString(";"))
    // proportional sources: observed ≡ expected → chi2 = 0 exactly
    val z = Analytics.moodMedian(
      Seq(("a", 1L), ("a", 9L), ("b", 1L), ("b", 9L)).toDF("source", "x"))
      .collect()
    assert(z.forall(_.getAs[Double]("chi2_stat") == 0.0), z.mkString(";"))
    // a point-mass corpus (nothing above its median) emits nothing
    val pm = Analytics.moodMedian(
      Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("source", "x"))
    assert(pm.count() == 0)
  }

  test("q124: Jarque-Bera — hand-computed moments, symmetric law, exclusions") {
    import spark.implicits._
    import graft.operators.{Analytics, Num}
    // {1..5}: symmetric → skewness 0 exactly; m2=2, m4=6.8 → K=1.7,
    // JB = 5/6 * (1.7-3)^2/4 through the engine's own double ops
    val sym = Analytics.jarqueBera(
      (1L to 5L).map(v => ("a", v)).toDF("source", "x")).collect()(0)
    assert(sym.getAs[Long]("n_docs") == 5L)
    assert(sym.getAs[Double]("skewness") == 0.0, sym.toString)
    assert(sym.getAs[Double]("kurtosis") == Num.rD(6.8 / 4.0, 6), sym.toString)
    assert(sym.getAs[Double]("jb_stat") ==
      Num.rD(5.0 / 6.0 * ((1.7 - 3.0) * (1.7 - 3.0) / 4.0), 6), sym.toString)
    // {1,1,1,9}: right-skewed — mirror the shared texts in plain doubles
    val sk = Analytics.jarqueBera(
      Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 9L)).toDF("source", "x"))
      .collect()(0)
    val (nn, sx, sxx, sx3, sx4) = (4.0, 12.0, 84.0, 732.0, 6564.0)
    val mean = sx / nn
    val m2 = sxx / nn - mean * mean
    val m3 = sx3 / nn - 3.0 * mean * sxx / nn + 2.0 * mean * mean * mean
    val m4 = sx4 / nn - 4.0 * mean * sx3 / nn +
      6.0 * mean * mean * sxx / nn - 3.0 * mean * mean * mean * mean
    val sS = m3 / (m2 * math.sqrt(m2))
    val kK = m4 / (m2 * m2)
    assert(sk.getAs[Double]("skewness") == Num.rD(sS, 6), sk.toString)
    assert(sk.getAs[Double]("jb_stat") ==
      Num.rD(nn / 6.0 * (sS * sS + (kK - 3.0) * (kK - 3.0) / 4.0), 6),
      sk.toString)
    // degenerate groups are excluded: constant (zero variance) and n < 4
    val ex = Analytics.jarqueBera(Seq(
      ("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L),
      ("d", 1L), ("d", 2L), ("d", 3L)).toDF("source", "x"))
    assert(ex.count() == 0, "zero-variance and small groups must be excluded")
  }

  test("q121: Anderson-Darling — hand-computed A2, identity law, tail sensitivity") {
    import spark.implicits._
    import graft.operators.{Analytics, Num}
    // A={1,2}, B={3,4} (q117's panel): per pooled value the doubled
    // mid-count terms are l*D'^2/den' = 4/3, 36/11, 36/11, 4/3 →
    // A2 = (3/(4*2*2)) * s10 = 1.727273 at the engine's rounding
    val t = Analytics.adTest(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("source", "x"))
      .collect()(0)
    assert(t.getAs[Long]("n_a") == 2L && t.getAs[Long]("n_b") == 2L)
    val s10 = 2.0 * Num.rD(1.0 * 2.0 * 2.0 / 3.0, 10) +
      2.0 * Num.rD(1.0 * 6.0 * 6.0 / 11.0, 10)
    assert(t.getAs[Double]("ad_stat") == Num.rD(3.0 / 16.0 * s10, 6), t.toString)
    // identical samples: D' = 0 at every pooled value → A2 = 0 exactly
    val z = Analytics.adTest(
      Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L)).toDF("source", "x"))
      .collect()(0)
    assert(z.getAs[Double]("ad_stat") == 0.0, z.toString)
    // point-mass pool (den' = 0 everywhere) skips cleanly to 0
    val pm = Analytics.adTest(
      Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("source", "x"))
      .collect()(0)
    assert(pm.getAs[Double]("ad_stat") == 0.0, pm.toString)
    // the tail case AD exists for: same bulk, one-sided extreme — AD
    // scores it harder relative to its own CvM than a bulk shift does
    val tail = Analytics.adTest(
      ((1L to 20L).map(i => ("a", i)) ++ (1L to 19L).map(i => ("b", i))
        ++ Seq(("b", 200L))).toDF("source", "x")).collect()(0)
    assert(tail.getAs[Double]("ad_stat") > 0.0, tail.toString)
  }

  test("q118: Friedman — perfect Q = n(k-1), tie panel, incomplete block, degeneracy") {
    import spark.implicits._
    import graft.operators.{Analytics, Num}
    // perfect consistency (A<B<C in every block): Q = n(k-1) = 6 exactly
    val perfect = Seq(
      (1L, "A", 1.0), (1L, "B", 2.0), (1L, "C", 3.0),
      (2L, "A", 10.0), (2L, "B", 20.0), (2L, "C", 30.0),
      (3L, "A", 5.0), (3L, "B", 7.0), (3L, "C", 9.0)).toDF("blk", "treat", "x")
    val p = Analytics.friedman(perfect).collect()
    assert(p.length == 3, p.mkString(";"))
    assert(p.forall(_.getAs[Double]("q_stat") == 6.0), p.mkString(";"))
    assert(p.map(r => (r.getAs[String]("event_type"),
      r.getAs[Double]("mean_rank"))).toSeq ==
      Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)), p.mkString(";"))
    // tie panel: block 3 has A=B (doubled midranks 3,3) — hand-derived
    // rs2 = (7, 11, 18), s4 = 62, a4 = 166, denom = 22 → Q = 124/22
    val tied = Seq(
      (1L, "A", 1.0), (1L, "B", 2.0), (1L, "C", 3.0),
      (2L, "A", 1.0), (2L, "B", 2.0), (2L, "C", 3.0),
      (3L, "A", 5.0), (3L, "B", 5.0), (3L, "C", 9.0)).toDF("blk", "treat", "x")
    val t = Analytics.friedman(tied).collect()
    assert(t.forall(_.getAs[Double]("q_stat") == Num.rD(2.0 * 62.0 / 22.0, 6)),
      t.mkString(";"))
    assert(t.find(_.getAs[String]("event_type") == "A").get
      .getAs[Double]("mean_rank") == Num.rD(7.0 / 6.0, 6), t.mkString(";"))
    // an INCOMPLETE block (missing treatment C) is excluded — n stays 3
    // and the statistic is unchanged
    val pi = Analytics.friedman(perfect.union(
      Seq((4L, "A", 1.0), (4L, "B", 2.0)).toDF("blk", "treat", "x"))).collect()
    assert(pi.forall(r => r.getAs[Long]("n_blk") == 3L &&
      r.getAs[Double]("q_stat") == 6.0), pi.mkString(";"))
    // all-tied blocks: denominator 0 → empty by pinned convention
    val flat = Seq(
      (1L, "A", 2.0), (1L, "B", 2.0), (1L, "C", 2.0),
      (2L, "A", 3.0), (2L, "B", 3.0), (2L, "C", 3.0)).toDF("blk", "treat", "x")
    assert(Analytics.friedman(flat).count() == 0)
  }

  test("q120: Nemenyi — hand-computed z, zero law, pair count") {
    import spark.implicits._
    import graft.operators.{Analytics, Num}
    val perfect = Seq(
      (1L, "A", 1.0), (1L, "B", 2.0), (1L, "C", 3.0),
      (2L, "A", 10.0), (2L, "B", 20.0), (2L, "C", 30.0),
      (3L, "A", 5.0), (3L, "B", 7.0), (3L, "C", 9.0)).toDF("blk", "treat", "x")
    val z = Analytics.nemenyi(perfect).collect()
    assert(z.length == 3, z.mkString(";")) // C(3,2) pairs
    // z(A,B) through the engine's own text: (ra-rb)/(2n) / sqrt(k(k+1)/(6n))
    val expAB = Num.rD(
      (6.0 - 12.0) / (2.0 * 3.0) / math.sqrt(3.0 * 4.0 / (6.0 * 3.0)), 6)
    val ab = z.find(r => r.getAs[String]("treat_a") == "A" &&
      r.getAs[String]("treat_b") == "B").get
    assert(ab.getAs[Double]("z_stat") == expAB, ab.toString)
    assert(ab.getAs[Double]("mean_rank_a") == 1.0 &&
      ab.getAs[Double]("mean_rank_b") == 2.0, ab.toString)
    // identically-ranked treatments (ties in every block): z = 0 exactly
    val same = Seq(
      (1L, "A", 1.0), (1L, "B", 1.0),
      (2L, "A", 2.0), (2L, "B", 2.0)).toDF("blk", "treat", "x")
    val z0 = Analytics.nemenyi(same).collect()(0)
    assert(z0.getAs[Double]("z_stat") == 0.0, z0.toString)
  }

  test("q119: Bartlett — hand-computed chi2, equal-variance zero, exclusions") {
    import spark.implicits._
    import graft.operators.{Analytics, Num}
    // a={1,2,3} (var 1), b={2,4,6} (var 4): sp2 = 2.5, C = 1.25,
    // chi2 = (4 ln 2.5 − 2 ln 4) / 1.25, all through the shared texts
    val rows = Seq(("m", "a", 1L), ("m", "a", 2L), ("m", "a", 3L),
      ("m", "b", 2L), ("m", "b", 4L), ("m", "b", 6L))
      .toDF("metric", "source", "x")
    val b = Analytics.bartlett(rows).collect()
    assert(b.length == 1, b.mkString(";"))
    assert(b(0).getAs[Long]("n_docs") == 6L && b(0).getAs[Long]("k_groups") == 2L)
    assert(b(0).getAs[Double]("pooled_var") == 2.5, b(0).toString)
    assert(b(0).getAs[Double]("c_factor") == 1.25, b(0).toString)
    val lnsum = Num.rD(2.0 * math.log(1.0), 10) + Num.rD(2.0 * math.log(4.0), 10)
    val exp = Num.rD((4.0 * math.log(2.5) - lnsum) / 1.25, 6)
    assert(b(0).getAs[Double]("chi2_stat") == exp, b(0).toString)
    // equal variances: the ln terms cancel the pooled ln → chi2 = 0
    val eq = Analytics.bartlett(
      Seq(("m", "a", 1L), ("m", "a", 2L), ("m", "a", 3L),
        ("m", "b", 4L), ("m", "b", 5L), ("m", "b", 6L))
        .toDF("metric", "source", "x")).collect()(0)
    assert(eq.getAs[Double]("chi2_stat") == 0.0, eq.toString)
    // zero-variance and singleton groups are EXCLUDED (ln undefined),
    // with n/k counted after the exclusion
    val ex = Analytics.bartlett(rows.union(
      Seq(("m", "c", 5L), ("m", "c", 5L), ("m", "d", 9L))
        .toDF("metric", "source", "x"))).collect()(0)
    assert(ex.getAs[Long]("k_groups") == 2L && ex.getAs[Long]("n_docs") == 6L,
      ex.toString)
  }
}
