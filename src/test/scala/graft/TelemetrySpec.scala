package graft

import org.apache.spark.sql.functions._
import graft.operators.Telemetry

class TelemetrySpec extends GraftSpec {

  test("t23 changepoint: exact step recovered, constant series ties to k=1 with gain 0") {
    import spark.implicits._
    // clean step 0→6 after hour 3: total SS = 54, all removed at k=3
    val step = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 6.0), (5L, 6.0), (6L, 6.0))
      .map { case (h, v) => ("a", h, v) } ++
      // constant series: every split gains 0 → tie-break picks k=1
      (1L to 4L).map(h => ("b", h, 5.0)) ++
      // single-hour series: no valid split → must be absent
      Seq(("c", 1L, 9.0))
    val out = Telemetry.changepoint(step.toDF("event_type", "hx", "x")).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(!out.contains("c") && out.size == 2, out.keys.toSeq)
    val a = out("a")
    assert(a.getAs[Long]("split_k") == 3 && a.getAs[Long]("split_hx") == 3 &&
      a.getAs[Long]("t_hours") == 6, a.toString)
    assert(a.getAs[Double]("gain") == 54.0 &&
      a.getAs[Double]("mean_left") == 0.0 &&
      a.getAs[Double]("mean_right") == 6.0 &&
      a.getAs[Double]("shift") == 6.0, a.toString)
    val b = out("b")
    assert(b.getAs[Long]("split_k") == 1 && b.getAs[Double]("gain") == 0.0 &&
      b.getAs[Double]("shift") == 0.0, b.toString)
  }

  test("t23 on testdata: valid split index and non-negative gain per type") {
    import spark.implicits._
    val out = Telemetry.t23Changepoint(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("split_k") >= 1 &&
        r.getAs[Long]("split_k") < r.getAs[Long]("t_hours"), r.toString)
      assert(r.getAs[Double]("gain") >= 0.0, r.toString)
    }
  }

  test("t22 heartbeat: planted stalling stream flags gappy, early-ending stream flags stale") {
    import spark.implicits._
    // A: 9 gaps of 10 then one of 100 → mean 19, max 100 > 4·19 (gappy),
    // last event defines the corpus clock (silent 0). B: steady cadence
    // 10 ending at 50 → silent 140 > 2·10 (stale), max = mean (not gappy)
    val a = (0 to 9).map(i => (1L, i * 10L)) :+ (1L -> 190L)
    val b = (0 to 5).map(i => (2L, i * 10L))
    val ev = (a ++ b).zipWithIndex
      .map { case ((u, tu), i) => (u, tu, i.toLong) }
      .toDF("user_id", "tu", "event_id")
    val rows = operators.Telemetry.heartbeat(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val ra = rows(1L); val rb = rows(2L)
    assert(ra.getAs[Double]("mean_gap_us") == 19.0 && ra.getAs[Long]("max_gap_us") == 100L, s"$ra")
    assert(ra.getAs[Int]("gappy") == 1 && ra.getAs[Int]("stale") == 0, s"$ra")
    assert(rb.getAs[Double]("mean_gap_us") == 10.0 && rb.getAs[Long]("silent_us") == 140L, s"$rb")
    assert(rb.getAs[Int]("gappy") == 0 && rb.getAs[Int]("stale") == 1, s"$rb")
  }

  test("t21 burn rate: planted incident pages, quiet hours stay exactly sub-threshold") {
    import spark.implicits._
    // 30 quiet hours (10 events, 1 error) + one incident hour (10/10):
    // base = 4/31, so quiet burn_1h = 0.775 and incident burn_1h = 7.75,
    // burn_6h = 1.9375, burn_24h = 1.065625 — all exact binary values
    val ev = (0 until 31).flatMap { h =>
      val errs = if (h == 30) 10 else 1
      (0 until 10).map(i => (h.toLong, if (i < errs) 1L else 0L))
    }.toDF("hx", "is_err")
    val rows = operators.Telemetry.burnRate(ev).collect()
      .map(r => r.getAs[Long]("hx") -> r).toMap
    assert(rows.size == 31)
    assert(rows(30L).getAs[Double]("burn_1h") == 7.75, s"${rows(30L)}")
    assert(rows(30L).getAs[Double]("burn_6h") == 1.9375, s"${rows(30L)}")
    assert(rows(30L).getAs[Double]("burn_24h") == 1.065625, s"${rows(30L)}")
    assert(rows(30L).getAs[Int]("alert") == 1)
    (0L until 30L).foreach { h =>
      assert(rows(h).getAs[Double]("burn_1h") == 0.775, s"${rows(h)}")
      assert(rows(h).getAs[Int]("alert") == 0, s"${rows(h)}")
    }
  }

  test("t21 on testdata: hour grid covered, alerts require both windows hot") {
    import spark.implicits._
    val out = operators.Telemetry.t21BurnRate(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"alert" === 1 &&
        ($"burn_1h" < 2.0 || $"burn_6h" < 1.5)).count() == 0)
      assert(out.filter($"burn_1h" < 0).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("twin has exactly 5% anomalies (without-replacement semantics)") {
    val df = Telemetry.twin(spark).cache()
    assert(df.count() == 10000L)
    assert(df.filter(col("is_anomaly") === 1).count() == 500L)
    df.unpersist()
  }

  test("twin distributions match the reference generator's branches") {
    val stats = Telemetry.twin(spark)
      .groupBy("is_anomaly")
      .agg(min("temperature").as("tmin"), max("temperature").as("tmax"),
        min("vibration").as("vmin"), max("vibration").as("vmax"),
        avg("temperature").as("tavg"), avg("vibration").as("vavg"))
      .collect().map(r => r.getInt(0) -> r).toMap
    val n = stats(0); val a = stats(1)
    // anomaly branch: temp U(80,100), vib U(3,5)
    assert(a.getAs[Double]("tmin") >= 80.0 && a.getAs[Double]("tmax") <= 100.0)
    assert(a.getAs[Double]("vmin") >= 3.0 && a.getAs[Double]("vmax") <= 5.0)
    // normal branch: temp ~N(68,3) → mean within 68±0.5; vib ~N(1.8,0.3) clipped ≥0
    assert(math.abs(n.getAs[Double]("tavg") - 68.0) < 0.5)
    assert(math.abs(n.getAs[Double]("vavg") - 1.8) < 0.2)
    assert(n.getAs[Double]("vmin") >= 0.0)
  }

  test("twin is linearly separable → threshold rule scores 1.00/1.00") {
    val row = Telemetry.t05ThresholdEval(spark, sfTiny).collect()(0)
    assert(row.getAs[Double]("precision") == 1.0, row.toString)
    assert(row.getAs[Double]("recall") == 1.0, row.toString)
    assert(row.getAs[Long]("tp") == 500L)
    assert(row.getAs[Long]("fp") == 0L)
  }

  test("twin is deterministic across invocations") {
    val a = Telemetry.twin(spark).orderBy("id").collect()
    val b = Telemetry.twin(spark).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("t03 compaction keeps exactly one row per (user_id, event_type)") {
    val df = Telemetry.t03LatestPerKey(spark, sfTiny)
    val dup = df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("t19 Kaplan–Meier: hand-computed curve with censoring and a terminal death") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // five sessions, gap 100 s, horizon = 2000: the dur-20 session ending
    // AT the horizon is censored; everything else is observed
    val sess = Seq((1000L, 10L), (1000L, 10L), (1000L, 20L), (1000L, 30L),
      (2000L, 20L))
      .toDF("endsec", "duration_s")
      .select(timestamp_seconds($"endsec").as("session_end"), $"duration_s")
    val out = Telemetry.kaplanMeier(sess, 100.0).collect()
    assert(out.length == 3, out.mkString("; "))
    def row(d: Long) = out.find(_.getAs[Long]("duration_s") == d).get
    // t=10: n=5, d=2 → S = 0.6       t=20: n=3, d=1, 1 censored → S = 0.4
    // t=30: n=d=1 (hazard 1) → S = 0 via the guarded branch
    assert(row(10).getAs[Long]("n_risk") == 5L && row(10).getAs[Long]("n_events") == 2L
      && row(10).getAs[Long]("n_censored") == 0L
      && row(10).getAs[Double]("survival") == 0.6, s"${row(10)}")
    assert(row(20).getAs[Long]("n_risk") == 3L && row(20).getAs[Long]("n_events") == 1L
      && row(20).getAs[Long]("n_censored") == 1L
      && row(20).getAs[Double]("survival") == 0.4, s"${row(20)}")
    assert(row(30).getAs[Long]("n_risk") == 1L && row(30).getAs[Long]("n_events") == 1L
      && row(30).getAs[Double]("survival") == 0.0, s"${row(30)}")
  }

  test("t27 reliability: counts conserve t26, availability and durations coherent") {
    import spark.implicits._
    val r0 = Telemetry.t27Reliability(spark, sfTiny).collect()(0)
    val eps = Telemetry.t26EpisodeMerge(spark, sfTiny).cache()
    try {
      assert(r0.getAs[Long]("n_episodes") == eps.count())
      assert(r0.getAs[Long]("n_users") ==
        eps.select($"user_id").distinct().count())
      // every episode lasts at least the 1h alert window
      assert(r0.getAs[Double]("mttr_s") >= 3600.0, s"$r0")
      val av = r0.getAs[Double]("availability")
      assert(av > 0.0 && av < 1.0, s"$r0")
      assert(r0.getAs[Double]("mtbf_s") > 0.0)
    } finally eps.unpersist(blocking = false)
  }

  test("t28 downtime Pareto: hand-shared three-user concentration table") {
    import spark.implicits._
    // user 1: 50s over two episodes, user 2: 30s, user 3: 20s
    val ep = Seq((1L, 40L), (1L, 10L), (2L, 30L), (3L, 20L))
      .toDF("user_id", "duration_s")
    val rows = operators.Telemetry.downtimePareto(ep).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getAs[Long]("n_episodes") == 2L &&
      rows(0).getAs[Long]("downtime_s") == 50L)
    assert(rows(0).getAs[Double]("share") == 0.5 &&
      rows(0).getAs[Double]("cum_share") == 0.5)
    assert(rows(1).getAs[Double]("cum_share") == 0.8)
    assert(rows(2).getAs[Double]("cum_share") == 1.0)
  }

  test("t28 on testdata: at most 20 rows, shares ordered and closing below 1") {
    import spark.implicits._
    val out = operators.Telemetry.t28DowntimePareto(spark, sfTiny).collect()
    assert(out.nonEmpty && out.length <= 20)
    val shares = out.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("share"))
    assert(shares.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val cums = out.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cum_share"))
    assert(cums.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(cums.last <= 1.000001)
  }

  test("t29 seasonal anomaly: an in-range break of the daily pattern tops the scan") {
    import spark.implicits._
    // 14 days of a pure hod pattern y = 10 + hod (range 10..33); one hour
    // (day 6, hod 1) reads 30.0 — inside the GLOBAL range, invisible to a
    // raw-outlier scan, but +19 against its own hour-of-day expectation
    val rows = for (d <- 0 until 14; hod <- 0 until 24) yield {
      val y = if (d == 6 && hod == 1) 30.0 else 10.0 + hod
      ("p", d * 86400L + hod * 3600L, y)
    }
    val flat = (0 until 48).map(i => ("flat", i * 3600L, 5.0))
    val out = operators.Telemetry.seasonalAnomaly(
      (rows ++ flat).toDF("event_type", "hx", "y")).collect()
    assert(!out.exists(_.getString(0) == "flat"), "zero-variance series must drop")
    val top = out.filter(_.getString(0) == "p").sortBy(_.getAs[Int]("rk"))
    assert(top.length == 3)
    assert(top(0).getAs[Long]("hx") == 6 * 86400L + 3600L, top(0).toString)
    assert(top(0).getAs[Double]("y") == 30.0)
    assert(top(0).getAs[Double]("score") > 3.0, top(0).toString)
  }

  test("t29 on testdata: exactly 3 ranked rows per surviving type") {
    import spark.implicits._
    val out = operators.Telemetry.t29SeasonalAnomaly(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      val perType = out.groupBy($"event_type").count().collect()
      assert(perType.forall(_.getLong(1) == 3L), perType.mkString(";"))
      assert(out.filter($"rk" < 1 || $"rk" > 3).count() == 0)
      assert(out.filter($"hod" < 0 || $"hod" > 23 || $"dow" < 0 || $"dow" > 6).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("t30 log-rank: hand-computed four-event interleaved groups") {
    import spark.implicits._
    // A events at t=1,3; B at t=2,4; no censoring (gap 0):
    // O_A = 2, E_A = 1/2 + 1/3 + 1/2 + 0 = 4/3, V = 1/4 + 2/9 + 1/4 = 13/18
    val sess = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L))
      .map { case (g, d) => (g, new java.sql.Timestamp(d * 1000L + 100000L), d) }
      .toDF("grp", "session_end", "duration_s")
    val rows = operators.Telemetry.logRank(sess, 0.0).collect()
    assert(rows.length == 1)
    val r0 = rows(0)
    assert(r0.getAs[Long]("n_sessions_a") == 2L && r0.getAs[Long]("events_a") == 2L)
    val e = 0.5 + 1.0 / 3.0 + 0.5
    val v = 0.25 + 2.0 / 9.0 + 0.25
    assert(r0.getAs[Double]("o_minus_e") == operators.Num.rD(2.0 - e, 6), r0.toString)
    assert(r0.getAs[Double]("var_sum") == operators.Num.rD(v, 6))
    assert(r0.getAs[Double]("z") == operators.Num.rD((2.0 - e) / math.sqrt(v), 6))
  }

  test("t30 on testdata: a hash split accepts the null comfortably") {
    import spark.implicits._
    val rows = operators.Telemetry.t30LogRank(spark, sfTiny).collect()
    assert(rows.length == 1)
    val r0 = rows(0)
    assert(r0.getAs[Long]("n_sessions_a") > 0 && r0.getAs[Long]("n_sessions_b") > 0)
    assert(r0.getAs[Double]("var_sum") > 0)
    // hash-split populations are exchangeable: |z| should be modest
    assert(math.abs(r0.getAs[Double]("z")) < 4.0, r0.toString)
  }

  test("t26 episode merge: chained overlaps fuse, long interval bridges, gaps split") {
    import spark.implicits._
    // user 1: [0,100] [50,150] [140,240] chain → one episode [0,240];
    // then a gap → [300,400] second episode.
    // user 2: [0,500] covers [100,200] AND bridges to [450,550] even
    // though [100,200] ended long before — running-max semantics
    // (a previous-row lag would wrongly split at 450)
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 50L, 150L), (1L, 3L, 140L, 240L),
      (1L, 4L, 300L, 400L),
      (2L, 5L, 0L, 500L), (2L, 6L, 100L, 200L), (2L, 7L, 450L, 550L))
      .toDF("user_id", "event_id", "st", "en")
    val out = Telemetry.episodeMerge(iv).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ep")) -> r).toMap
    assert(out.size == 3, out.keys.mkString(";"))
    val u1e1 = out((1L, 1L)); val u1e2 = out((1L, 2L)); val u2 = out((2L, 1L))
    assert(u1e1.getAs[Long]("ep_start") == 0L && u1e1.getAs[Long]("ep_end") == 240L
      && u1e1.getAs[Long]("n_alerts") == 3L, s"$u1e1")
    assert(u1e2.getAs[Long]("ep_start") == 300L && u1e2.getAs[Long]("n_alerts") == 1L)
    assert(u2.getAs[Long]("ep_start") == 0L && u2.getAs[Long]("ep_end") == 550L
      && u2.getAs[Long]("n_alerts") == 3L, s"$u2")
    assert(u2.getAs[Long]("duration_s") == 550L)
  }

  test("t25 gap interpolation: hand-computed line, edges degrade to LOCF/NOCB") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: 10 @t0, null @t10, null @t20, 40 @t30 → 20, 30 on the line;
    // user 2: null @t0 (leading → NOCB = 7), 7 @t10, null @t20 (trailing → LOCF)
    val ev = Seq(
      (1L, 0L, 1L, Some(10.0)), (1L, 10L, 2L, None),
      (1L, 20L, 3L, None), (1L, 30L, 4L, Some(40.0)),
      (2L, 0L, 5L, None), (2L, 10L, 6L, Some(7.0)), (2L, 20L, 7L, None))
      .toDF("user_id", "sec", "event_id", "v_raw")
      .select($"user_id", timestamp_seconds($"sec").as("ts"), $"event_id", $"v_raw")
    val out = Telemetry.gapInterpolate(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("v_interp"), r.getAs[Int]("fill_kind"))).toMap
    assert(out(1L) == (10.0, 0) && out(4L) == (40.0, 0))
    assert(out(2L) == (20.0, 1) && out(3L) == (30.0, 1), s"$out")
    assert(out(5L) == (7.0, 2) && out(7L) == (7.0, 2), s"$out")
  }

  test("t24 Nelson-Aalen: hand-computed hazard on the t19 fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sess = Seq((1000L, 10L), (1000L, 10L), (1000L, 20L), (1000L, 30L),
      (2000L, 20L))
      .toDF("endsec", "duration_s")
      .select(timestamp_seconds($"endsec").as("session_end"), $"duration_s")
    val out = Telemetry.nelsonAalen(sess, 100.0).collect()
    assert(out.length == 3, out.mkString("; "))
    def row(d: Long) = out.find(_.getAs[Long]("duration_s") == d).get
    // H accumulates d/n over the duration axis: 2/5 → +1/3 → +1 (d = n is
    // finite on the hazard scale — no guard branch exists here)
    val h10 = 2.0 / 5.0
    val h20 = h10 + 1.0 / 3.0
    val h30 = h20 + 1.0
    assert(row(10).getAs[Double]("cum_hazard") == operators.Num.rD(h10, 6), s"${row(10)}")
    assert(row(20).getAs[Double]("cum_hazard") == operators.Num.rD(h20, 6), s"${row(20)}")
    assert(row(30).getAs[Double]("cum_hazard") == operators.Num.rD(h30, 6), s"${row(30)}")
    val v30 = 2.0 / 25.0 + 1.0 / 9.0 + 1.0
    assert(row(30).getAs[Double]("hazard_se") == operators.Num.rD(math.sqrt(v30), 6))
    assert(row(30).getAs[Double]("surv_fh") == operators.Num.rD(math.exp(-h30), 6))
    // Fleming–Harrington ≥ Kaplan–Meier everywhere (standard inequality)
    val km = Telemetry.kaplanMeier(sess, 100.0).collect()
      .map(r => r.getAs[Long]("duration_s") -> r.getAs[Double]("survival")).toMap
    assert(out.forall(r => r.getAs[Double]("surv_fh") >=
      km(r.getAs[Long]("duration_s")) - 1e-9))
  }

  test("t19 on testdata: survival is a non-increasing [0,1] step function") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Telemetry.t19KaplanMeier(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"survival" < 0 || $"survival" > 1).count() == 0)
      val w = org.apache.spark.sql.expressions.Window.orderBy($"duration_s")
      assert(out.withColumn("prev", lag($"survival", 1).over(w))
        .filter($"prev".isNotNull && $"survival" > $"prev").count() == 0)
      // Σ n_events = # uncensored sessions (ending a gap before the horizon)
      val sess = Telemetry.t08Sessionize(spark, sfTiny)
        .select($"session_end", $"duration_s").cache()
      val tmax = sess.agg(max($"session_end".cast("double"))).collect()(0).getDouble(0)
      val uncens = sess.filter($"session_end".cast("double") <= tmax - 14400.0).count()
      assert(out.agg(sum($"n_events")).collect()(0).getLong(0) == uncens)
      sess.unpersist(blocking = false)
    } finally out.unpersist(blocking = false)
  }

  test("t08 session durations are non-negative and bounded by the span") {
    val df = Telemetry.t08Sessionize(spark, sfTiny)
    assert(df.filter(col("duration_s") < 0).count() == 0)
    assert(df.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("t32 OEE matches a hand-computed two-user plant") {
    import spark.implicits._
    // user 1: events at 0/3600/7200 s, one error → horizon 10800 s, one
    // 3600 s episode, quality 2/3, rate 3/(10800/3600) = 1.0
    // user 2: events at 0/3600, no errors → horizon 7200 s, avail 1,
    // quality 1, rate 2/(7200/3600) = 1.0 → fleet max rate = 1.0
    val ev = Seq(
      (1L, 0L, 0L), (1L, 3600L, 1L), (1L, 7200L, 0L),
      (2L, 0L, 0L), (2L, 3600L, 0L)).toDF("user_id", "es", "is_err")
    val eps = Seq((1L, 1L, 3600L, 7200L, 1L, 3600L))
      .toDF("user_id", "ep", "ep_start", "ep_end", "n_alerts", "duration_s")
    val got = operators.Telemetry.oeeReport(ev, eps)
      .collect().map(r0 => (r0.getLong(0), r0.getDouble(5), r0.getDouble(6),
        r0.getDouble(7), r0.getDouble(8))).toSeq
    // avail1 = 7200/10800 → 0.666667; oee1 = r(0.666667·1·0.666667) = 0.444445
    assert(got == Seq(
      (1L, 0.666667, 1.0, 0.666667, 0.444445),
      (2L, 1.0, 1.0, 1.0, 1.0)), got.toString)
  }

  test("t32 OEE factors stay in [0,1] and multiply to the reported OEE at sf0.001") {
    val df = Telemetry.t32Oee(spark, sfTiny).cache()
    try {
      Seq("avail", "perf", "quality", "oee").foreach { c =>
        assert(df.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of [0,1]")
      }
      // perf = 1 for at least one stream (the fleet-max definition)
      assert(df.filter(col("perf") === 1.0).count() >= 1)
      val bad = df.filter(
        abs(col("oee") - graft.operators.Num.r(col("avail") * col("perf") * col("quality"), 6))
          > 1e-9).count()
      assert(bad == 0, "oee must equal r(avail*perf*quality, 6)")
    } finally df.unpersist(blocking = false)
  }

  test("every telemetry query runs and returns rows at sf0.001") {
    Telemetry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfTiny).count() > 0, s"$name returned 0 rows")
    }
  }

  test("telemetry oracles cover every query") {
    assert(Telemetry.oracles.keySet == Telemetry.queries.keySet)
  }
}
