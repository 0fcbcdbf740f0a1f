package graft

import org.apache.spark.sql.functions._
import graft.operators.Telemetry

class TelemetrySpec extends GraftSpec {

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

  test("t08 session durations are non-negative and bounded by the span") {
    val df = Telemetry.t08Sessionize(spark, sfTiny)
    assert(df.filter(col("duration_s") < 0).count() == 0)
    assert(df.filter(col("session_end") < col("session_start")).count() == 0)
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
