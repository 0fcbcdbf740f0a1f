package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Property-based tests (SURVEY.md §5.3): parse∘serialize identity, clip
  * non-negativity, dedup idempotence, window-sum conservation. ScalaCheck
  * generators sampled with fixed seeds (deterministic runs; each case
  * spins real Spark jobs, so case counts stay small).
  */
class PropertySpec extends GraftSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val telemetryGen = Gen.listOfN(20, for {
    m <- Gen.oneOf("m1", "m2", "NC_Machine_AC")
    t <- Gen.chooseNum(-50.0, 150.0)
    v <- Gen.chooseNum(-1.0, 8.0)
    ts <- Gen.chooseNum(1700000000L, 1800000000L)
  } yield (m, t, v, ts))

  test("property: parseWire(toWire(x)) == x for arbitrary telemetry") {
    import spark.implicits._
    samples(telemetryGen, 5).foreach { rows =>
      val df = rows.toDF("machineId", "temperature", "vibration", "timestamp")
      val back = StreamOps.parseWire(StreamOps.toWire(df))
        .select($"machineId", $"temperature", $"vibration",
          $"ts".cast("long").as("timestamp"))
      assert(back.count() == rows.length)
      assert(back.except(df).count() == 0)
    }
  }

  test("property: clip guardrail never yields negatives and is idempotent") {
    import spark.implicits._
    samples(Gen.listOfN(30, Gen.chooseNum(-10.0, 10.0)), 5).foreach { xs =>
      val df = xs.toDF("v").select(greatest($"v", lit(0.0)).as("c"))
      assert(df.filter($"c" < 0.0).count() == 0)
      val twice = df.select(greatest($"c", lit(0.0)).as("c2"), $"c")
      assert(twice.filter($"c2" =!= $"c").count() == 0)
    }
  }

  test("property: dropDuplicates is idempotent and minimal") {
    import spark.implicits._
    samples(Gen.listOfN(40, Gen.chooseNum(0, 5)), 5).foreach { keys =>
      val df = keys.zipWithIndex.toDF("k", "i")
      val once = df.dropDuplicates("k")
      assert(once.count() == keys.distinct.length)
      assert(once.dropDuplicates("k").count() == once.count())
    }
  }

  test("property: grouped sums conserve the global sum") {
    import spark.implicits._
    val gen = Gen.listOfN(50, for {
      g <- Gen.chooseNum(0, 3)
      v <- Gen.chooseNum(-1000, 1000)
    } yield (g, v))
    samples(gen, 5).foreach { rows =>
      val df = rows.toDF("g", "v")
      val global = df.agg(sum($"v".cast("long"))).collect()(0).getLong(0)
      val grouped = df.groupBy($"g").agg(sum($"v".cast("long")).as("s"))
        .agg(sum($"s")).collect()(0).getLong(0)
      assert(global == grouped)
    }
  }
}
