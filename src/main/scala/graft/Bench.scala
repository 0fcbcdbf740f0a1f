package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the driver environment is a 32-thread local JVM; shuffle.partitions
    // matches so every core gets exactly one reduce partition
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay session/codegen/parquet-footer startup outside the timings
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // optional args = query keys to bench (default: all) — local iteration aid
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
    val selected = if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
                   else SparkEntry.queries
    val results = selected.map { case (name, fn) =>
      // per-query session hygiene, outside the timed region: drop cached
      // plans AND any persistent RDD blocks a previous query left behind
      // (MLlib training caches, localCheckpoint blocks) — without this,
      // leftover storage + deferred GC lands on whichever query runs next
      // and makes timings order-dependent.
      spark.catalog.clearCache()
      // non-blocking: a blocking unpersist intermittently stalls 15-50 s
      // in local mode; the following System.gc gives removal a window
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Parquet count-star pushdown
      // and partial-agg collapse under-time scan-heavy shapes; the noop
      // write materializes every output row through the full plan
      val sec =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          Console.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1.0 } // sentinel: a crashing query must not look like a fast one
      name -> sec
    }
    // 3-decimal rounding keeps the whole line short enough to survive the
    // driver's bounded tail capture (full-precision lines got truncated →
    // unparseable in r1/r2)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
