package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only instrumentation for m03 SimHash stage costs.
  * Args: [sfDir] [cpus]. Not part of the library surface.
  */
object DebugM03 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m03] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = time("shingle")(
      DedupLsh.shingleDocs(
        graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))).cache())
    time("shingle count")(docs.count())
    val sigs = time("simhash")(DedupLsh.simHash(docs).cache())
    time("simhash count")(sigs.count())
    val segs = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("simhash"), k * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("seg_idx", "seg")))
    val bucketSizes = time("bucket histogram")(
      segs.groupBy("seg_idx", "seg").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
          sum(col("count") * (col("count") - 1) / 2).as("uncapped_pairs"))
        .collect()(0))
    println(s"[m03] buckets=${bucketSizes.getLong(0)} max=${bucketSizes.getLong(1)} uncappedPairs=${bucketSizes.get(2)}")
    val pairs = time("full simHashPairs")(DedupLsh.simHashPairs(docs))
    time("pairs materialize")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
