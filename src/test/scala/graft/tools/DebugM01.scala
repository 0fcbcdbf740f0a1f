package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only instrumentation for m01 MinHash LSH stage costs.
  * Args: [sfDir] [cpus]. Not part of the library surface.
  */
object DebugM01 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tick[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[m01] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }

    val docs = tick("shingle cache") {
      val d = DedupLsh.shingleDocs(
        graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))).cache()
      d.count(); d
    }
    // replicate minHashPairs internals
    val buckets = tick("signatures+buckets cache") {
      val b = DedupLsh.bucketsOf(docs).cache()
      println(s"[m01] bucket rows = ${b.count()}"); b
    }
    tick("bucket sizes") {
      val top = buckets.groupBy(col("band"), col("bh")).count()
        .orderBy(col("count").desc).limit(5).collect()
      println("[m01] top buckets: " + top.map(_.getLong(2)).mkString(","))
    }
    val cands = tick("candidates distinct") {
      val c = buckets.as("x")
        .join(buckets.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().cache()
      println(s"[m01] candidates = ${c.count()}"); c
    }
    tick("verify join + top500") {
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("ta"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("tb"))
      val inter = size(array_intersect(col("ta"), col("tb")))
      val uni = size(col("ta")) + size(col("tb")) - inter
      val n = cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("jaccard", Num.r(inter.cast("double") / uni, 6))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(500).count()
      println(s"[m01] verified rows = $n")
    }
    tick("full m01 fresh") {
      DedupLsh.m01MinHashPairs(spark, sfDir).count()
    }
    spark.stop()
  }
}
