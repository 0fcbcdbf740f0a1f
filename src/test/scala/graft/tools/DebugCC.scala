package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only instrumentation for the d09 star-contraction loop: prints
  * per-round edge counts and timings. Args: [sfDir] [cpus]. Not part of
  * the library surface.
  */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val s = spark

    def tick[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    def ckpt(df: DataFrame): (DataFrame, Seq[Int]) = {
      val before = s.sparkContext.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (s.sparkContext.getPersistentRDDs.keySet -- before).toSeq)
    }
    def free(ids: Seq[Int]): Unit = ids.foreach(id =>
      s.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    var (edges, edgeIds) = tick("pairs ckpt") {
      ckpt(TextOps.nearDupPairs(s, sfDir).select($"doc_a".as("src"), $"doc_b".as("dst")))
    }
    var (labels, labelIds) = ckpt(graft.Tables.documents(s, sfDir)
      .select($"doc_id".as("node"), $"doc_id".as("label")))
    var iter = 0
    var nEdges = tick("edge count")(edges.count())
    println(s"[cc] edges = $nEdges")
    while (nEdges > 0 && iter < 50) {
      tick(s"round $iter (in=$nEdges)") {
        val m = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
          .groupBy($"src").agg(min($"dst").as("mn"))
          .select($"src".as("v"), least($"src", $"mn").as("rep"))
        val (labels2, labelIds2) = ckpt(
          labels.join(m, $"label" === $"v", "left")
            .select($"node", coalesce($"rep", $"label").as("label")))
        val mu = m.select($"v".as("uv"), $"rep".as("ru"))
        val mv = m.select($"v".as("vv"), $"rep".as("rv"))
        val (edges2, edgeIds2) = ckpt(
          edges.join(mu, $"src" === $"uv").join(mv, $"dst" === $"vv")
            .select(least($"ru", $"rv").as("src"), greatest($"ru", $"rv").as("dst"))
            .filter($"src" =!= $"dst")
            .distinct())
        free(labelIds); free(edgeIds)
        labels = labels2; labelIds = labelIds2
        edges = edges2; edgeIds = edgeIds2
        nEdges = edges.count()
      }
      iter += 1
    }
    free(edgeIds)
    val out = tick("final window+sort") {
      labels
        .withColumn("cluster_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"label")))
        .select($"node".as("doc_id"), $"label".as("cluster_id"), $"cluster_size")
        .orderBy($"doc_id").count()
    }
    println(s"[cc] rounds=$iter rows=$out")
    spark.stop()
  }
}
