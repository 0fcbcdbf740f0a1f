package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends GraftSpec {

  test("e01 cosines are in [-1,1] and exactly 5 neighbors per query") {
    val df = Similarity.e01CosineTopK(spark, sfTiny).cache()
    assert(df.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() == 0)
    val counts = df.groupBy("query_id").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) == 5L))
    df.unpersist()
  }

  test("e01 rank-1 neighbor has the maximum cosine for its query") {
    val df = Similarity.e01CosineTopK(spark, sfTiny)
    val bad = df.groupBy("query_id").agg(max("cosine").as("mx")).as("m")
      .join(df.filter(col("rank") === 1).as("r"), "query_id")
      .filter(col("m.mx") =!= col("r.cosine"))
    assert(bad.count() == 0)
  }

  test("e03 LSH neighbors report exact cosines (verified subset of brute force)") {
    // every e03 (query, neighbor, cosine) must agree with the exact cosine
    // that e01's full scan computes for that same pair
    val approx = Similarity.e03LshAnn(spark, sfTiny)
      .select("query_id", "neighbor_id", "cosine")
    val exact = Similarity.e01CosineTopK(spark, sfTiny)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c2"))
    // pairs present in both must match exactly
    val joined = approx.join(exact, Seq("query_id", "neighbor_id"), "inner")
    assert(joined.filter(col("cosine") =!= col("c2")).count() == 0)
  }

  test("e03 achieves nonzero recall of the true top-5 at sf0.001") {
    val approx = Similarity.e03LshAnn(spark, sfTiny)
      .select("query_id", "neighbor_id")
    val exact = Similarity.e01CosineTopK(spark, sfTiny)
      .select("query_id", "neighbor_id")
    assert(approx.intersect(exact).count() > 0)
  }

  test("e04 pairs are canonical, sorted by cosine desc") {
    val rows = Similarity.e04NearDupPairs(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    val cosines = rows.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("e05 IVF neighbors report exact cosines and nonzero recall") {
    val approx = Similarity.e05IvfAnn(spark, sfTiny)
      .select("query_id", "neighbor_id", "cosine")
    val exact = Similarity.e01CosineTopK(spark, sfTiny)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c2"))
    val joined = approx.join(exact, Seq("query_id", "neighbor_id"), "inner")
    assert(joined.filter(col("cosine") =!= col("c2")).count() == 0)
    assert(joined.count() > 0)
  }

  test("e06 centroids: 64 dims per label, counts match label sizes") {
    val out = Similarity.e06LabelCentroids(spark, sfTiny).cache()
    try {
      val perLabel = out.groupBy("label").count().collect()
      assert(perLabel.nonEmpty && perLabel.forall(_.getLong(1) == 64L),
        "one centroid component per dimension")
      val sizes = Tables.embeddings(spark, sfTiny).groupBy("label").count()
        .withColumnRenamed("count", "n_label")
      val bad = out.join(sizes, "label")
        .filter(col("n_vectors") =!= col("n_label")).count()
      assert(bad == 0, "per-dim vector count equals label population")
    } finally out.unpersist()
  }

  test("e07 PQ codes: 8 codes in [0,16), mse ≥ 0, deterministic, exact for codebook vectors") {
    import spark.implicits._
    val out = Similarity.e07PqQuantize(spark, sfTiny).cache()
    try {
      val n = Tables.embeddings(spark, sfTiny).count()
      assert(out.count() == n)
      val bad = out.filter(size($"codes") =!= 8 ||
        exists($"codes", c => c < 0 || c > 15) || $"mse" < 0).count()
      assert(bad == 0)
      // a vector that IS centroid m must quantize to all-m codes with mse 0
      val stride = math.max(1L, n / 16)
      val centroidRows = out.filter($"vec_id" % stride === 0 && $"vec_id" / stride < 16)
      assert(centroidRows.filter($"mse" =!= 0.0).count() == 0,
        "codebook members reconstruct exactly")
      val rerun = Similarity.e07PqQuantize(spark, sfTiny).collect()
      assert(rerun.sameElements(out.collect()), "PQ assignment is deterministic")
    } finally out.unpersist()
  }

  test("similarity oracles cover the SQL-expressible queries") {
    assert(Similarity.oracles.keySet ==
      Similarity.queries.keySet -- Set("e03_lsh_ann", "e05_ivf_ann", "e07_pq_quantize"))
  }
}
