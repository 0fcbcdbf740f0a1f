package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {

  test("x01 metadata matches the source table") {
    val meta = Multimodal.x01BinaryMeta(spark, sfTiny)
    assert(meta.count() == Tables.documents(spark, sfTiny).count())
    // n_bytes equals text length for pure-ASCII payloads; always ≥ char length
    val bad = meta.join(Tables.documents(spark, sfTiny), "doc_id")
      .filter(col("n_bytes") < length(col("text")))
    assert(bad.count() == 0)
  }

  test("x02 frames reassemble to the original text") {
    import spark.implicits._
    val frames = Tables.documents(spark, sfTiny)
      .filter(length($"text") > 0)
      .select($"doc_id",
        posexplode(expr(
          "transform(sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1)," +
            " i -> substr(text, i * 64 + 1, 64))")).as(Seq("frame_id", "frame")))
    val glued = frames.groupBy($"doc_id")
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(frame_id, frame))), x -> x.frame))").as("glued"))
    val diff = glued.join(Tables.documents(spark, sfTiny), "doc_id")
      .filter($"glued" =!= $"text")
    assert(diff.count() == 0)
  }

  test("x03 decode features agree with a SQL recomputation of byte stats") {
    import spark.implicits._
    val feats = Multimodal.x03DecodeFeatures(spark, sfTiny)
    // mean byte over pure-ASCII text == avg codepoint; recompute in SQL
    val sqlMean = Tables.documents(spark, sfTiny).select($"doc_id",
      expr("aggregate(transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1))), 0L, (a, c) -> a + c)")
        .cast("double").as("s"),
      length($"text").cast("double").as("n"))
      .select($"doc_id", (floor($"s" / $"n" * 1e6 + 0.5) / 1e6).as("expect"))
    val joined = feats.join(sqlMean, "doc_id")
      .filter($"mean_byte" =!= $"expect")
    assert(joined.count() == 0, joined.collect().take(3).mkString("; "))
  }

  test("x03 is deterministic and total") {
    val a = Multimodal.x03DecodeFeatures(spark, sfTiny).collect()
    val b = Multimodal.x03DecodeFeatures(spark, sfTiny).collect()
    assert(a.sameElements(b) && a.length == 500)
  }

  test("x03 decode init runs exactly once per partition (codec contract)") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sfTiny)
      .as[graft.operators.MediaRecord]
      .repartition(7) // a known partition count, > 1
    val inits = spark.sparkContext.longAccumulator("decode_inits")
    val n = Multimodal.decodeAll(media, () => inits.add(1)).count()
    assert(n == 500)
    // a real codec's context/model load sits in onInit: per-ROW init
    // (or per-partition re-init) would show up here as inits > 7
    assert(inits.value == 7L, s"expected 7 partition inits, got ${inits.value}")
  }

  test("x05 media dedup: groups partition the corpus, representatives minimal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Multimodal.x05MediaDedup(spark, sfTiny).cache()
    try {
      val n = Tables.documents(spark, sfTiny).count()
      assert(out.agg(sum($"n_copies")).collect()(0).getLong(0) == n,
        "content groups must partition the corpus")
      assert(out.select($"content_md5").distinct().count() == out.count())
      assert(out.filter($"reclaimed_bytes" =!=
        ($"n_copies" - 1) * $"n_bytes").count() == 0)
      // every doc's hash maps to a group whose representative is ≤ it
      val viol = Multimodal.x01BinaryMeta(spark, sfTiny)
        .join(out, "content_md5")
        .filter($"kept_doc_id" > $"doc_id").count()
      assert(viol == 0, "representative must be the minimal doc_id")
    } finally out.unpersist(blocking = false)
  }
}
