package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {

  test("x07 phash: exact copy at hd 0, one-symbol edit at hd 1, different pattern absent") {
    import spark.implicits._
    val a32b32 = "a" * 32 + "b" * 32
    val docs = Seq(
      (1L, a32b32),                       // bits set exactly on 32..63
      (2L, a32b32),                       // byte-identical → hd 0
      (3L, "z" + a32b32.drop(1)),         // one symbol louder → one extra bit
      (4L, "ab" * 32),                    // alternating → no band shared with 1
      (5L, "abc")                         // shorter than the 64-symbol window
    ).toDF("doc_id", "text")
    val rows = Multimodal.phashNeardup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    assert(rows.contains((1L, 2L)) && rows((1L, 2L)).getAs[Long]("hd") == 0 &&
      rows((1L, 2L)).getAs[Int]("is_exact") == 1, rows.keys.toSeq)
    assert(rows.contains((1L, 3L)) && rows((1L, 3L)).getAs[Long]("hd") == 1 &&
      rows((1L, 3L)).getAs[Int]("is_exact") == 0, rows.keys.toSeq)
    assert(rows.contains((2L, 3L)) && rows((2L, 3L)).getAs[Long]("hd") == 1)
    // doc 4 shares no 16-bit band with 1/2/3; doc 5 never hashed
    assert(rows.keys.forall { case (x, y) => x != 4L && y != 4L && x != 5L && y != 5L },
      rows.keys.toSeq)
  }

  test("x07 on testdata: pair table is symmetric-free and within threshold") {
    import spark.implicits._
    val out = Multimodal.x07PhashNeardup(spark, sfTiny).cache()
    try {
      assert(out.filter($"doc_a" >= $"doc_b").count() == 0)
      assert(out.filter($"hd" > 3 || $"hd" < 0).count() == 0)
      // every exact text duplicate with ≥64 sanitized symbols must appear at hd 0
      val ft = Tables.documents(spark, sfTiny).select($"doc_id",
        regexp_replace(lower($"text"), "[^a-z0-9]", "").as("ft"))
        .filter(length($"ft") >= 64)
      val dupPairs = ft.as("x").join(ft.as("y"),
        col("x.ft") === col("y.ft") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).count()
      assert(out.filter($"hd" === 0).count() >= dupPairs)
    } finally out.unpersist(blocking = false)
  }

  test("x08 shard packing: objects land in the shard where they start, offsets exact") {
    import spark.implicits._
    // one stream, 10000-byte objects against the 16384-byte budget:
    // starts 0 / 10000 / 20000 / 30000 → shards 0, 0, 1, 1 with offsets
    // 0, 10000, 3616, 13616
    val objs = Seq((1L, 10000L), (2L, 10000L), (3L, 10000L), (4L, 10000L))
      .map { case (id, b) => ("s3", id, b) }.toDF("source", "doc_id", "n_bytes")
    val out = operators.Multimodal.shardPack(objs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard_id"), r.getAs[Long]("offset_bytes"))).toMap
    assert(out(1L) == (0L, 0L) && out(2L) == (0L, 10000L), s"$out")
    assert(out(3L) == (1L, 3616L) && out(4L) == (1L, 13616L), s"$out")
    // on testdata: manifest covers every doc, offsets within [0, budget)
    val td = operators.Multimodal.x08ShardPacking(spark, sfTiny).cache()
    try {
      assert(td.count() == Tables.documents(spark, sfTiny).count())
      assert(td.filter($"offset_bytes" < 0 || $"offset_bytes" >= 16384).count() == 0)
      // conservation per (source, grp, shard): bytes of its members equal
      // the cum deltas — implied by offsets; spot-check monotone shard ids
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"grp").orderBy($"doc_id")
      assert(td.withColumn("prev", lag($"shard_id", 1).over(w))
        .filter($"prev".isNotNull && $"shard_id" < $"prev").count() == 0)
    } finally td.unpersist(blocking = false)
  }

  test("x09 dedup-pack: manifest covers exactly the d04 survivors") {
    import spark.implicits._
    val out = operators.Multimodal.x09DedupPack(spark, sfTiny).cache()
    try {
      // row set = d04's winners, no duplicates packed
      assert(out.count() ==
        operators.TextOps.d04ExactDedup(spark, sfTiny).count())
      assert(out.select($"doc_id").distinct().count() == out.count())
      assert(out.filter($"offset_bytes" < 0 || $"offset_bytes" >= 16384)
        .count() == 0)
      // composition is a subset of the full x08 manifest's id space
      val full = operators.Multimodal.x08ShardPacking(spark, sfTiny)
        .select($"doc_id")
      assert(out.select($"doc_id").exceptAll(full).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("x10 frame overlap: an embedded clip scores its hand-computed containment") {
    import spark.implicits._
    // 64-char frames fi; A = f1..f10, B = f1..f5 + g1..g5 (5 shared →
    // containment 5/10 = 0.5), C disjoint
    def f(tag: String, i: Int): String = {
      val s = s"$tag$i"
      s + "x" * (64 - s.length)
    }
    val a = (1 to 10).map(f("fa", _)).mkString
    val b = ((1 to 5).map(f("fa", _)) ++ (1 to 5).map(f("gb", _))).mkString
    val c = (1 to 10).map(f("hc", _)).mkString
    val rows = Multimodal.frameOverlap(
      Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val p = rows(0)
    assert(p.getAs[Long]("doc_a") == 1L && p.getAs[Long]("doc_b") == 2L)
    assert(p.getAs[Long]("shared_frames") == 5L)
    assert(p.getAs[Long]("n_frames_a") == 10L && p.getAs[Long]("n_frames_b") == 10L)
    assert(p.getAs[Double]("containment") == 0.5)
  }

  test("x10 on testdata: canonical pairs, containment bounded, frames agree with x02") {
    import spark.implicits._
    val out = Multimodal.x10FrameOverlap(spark, sfTiny).cache()
    try {
      assert(out.count() <= 20)
      assert(out.filter($"doc_a" >= $"doc_b").count() == 0)
      assert(out.filter($"containment" <= 0 || $"containment" > 1.000001).count() == 0)
      // composition pin: per-doc distinct-frame totals equal x02's view
      val x2 = Multimodal.x02FrameSample(spark, sfTiny)
        .groupBy($"doc_id").agg(countDistinct($"frame_md5").as("nf2"))
      val bad = out.select($"doc_a".as("doc_id"), $"n_frames_a".as("nf"))
        .union(out.select($"doc_b", $"n_frames_b")).distinct()
        .join(x2, "doc_id").filter($"nf" =!= $"nf2").count()
      assert(bad == 0, "x10 frame totals must match x02's distinct hashes")
    } finally out.unpersist(blocking = false)
  }

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

  test("x06 CDC chunking re-synchronizes after a prefix shift (the anti-fixed-grid property)") {
    import spark.implicits._
    // pseudo-random base text: enough entropy that chunks are distinct
    // and cut windows occur (deterministic seed)
    val rnd = new scala.util.Random(42)
    val base = (1 to 1200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, base),                 // original
      (2L, "zq9" + base),         // 3-char insertion — breaks ANY fixed grid
      (3L, base)                  // byte-identical copy
    ).toDF("doc_id", "text")
    val rows = Multimodal.cdcReport(docs).collect().sortBy(_.getLong(0))
    val Array(a, b, c) = rows
    // cuts genuinely fired on the base text
    assert(a.getAs[Long]("n_chunks") > 3, s"only ${a.getAs[Long]("n_chunks")} chunks")
    // the identical copy dedups completely against doc 1
    assert(c.getAs[Long]("n_dup_chunks") == c.getAs[Long]("n_chunks"))
    assert(c.getAs[Double]("dup_ratio") == 1.0)
    // the shifted copy re-synchronizes at the first content-defined cut:
    // every chunk except the head (prefix-contaminated) chunk dedups
    assert(b.getAs[Long]("n_dup_chunks") == b.getAs[Long]("n_chunks") - 1,
      s"expected all but the head chunk to dedup, got $b")
    // doc 1 is first occurrence everywhere
    assert(a.getAs[Long]("n_dup_chunks") == 0L)
    // chunk algebra: chunk chars partition each doc's text
    assert(a.getAs[Long]("n_chars") == 1200L)
    assert(b.getAs[Long]("n_chars") == 1203L)
  }

  test("x06 on testdata: chunks partition chars, ratios bounded") {
    import spark.implicits._
    val out = Multimodal.x06CdcDedup(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // chunk chars per doc sum to the doc's length
      val viol = out.join(
          Tables.documents(spark, sfTiny).select($"doc_id", length($"text").as("tl")),
          "doc_id")
        .filter($"n_chars" =!= $"tl").count()
      assert(viol == 0, "CDC chunks must partition every document's chars")
      assert(out.filter($"dup_ratio" < 0 || $"dup_ratio" > 1).count() == 0)
      assert(out.filter($"n_dup_chunks" > $"n_chunks").count() == 0)
    } finally out.unpersist(blocking = false)
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
