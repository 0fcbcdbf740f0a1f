package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends GraftSpec {

  test("d39 novelty: hand-countable first occurrences on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c d e f"), // grams {a b c d e, b c d e f} — both first here
      (2L, "s1", "a b c d e f"), // exact repeat → 0 novel
      (3L, "s2", "a b c d e x"), // one seen gram, one new → 0.5
      (4L, "s2", "hi there")     // too short for a 5-gram → 0 grams
    ).toDF("doc_id", "source", "text")
    val out = Curation.noveltyReport(docs).collect()
    assert(out.length == 2)
    val s1 = out.find(_.getAs[String]("source") == "s1").get
    assert(s1.getAs[Long]("n_docs") == 2L && s1.getAs[Long]("n_grams") == 4L
      && s1.getAs[Long]("n_novel") == 2L, s"$s1")
    assert(s1.getAs[Double]("novelty_ratio") == 0.5
      && s1.getAs[Double]("mean_doc_novelty") == 0.5, s"$s1")
    val s2 = out.find(_.getAs[String]("source") == "s2").get
    assert(s2.getAs[Long]("n_docs") == 2L && s2.getAs[Long]("n_grams") == 2L
      && s2.getAs[Long]("n_novel") == 1L, s"$s2")
    assert(s2.getAs[Double]("novelty_ratio") == 0.5
      && s2.getAs[Double]("mean_doc_novelty") == 0.25, s"$s2")
  }

  test("d39 on testdata: every distinct gram is novel exactly once") {
    import spark.implicits._
    val out = Curation.d39Novelty(spark, sfTiny).cache()
    try {
      val docs = Tables.documents(spark, sfTiny)
      assert(out.agg(sum($"n_docs")).collect()(0).getLong(0) == docs.count())
      // Σ n_novel over sources = # distinct 5-grams in the corpus (each
      // gram has exactly one first occurrence)
      val distinctGrams = docs
        .select(graft.operators.TextOps.toks(lower($"text")).as("tk"))
        .select(explode(Curation.gramsCol(5)).as("g")).distinct().count()
      assert(out.agg(sum($"n_novel")).collect()(0).getLong(0) == distinctGrams)
      assert(out.filter($"novelty_ratio" < 0 || $"novelty_ratio" > 1 ||
        $"mean_doc_novelty" < 0 || $"mean_doc_novelty" > 1).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("d16 decontamination: benchmark docs excluded, ratios bounded, flag consistent") {
    import spark.implicits._
    val out = Curation.d16Decontaminate(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // no benchmark member leaks into the train-side report
      val benchLeak = out.filter(
        ((($"doc_id" * 48271L + 37L) % 1000003L) % 1000L) < Curation.BenchPermille).count()
      assert(benchLeak == 0)
      // hits are a subset of the doc's own distinct trigrams
      assert(out.filter($"n_hits" > $"n_ngrams" || $"n_hits" < 0).count() == 0)
      assert(out.filter($"contam_ratio" < 0.0 || $"contam_ratio" > 1.0).count() == 0)
      // the gate fires exactly on the rounded ratio
      val flagViol = out.filter(
        ($"contaminated" === 1) =!= ($"contam_ratio" >= Curation.ContamThreshold)).count()
      assert(flagViol == 0)
    } finally out.unpersist()
  }

  test("d17 PII scrub: planted PII is found and masked, clean docs untouched") {
    import spark.implicits._
    val out = Curation.d17PiiScrub(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // every 7th doc got an email planted; every 11th a phone
      assert(out.filter($"doc_id" % 7 === 0 && $"n_emails" < 1).count() == 0)
      assert(out.filter($"doc_id" % 11 === 0 && $"n_phones" < 1).count() == 0)
      // docs with nothing planted have nothing redacted
      val cleanViol = out.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 11 =!= 0 &&
        ($"n_emails" =!= 0 || $"n_phones" =!= 0 || $"n_masked_chars" =!= 0)).count()
      assert(cleanViol == 0)
      // masking strictly shortens dirty text (<EMAIL>/<PHONE> are shorter
      // than any planted literal)
      assert(out.filter($"is_dirty" === 1 && $"n_masked_chars" <= 0).count() == 0)
    } finally out.unpersist()
  }

  test("d18 repetition filter: ratios bounded, distinct <= total, gate on rounded values") {
    import spark.implicits._
    val out = Curation.d18RepetitionFilter(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"n_distinct_tokens" > $"n_tokens").count() == 0)
      assert(out.filter($"top_token_ratio" < 0.0 || $"top_token_ratio" > 1.0).count() == 0)
      assert(out.filter($"dup_bigram_ratio" < 0.0 || $"dup_bigram_ratio" > 1.0).count() == 0)
      // the most frequent token accounts for at least 1/n of the mass
      // (up to the r6 floor-rounding of the ratio: 1/7 rounds to 0.142857)
      assert(out.filter(($"top_token_ratio" + 1e-6) * $"n_tokens" < 1.0).count() == 0)
      val flagViol = out.filter(($"repetitive" === 1) =!=
        ($"top_token_ratio" >= Curation.TopTokThreshold ||
          $"dup_bigram_ratio" >= Curation.DupBigramThreshold)).count()
      assert(flagViol == 0)
    } finally out.unpersist()
  }

  test("d19 domain mix: rates respect weights, every kept row passes its LCG gate") {
    import spark.implicits._
    val out = Curation.d19DomainMix(spark, sfSmall).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"permille" <= 0 || $"permille" > 1000).count() == 0)
      // acceptance is exactly the scan-local LCG predicate
      val gateViol = out.filter(
        ((($"doc_id" * 48271L + 101L) % 1000003L) % 1000L) >= $"permille").count()
      assert(gateViol == 0)
      // a head source (weight 300) is sampled at a higher rate than any
      // tail source (weight 25)
      val head = out.filter($"source" === "src0").agg(max($"permille")).collect()(0).getLong(0)
      val tail = out.filter(!$"source".isin("src0", "src1", "src2", "src3", "src4"))
        .agg(max($"permille")).collect()(0).getLong(0)
      assert(head > tail, s"head $head tail $tail")
    } finally out.unpersist()
  }

  test("d29 temperature mix: smallest lang kept whole, rates anti-monotone in size") {
    import spark.implicits._
    val out = Curation.d29TemperatureMix(spark, sfSmall).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"permille" <= 0 || $"permille" > 1000).count() == 0)
      // acceptance is exactly the scan-local LCG predicate (inc = 103)
      val gateViol = out.filter(
        ((($"doc_id" * 48271L + 103L) % 1000003L) % 1000L) >= $"permille").count()
      assert(gateViol == 0)
      // α = 1/4 flattening: acceptance rate strictly anti-monotone in
      // language size, and the smallest language keeps everything
      val nl = Tables.documents(spark, sfSmall).groupBy($"lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val pm = out.groupBy($"lang").agg(max($"permille").as("p"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySize = nl.toSeq.sortBy(_._2)
      assert(pm(bySize.head._1) == 1000L, "smallest lang must keep all docs")
      bySize.sliding(2).foreach { case Seq((la, na), (lb, nb)) =>
        if (na < nb) assert(pm(la) >= pm(lb), s"$la ($na) vs $lb ($nb)")
      }
      // every kept lang's permille matches the closed-form rate
      val n = nl.values.sum.toDouble
      val amax = nl.values.map(c => math.sqrt(math.sqrt(c / n)) / c).max
      nl.foreach { case (l, c) =>
        val want = math.floor(math.sqrt(math.sqrt(c / n)) / c / amax * 1000.0).toLong
        assert(pm(l) == want, s"lang $l: got ${pm(l)} want $want")
      }
    } finally out.unpersist()
  }

  test("d22 dataset card: metrics bounded and consistent with their source queries") {
    import spark.implicits._
    val row = Curation.d22DatasetCard(spark, sfTiny).collect()(0)
    val nDocs = row.getAs[Long]("n_docs")
    assert(nDocs > 0 && row.getAs[Long]("n_tokens") > 0)
    assert(row.getAs[Double]("avg_doc_tokens") > 0)
    val dup = row.getAs[Double]("dup_ratio")
    assert(dup >= 0.0 && dup < 1.0)
    // 5-language corpus: entropy in (0, ln 5]
    val ent = row.getAs[Double]("lang_entropy")
    assert(ent > 0.0 && ent <= math.log(5.0) + 1e-9, s"entropy $ent")
    val q = row.getAs[Double]("avg_quality")
    assert(q >= 0.0 && q <= 1.0)
    // dup_ratio agrees with d04's fingerprint groups
    val distinctFp = graft.operators.TextOps.d04ExactDedup(spark, sfTiny).count()
    val allDocs = graft.Tables.documents(spark, sfTiny)
      .filter(length($"text") > 0).count()
    assert(math.abs(dup - (1.0 - distinctFp.toDouble / allDocs)) < 1e-5)
  }

  test("d23 composed pipeline: packed output keyed uniquely, benchmark never trained on") {
    import spark.implicits._
    val out = Curation.d23CurationPacking(spark, sfSmall).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"n_docs" < 1 || $"seq_tokens" <= 0).count() == 0)
      assert(out.groupBy($"lang", $"shard", $"seq_id").count()
        .filter($"count" > 1).count() == 0)
      // decontamination excludes the held-out benchmark entirely: no
      // sequence can START with a benchmark member
      val benchLeak = out.filter(
        ((($"first_doc" * 48271L + 37L) % 1000003L) % 1000L) < Curation.BenchPermille).count()
      assert(benchLeak == 0)
      // the mixture stage ran: the packed corpus is a strict subset of the
      // survivors (fewer packed docs than documents overall)
      val packedDocs = out.agg(sum($"n_docs")).collect()(0).getLong(0)
      val allDocs = graft.Tables.documents(spark, sfSmall)
        .filter(length($"text") > 0).count()
      assert(packedDocs > 0 && packedDocs < allDocs, s"$packedDocs of $allDocs")
    } finally out.unpersist()
  }

  test("d20 sequence packing: token mass conserved, sequences keyed uniquely") {
    import spark.implicits._
    val out = Curation.d20SeqPacking(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      // packing moves every token into exactly one sequence
      val packed = out.agg(sum($"seq_tokens")).collect()(0).getLong(0)
      val total = graft.Tables.documents(spark, sfTiny)
        .agg(sum(size(org.apache.spark.sql.functions.split(trim(col("text")), "\\s+")))
          .cast("long")).collect()(0).getLong(0)
      // toks drops empty tokens; recompute with the shared tokenizer
      val totalToks = graft.Tables.documents(spark, sfTiny)
        .agg(sum(size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")))
          .cast("long")).collect()(0).getLong(0)
      assert(packed == totalToks, s"packed $packed total $totalToks (raw $total)")
      assert(out.filter($"n_docs" < 1 || $"seq_tokens" < 0).count() == 0)
      // (lang, shard, seq_id) is the grouping key — must be unique
      assert(out.groupBy($"lang", $"shard", $"seq_id").count()
        .filter($"count" > 1).count() == 0)
    } finally out.unpersist()
  }

  test("d46 source overlap: hand-computed containment on a planted 3-source corpus") {
    import spark.implicits._
    // A has grams {abcde, bcdef}; B has {abcde, bcdex}; C has {pqrst}
    // → C(A→B) = C(B→A) = 1/2; every pair with C is 0; matrix = 6 rows
    val docs = Seq(
      ("A", "a b c d e f"),
      ("B", "a b c d e x"),
      ("C", "p q r s t")).toDF("source", "text")
    val out = operators.Curation.sourceOverlap(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    assert(out.size == 6, out.keys.mkString(";"))
    assert(out(("A", "B")).getAs[Long]("n_grams_a") == 2L)
    assert(out(("A", "B")).getAs[Long]("n_shared") == 1L)
    assert(out(("A", "B")).getAs[Double]("containment") == 0.5)
    assert(out(("B", "A")).getAs[Double]("containment") == 0.5)
    assert(out(("C", "A")).getAs[Long]("n_grams_a") == 1L)
    Seq(("A", "C"), ("B", "C"), ("C", "A"), ("C", "B")).foreach { k =>
      assert(out(k).getAs[Double]("containment") == 0.0, s"$k ${out(k)}")
    }
  }

  test("ml19 PSI: full grid, non-negative terms, shares sum to 1, hash split is stable") {
    import spark.implicits._
    val out = operators.Curation.ml19PsiDrift(spark, sfTiny).cache()
    try {
      // 2 features × 10 bins, every term ≥ 0 ((p−q) and ln(p/q) share sign)
      assert(out.count() == 20)
      assert(out.select($"feature").distinct().count() == 2)
      assert(out.filter($"psi_term" < 0).count() == 0)
      // smoothed shares sum to exactly 1 per feature (up to r6 per-bin slack)
      val sums = out.groupBy($"feature")
        .agg(sum($"p_train").as("sp"), sum($"p_test").as("sq")).collect()
      assert(sums.forall(r => math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4 &&
        math.abs(r.getAs[Double]("sq") - 1.0) < 1e-4), sums.mkString(";"))
      // psi ≈ Σ terms, and an md5 hash split must read as stable drift
      val byF = out.collect().groupBy(_.getAs[String]("feature"))
      byF.foreach { case (f, rows) =>
        val psi = rows.head.getAs[Double]("psi")
        val st = rows.map(_.getAs[Double]("psi_term")).sum
        assert(math.abs(psi - st) < 1e-4, s"$f: $psi vs $st")
        assert(psi >= 0.0 && psi < 0.25, s"$f psi=$psi")
      }
    } finally out.unpersist(blocking = false)
  }

  test("ml20 info gain: determining feature scores ig_ratio 1, constant feature 0") {
    import spark.implicits._
    // 'det': x = 1 for en, 100 for fr → bins separate perfectly → MI = H(lang)
    // 'flat': constant → one bin → MI = 0
    val rows = (0 until 8).flatMap { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      Seq((lang, "det", if (i % 2 == 0) 1.0 else 100.0), (lang, "flat", 5.0))
    }
    val out = operators.Curation.infoGain(rows.toDF("lang", "feature", "x"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(out("det").getAs[Double]("ig_ratio") == 1.0, s"${out("det")}")
    assert(out("det").getAs[Double]("mi") == out("det").getAs[Double]("h_label"))
    // H(lang) for a 4/4 split = ln 2
    assert(out("det").getAs[Double]("h_label") == operators.Num.rD(math.log(2.0), 6))
    assert(out("flat").getAs[Double]("mi") == 0.0 &&
      out("flat").getAs[Double]("ig_ratio") == 0.0, s"${out("flat")}")
    // testdata: both features in [0, 1] ratio range, MI ≤ H
    val td = operators.Curation.ml20InfoGain(spark, sfTiny).collect()
    assert(td.length == 2)
    td.foreach { r =>
      assert(r.getAs[Double]("ig_ratio") >= 0.0 && r.getAs[Double]("ig_ratio") <= 1.0, s"$r")
      assert(r.getAs[Double]("mi") <= r.getAs[Double]("h_label") + 1e-9)
    }
  }

  test("s06 time split: planted boundary at p80, overlap counts the straddling user") {
    import spark.implicits._
    // 10 points 1..10 → p80 = 8.2; train = {1..8}, test = {9,10};
    // user 1 is active on both sides, user 2 only in train
    val ev = ((1 to 8).map(i => (if (i <= 4) 1L else 2L, i.toDouble)) ++
      Seq((1L, 9.0), (1L, 10.0))).toDF("user_id", "x")
    val out = operators.Curation.timeSplit(ev).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    val tr = out("train"); val te = out("test")
    assert(tr.getAs[Double]("boundary") == 8.2 && te.getAs[Double]("boundary") == 8.2)
    assert(tr.getAs[Long]("n_events") == 8 && te.getAs[Long]("n_events") == 2, s"$tr $te")
    assert(tr.getAs[Long]("n_users") == 2 && te.getAs[Long]("n_users") == 1)
    assert(tr.getAs[Long]("n_overlap_users") == 1)
    assert(tr.getAs[Double]("max_ts") <= 8.2 && te.getAs[Double]("min_ts") > 8.2)
  }

  test("d35 split leakage matches a full driver-side reimplementation at sfTiny") {
    import spark.implicits._
    import graft.operators.Curation
    val out = Curation.d35SplitLeakage(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_ngrams"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("leak_ratio"), r.getAs[Int]("leaked")))).toMap
    // independent recompute: split labels via s03 (the shared h60
    // expression), then plain Scala 5-gram sets
    val splits = graft.operators.Advanced.s03HashSplit(spark, sfTiny)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, sfTiny)
      .select($"doc_id", lower($"text").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), splits(r.getLong(0))))
    def grams(t: String): Set[String] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.length < Curation.LeakN) Set.empty
      else ws.sliding(Curation.LeakN).map(_.mkString(" ")).toSet
    }
    val trainGrams = docs.filter(_._3 == "train").flatMap(d => grams(d._2)).toSet
    val test = docs.filter(_._3 == "test")
    assert(out.keySet == test.map(_._1).toSet, "one row per test doc")
    test.foreach { case (id, t, _) =>
      val gs = grams(t)
      val hits = gs.count(trainGrams.contains)
      val (n, h, ratio, leaked) = out(id)
      assert(n == gs.size && h == hits.toLong, s"doc $id: counts")
      val want = if (gs.isEmpty) 0.0
        else graft.operators.Num.rD(hits.toDouble / gs.size, 6)
      assert(ratio == want, s"doc $id: ratio $ratio vs $want")
      assert(leaked == (if (ratio >= Curation.LeakTau) 1 else 0))
    }
  }
  test("s08 purged k-fold: exact fold grid, purge/embargo windows, single-block edge") {
    import spark.implicits._
    import graft.operators.Curation
    // one event per hour 0..99, k=5, g=10: fold f covers [20f, 20f+19]
    val out = Curation.purgedKfold((0L until 100L).toDF("h"), 5, 10L)
      .collect().map(r => (r.getAs[Long]("fold_id"), r)).toMap
    assert(out.size == 5)
    (0L to 4L).foreach { f =>
      val r = out(f)
      assert(r.getAs[Long]("n_test") == 20L, s"fold $f: $r")
      assert(r.getAs[Long]("f_start") == 20 * f &&
        r.getAs[Long]("f_end") == 20 * f + 19, s"fold $f: $r")
      // purge: the 10 hours before the fold (clipped at the axis start)
      val purged = if (f == 0) 0L else 10L
      // embargo: the 10 hours after (clipped at the axis end)
      val embargoed = if (f == 4) 0L else 10L
      assert(r.getAs[Long]("n_purged") == purged, s"fold $f: $r")
      assert(r.getAs[Long]("n_embargoed") == embargoed, s"fold $f: $r")
      assert(r.getAs[Long]("n_train") == 100L - 20L - purged - embargoed,
        s"fold $f: $r")
    }
    // train/test/purge/embargo PARTITION the axis per fold (nothing lost)
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_test") + r.getAs[Long]("n_train") +
        r.getAs[Long]("n_purged") + r.getAs[Long]("n_embargoed") == 100L)
    }
    // degenerate single-hour axis: everything lands in fold 0 as test
    val one = Curation.purgedKfold(Seq(7L, 7L, 7L).toDF("h"), 5, 24L)
      .collect()
    assert(one.length == 1 && one(0).getAs[Long]("fold_id") == 0L &&
      one(0).getAs[Long]("n_test") == 3L &&
      one(0).getAs[Long]("n_train") == 0L, one.mkString(";"))
  }
}
