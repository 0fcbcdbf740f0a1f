package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupLsh

class DedupLshSpec extends GraftSpec {

  /** crafted corpus: 0≡1 exact dup; 2 = one word changed vs 0 (near dup);
    * 3 unrelated; 4 = 0's tokens reshuffled (same unigram set, different
    * shingles — must NOT count as an exact shingle dup). */
  private lazy val crafted = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      (0L, base),
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),
      (3L, "completely different content about spark query engines and shuffles at scale"),
      (4L, base.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("m01 finds exact duplicates with jaccard 1.0 on a crafted corpus") {
    val pairs = DedupLsh.minHashPairs(DedupLsh.shingleDocs(crafted)).collect()
    val exact = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(exact.isDefined, pairs.mkString("; "))
    assert(exact.get.getAs[Double]("jaccard") == 1.0)
    // one-word-changed doc 2 sits at shingle-jaccard ≈ 0.625: below the
    // 4×8 banding's reliable-recall zone (P ≈ 9%), so LSH may legitimately
    // skip it — but IF reported it must be exact-verified ≥ 0.5
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
    // unrelated doc 3 pairs with nothing
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("m02 simhash: identical texts share signatures, near texts are close") {
    val sigs = DedupLsh.simHash(DedupLsh.shingleDocs(crafted))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(0L) == sigs(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(2L)) < hamming(sigs(0L), sigs(3L)),
      s"near-dup ${hamming(sigs(0L), sigs(2L))} vs unrelated ${hamming(sigs(0L), sigs(3L))}")
  }

  test("m03 pairs exact duplicates at hamming 0 on the crafted corpus") {
    val pairs = DedupLsh.simHashPairs(DedupLsh.shingleDocs(crafted)).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L &&
      r.getAs[Int]("hamming") == 0), pairs.mkString("; "))
  }

  test("d51 edit dedup: exact dup at sim 1, hand-computed edit similarity, bounded") {
    import spark.implicits._
    val rows = DedupLsh.editDedup(crafted).collect()
    // exact dup 0≡1: lev 0, sim 1, ranked first
    val exact = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(exact.isDefined, rows.mkString("; "))
    assert(exact.get.getAs[Long]("lev") == 0L &&
      exact.get.getAs[Double]("edit_sim") == 1.0)
    assert(rows.head.getAs[Double]("edit_sim") == 1.0)
    // any reported pair has sim in [0,1] and lev consistent with it
    assert(rows.forall { r =>
      val sim = r.getAs[Double]("edit_sim")
      sim >= 0.0 && sim <= 1.0 && (r.getAs[Long]("lev") == 0L) == (sim == 1.0)
    })
    // IF the candidate pass surfaced the one-word revision 0↔2, its lev
    // must be the exact replace cost ("lazy"→"sleepy": 4 edits)
    rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 2L).foreach { p =>
      assert(p.getAs[Long]("lev") == 4L, s"$p")
    }
  }

  test("d51 on real docs: canonical pair order, prefix cap bounds lev") {
    import spark.implicits._
    val out = DedupLsh.d51EditDedup(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
      assert(out.filter(col("lev") < 0 || col("lev") > 200).count() == 0)
      assert(out.filter(col("edit_sim") < 0 || col("edit_sim") > 1).count() == 0)
    } finally out.unpersist(blocking = false)
  }

  test("d53 near-dup leakage: planted cross-split pairs aggregate to the right report") {
    import spark.implicits._
    // pairs: test 9 ↔ train {1 (j .8), 2 (j .9)}; test 19 ↔ test 29 (both
    // h=9: NOT leakage); train 3 ↔ train 4: not leakage either
    val pairs = Seq((1L, 9L, 0.8), (2L, 9L, 0.9), (19L, 29L, 1.0), (3L, 4L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
    val sp = Seq(1L -> 0L, 2L -> 7L, 3L -> 3L, 4L -> 5L,
      9L -> 9L, 19L -> 9L, 29L -> 9L).toDF("doc_id", "h")
    val rows = DedupLsh.neardupLeakage(pairs, sp).collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r0 = rows(0)
    assert(r0.getAs[Long]("test_doc") == 9L)
    assert(r0.getAs[Long]("n_train_matches") == 2L)
    assert(r0.getAs[Double]("best_jaccard") == 0.9)
    assert(r0.getAs[Long]("best_train_doc") == 2L)
  }

  test("d53 on real docs: every reported doc is split-9 with train matches") {
    import spark.implicits._
    val out = DedupLsh.d53NeardupLeakage(spark, sfSmall).collect()
    def split(id: Long): Long =
      graft.streaming.StreamOps.h60Scala(id.toString) % 10
    out.foreach { r =>
      assert(split(r.getAs[Long]("test_doc")) == 9L)
      assert(split(r.getAs[Long]("best_train_doc")) <= 7L)
      assert(r.getAs[Double]("best_jaccard") >= 0.5)
    }
  }

  test("m01 degenerate bucket is capped: N identical docs yield O(N·cap) not O(N²)") {
    import spark.implicits._
    // 150 identical docs all land in ONE bucket per band; without the
    // BandBucketCap the self-join would emit C(150,2) = 11175 candidate
    // pairs — with it, only the cap lowest doc_ids pair: C(128,2) = 8128
    val n = 150
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val clones = (0L until n.toLong).map(i => (i, text)).toDF("doc_id", "text")
    val pairs = DedupLsh.minHashPairsAll(DedupLsh.shingleDocs(clones)).cache()
    try {
      val cap = DedupLsh.BandBucketCap
      assert(pairs.count() == cap.toLong * (cap - 1) / 2,
        s"expected C($cap,2) capped pairs")
      assert(pairs.count() < n.toLong * (n - 1) / 2, "cap must beat the quadratic bound")
      // every surviving pair is a true exact dup
      assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
      // the cap keeps the LOWEST doc_ids, so the canonical representative
      // (doc 0) still pairs with every other kept doc
      assert(pairs.filter(col("doc_a") === 0L).count() == cap - 1)
    } finally pairs.unpersist()
  }

  test("m01 on real docs: pairs verify at jaccard >= 0.5, canonical order") {
    val df = DedupLsh.m01MinHashPairs(spark, sfTiny).cache()
    assert(df.filter(col("jaccard") < 0.5).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
    df.unpersist()
  }

  test("m02 simhash is deterministic and total on real docs") {
    val a = DedupLsh.m02SimHash(spark, sfTiny).collect()
    val b = DedupLsh.m02SimHash(spark, sfTiny).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sfTiny).count())
  }

  test("m03 pairs honor the hamming bound on real docs") {
    val df = DedupLsh.m03SimHashPairs(spark, sfTiny)
    assert(df.filter(col("hamming") > 6).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("m05 s-curve: exact dups collide at rate 1 in bin 9, disjoint pairs at 0 in bin 0, theory monotone") {
    import spark.implicits._
    val rows = DedupLsh.lshScurve(crafted).collect()
      .map(r => r.getAs[Int]("jacc_bin") -> r).toMap
    // the (0,1) exact-dup pair: jaccard 1 → bin 9, all-band collision
    assert(rows(9).getAs[Long]("n_pairs") == 1L, rows.values.mkString(";"))
    assert(rows(9).getAs[Double]("emp_p") == 1.0)
    // doc 3 is disjoint from everything: its 4 pairs land in bin 0 with
    // no collision; the reshuffled doc 4 also shares no shingles with 0/1/2
    assert(rows(0).getAs[Double]("emp_p") == 0.0, s"${rows(0)}")
    // theory column follows the shared chain 1 − (1 − m^8)^4 and rises
    val th = rows.toSeq.sortBy(_._1).map(_._2.getAs[Double]("theory_p"))
    assert(th.zip(th.tail).forall { case (a, b) => a < b }, th.mkString(","))
    assert(rows(9).getAs[Double]("theory_p") > 0.9)
    // pair accounting: C(5,2) = 10 pairs total
    assert(rows.values.map(_.getAs[Long]("n_pairs")).sum == 10L)
  }

  test("m04 estimate: 1/32 grid, exact dups estimated exactly, error bounded") {
    val out = DedupLsh.m04JaccardEstimate(spark, sfTiny).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() == 0)
      // estimates are counts/32 — on the exact 1/32 grid
      assert(out.filter(
        col("est_jaccard") * 32 =!= round(col("est_jaccard") * 32)).count() == 0)
      // identical shingle sets have identical signatures: J = 1 ⇒ est = 1
      assert(out.filter(col("jaccard") === 1.0 && col("est_jaccard") =!= 1.0).count() == 0)
      // 32 hashes: per-pair std ≤ 0.09, so the mean |error| stays small
      val meanErr = out.agg(avg(col("abs_err"))).collect()(0).getDouble(0)
      assert(meanErr < 0.15, s"mean |err| $meanErr")
    } finally out.unpersist()
  }
}
