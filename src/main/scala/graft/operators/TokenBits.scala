package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bitset encoding of token sets over a capped global vocabulary.
  *
  * Pairwise Jaccard via `array_intersect` costs a hash-set build per pair —
  * ruinous when a blocked self-join emits millions of pairs. When a
  * document's tokens all fall inside a small global vocabulary (here: the
  * first [[TokenBits.VocabCap]] distinct tokens alphabetically; this corpus
  * has 31 distinct tokens corpus-wide, so every doc qualifies), its token
  * set compresses to ONE long bitmask and |A∩B| becomes
  * `bit_count(ma & mb)` per pair — O(1), no allocation, fully codegen.
  *
  * The r3 design gated this behind a driver-side `COUNT(DISTINCT token)`
  * probe — a full corpus pass before the query proper (flagged by the r3
  * review). This version needs NO probe: the vocabulary is a distributed
  * top-k inside the plan, and each doc carries an `ovf` flag (some token
  * out of vocabulary). Correctness never depends on the cap:
  *
  *   - a token shared by two docs is in-vocabulary unless BOTH docs
  *     overflow (an in-vocab-only doc by definition holds no out-of-vocab
  *     token), so `bit_count` is EXACT for every pair with ≤1 overflowing
  *     side;
  *   - ovf×ovf pairs — the only ones the mask can't decide — take the
  *     exact `array_intersect` path.
  *
  * At 100 TB the vocabulary is not small, every doc overflows, and the
  * caller's exact fallback carries all pairs — same cost as the plain
  * general path; the scale route for near-dup remains MinHash LSH
  * ([[DedupLsh]]). Bit positions are assigned by alphabetical rank —
  * deterministic, so results are reproducible and oracle-comparable.
  */
object TokenBits {

  /** Vocabulary budget = one 64-bit mask word. */
  val VocabCap = 64

  /** docs(doc_id, ..., ts: array<string>) → + (nt, mask: long, ovf: bool).
    * `ts` must be distinct (the caller array_distincts). Docs with empty
    * `ts` get a zero mask and ovf = false (left join + coalesce). The
    * vocabulary is `orderBy(tok).limit(VocabCap)` — a distributed top-k,
    * not a single-partition sort — and is broadcast to the token scan. */
  def withCappedMask(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
    val vocab = tk.select("tok").distinct().orderBy("tok").limit(VocabCap)
      .withColumn("idx", row_number().over(Window.orderBy("tok")) - 1)
    val agg = tk.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(
        bit_or(coalesce(expr("shiftleft(1L, CAST(idx AS INT))"), lit(0L))).as("mask"),
        max(col("idx").isNull).as("ovf"))
    docs.join(agg, Seq("doc_id"), "left")
      .withColumn("nt", size(col("ts")))
      .withColumn("mask", coalesce(col("mask"), lit(0L)))
      .withColumn("ovf", coalesce(col("ovf"), lit(false)))
  }

  /** |A∩B| of two single-word masks named `ma`/`mb` in scope: one AND and
    * one popcount per pair — pure primitive codegen, no allocation. */
  def interExpr: Column =
    bit_count(col("ma").bitwiseAND(col("mb")))
}
