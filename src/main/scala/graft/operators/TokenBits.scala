package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bitset encoding of token sets over a (small) global vocabulary.
  *
  * Pairwise Jaccard via `array_intersect` costs a hash-set build per pair —
  * ruinous when a blocked self-join emits millions of pairs. When the
  * block's vocabulary is small (here: 31 distinct tokens corpus-wide), a
  * token set compresses to an `array<long>` bitmask (64 tokens/word), and
  * |A∩B| becomes `bit_count(x & y)` per word — O(1) per pair, no
  * allocation, fully codegen. This is the classic bitmap-index trick.
  *
  * At 100 TB the corpus vocabulary is NOT small, so callers must treat
  * this as a *fast path*: take it when a cheap `COUNT(DISTINCT token)`
  * probe fits the budget (≤ [[TokenBits.MaxVocab]]), otherwise fall back
  * to the general path (array_intersect locally, MinHash LSH globally).
  * Bit positions are assigned by alphabetical rank — deterministic, so
  * results are reproducible and oracle-comparable.
  */
object TokenBits {

  /** Largest vocabulary the bitmask path accepts (32 mask words). */
  val MaxVocab = 2048L

  def nWords(vocabSize: Long): Int = (((vocabSize + 63) / 64).toInt).max(1)

  /** docs(doc_id, ..., ts: array<string>) → + (nt, mask: array<long>).
    * Docs with empty ts get an all-zero mask (left join + coalesce). */
  def withMasks(docs: DataFrame, nwords: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
    val vocab = toks.select("tok").distinct()
      .withColumn("idx", row_number().over(Window.orderBy("tok")) - 1)
    val wordCols = (0 until nwords).map { w =>
      bit_or(expr(s"IF(CAST(idx / 64 AS INT) = $w, shiftleft(1L, CAST(idx % 64 AS INT)), 0L)"))
        .as(s"w$w")
    }
    val words = toks.join(broadcast(vocab), "tok")
      .groupBy("doc_id")
      .agg(wordCols.head, wordCols.tail: _*)
    docs.join(words, Seq("doc_id"), "left")
      .withColumn("nt", size(col("ts")))
      .withColumn("mask",
        array((0 until nwords).map(w => coalesce(col(s"w$w"), lit(0L))): _*))
      .drop((0 until nwords).map(w => s"w$w"): _*)
  }

  /** |A∩B| of two masks named `ma`/`mb` in scope. Unrolled over the known
    * word count: `zip_with`+`aggregate` would allocate a fresh array and
    * evaluate two lambdas PER PAIR — at millions of blocked pairs that
    * allocation dominates. The static sum of `bit_count(ma[i] & mb[i])`
    * is pure primitive codegen (no allocation). */
  def interExpr(nwords: Int): Column =
    (0 until nwords)
      .map(i => bit_count(element_at(col("ma"), i + 1).bitwiseAND(element_at(col("mb"), i + 1))))
      .reduce(_ + _)
}
