package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Num._

/** Sketch-based near-duplicate detection over `documents` — the 100 TB
  * scale path for the exact quadratic Jaccard in [[TextOps.d05JaccardPairs]]
  * (BASELINE.json north-star: MinHash+LSH, SimHash).
  *
  * Neither operator is DuckDB-expressible (both build on xxhash64), so both
  * ship without oracle SQL: Verify records a rows-only check and
  * DedupLshSpec carries correctness (determinism, exact-dup guarantee,
  * recall of high-Jaccard pairs vs the exact baseline).
  *
  * Scale shape: signatures are scan-local per-document expression work
  * (higher-order functions, whole-stage codegen, no UDFs). Candidate
  * generation explodes each doc into BANDS rows and shuffles once on the
  * (band, band-hash) key — uniformly distributed, no skew. Verification
  * joins candidates back to token sets and computes exact Jaccard only for
  * the candidate set, which is O(near-dups), not O(n²).
  */
object DedupLsh {

  private val NumHashes = 32
  private val Bands = 8 // × 4 rows/band
  private val RowsPerBand = NumHashes / Bands
  private val P = 2147483647L // 2^31 − 1 (prime)

  private def toks(c: Column): Column =
    array_distinct(filter(split(trim(c), "\\s+"), t => t =!= ""))

  /** j-th MinHash of a token set: min over tokens of an affine-permuted
    * xxhash64. a_j odd, b_j from a second stream; pmod keeps values in
    * [0, P). */
  private def minhash(ts: Column, j: Int): Column = {
    val a = 2L * j + 1L
    val b = j * 7919L + 13L
    array_min(transform(ts, t => pmod(lit(a) * pmod(xxhash64(t), lit(P)) + lit(b), lit(P))))
  }

  /** signature array + per-band bucket hashes for one document. */
  private def withSignature(docs: DataFrame): DataFrame = {
    val sig = array((0 until NumHashes).map(j => minhash(col("ts"), j)): _*)
    val banded = docs.withColumn("sig", sig)
    val bandCols = (0 until Bands).map { bnd =>
      val parts = (0 until RowsPerBand).map(r => col("sig")(bnd * RowsPerBand + r).cast("string"))
      struct(lit(bnd).as("band"), xxhash64(concat_ws(":", parts: _*)).as("bh"))
    }
    banded.withColumn("bands", array(bandCols: _*))
  }

  /** m01 — MinHash LSH near-dup pairs: candidates share ≥1 band, verified
    * with exact token-set Jaccard ≥ 0.5. Output is deterministic: the
    * probabilistic part only affects candidate recall, every emitted pair
    * is exact-verified. */
  def m01MinHashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", toks($"text").as("ts"))
    val buckets = withSignature(docs)
      .select($"doc_id", explode($"bands").as("b"))
      .select($"doc_id", $"b.band", $"b.bh")
    val cands = buckets.as("x")
      .join(buckets.as("y"), $"x.band" === $"y.band" && $"x.bh" === $"y.bh" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val a = docs.select($"doc_id".as("doc_a"), $"ts".as("ta"))
    val b = docs.select($"doc_id".as("doc_b"), $"ts".as("tb"))
    val inter = size(array_intersect($"ta", $"tb"))
    val uni = size($"ta") + size($"tb") - inter
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("jaccard", r(inter.cast("double") / uni, 6))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"jaccard".desc, $"doc_a", $"doc_b")
      .limit(500)
  }

  /** m02 — 64-bit SimHash signatures: per bit, sign of the ±1 vote sum
    * over token hashes. Identical texts ⇒ identical signatures; near
    * texts ⇒ small Hamming distance (DedupLshSpec). */
  def m02SimHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sim =
      """aggregate(
           transform(sequence(63, 0, -1), j ->
             CASE WHEN aggregate(hs, 0L,
               (acc, h) -> acc + IF(((h >> j) & 1L) = 1L, 1L, -1L)) >= 0L
             THEN 1L ELSE 0L END),
           0L, (acc, b) -> shiftleft(acc, 1) + b)"""
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", toks($"text").as("ts"))
      .withColumn("hs", transform($"ts", t => xxhash64(t)))
      .select($"doc_id", $"lang", size($"ts").as("n_tokens"), expr(sim).as("simhash"))
      .orderBy($"doc_id")
  }

  /** m03 — SimHash near-dup pairs via 16-bit segment blocking (pigeonhole:
    * Hamming ≤ 3 ⇒ at least one of 4 segments identical), then exact
    * Hamming filter. The blocked join shuffles on (segment-index, segment
    * value) — never quadratic in the corpus. */
  def m03SimHashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = m02SimHash(s, dir).select($"doc_id", $"simhash")
    val segs = sigs.select($"doc_id", $"simhash",
      posexplode(array((0 until 4).map(k =>
        shiftright($"simhash", k * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("seg_idx", "seg")))
    val cands = segs.as("x")
      .join(segs.as("y"), $"x.seg_idx" === $"y.seg_idx" && $"x.seg" === $"y.seg" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"x.simhash".as("sig_a"),
        $"y.doc_id".as("doc_b"), $"y.simhash".as("sig_b"))
      .distinct()
    cands
      .withColumn("hamming", bit_count($"sig_a".bitwiseXOR($"sig_b")))
      .filter($"hamming" <= 6)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"hamming", $"doc_a", $"doc_b")
      .limit(500)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_minhash_pairs" -> (m01MinHashPairs _),
    "m02_simhash" -> (m02SimHash _),
    "m03_simhash_pairs" -> (m03SimHashPairs _))

  /** xxhash64-based — not DuckDB-expressible; rows-only + DedupLshSpec. */
  val oracles: Map[String, String] = Map.empty
}
