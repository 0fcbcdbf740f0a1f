package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupLsh, TextOps}

class DedupLshSpec extends GraftSpec {

  test("m01 finds every identical-token-set pair (LSH exact-dup guarantee)") {
    // jaccard == 1.0 ⇒ identical minhash signature ⇒ all bands collide
    val exactDups = TextOps.d05JaccardPairs(spark, sfTiny)
      .filter(col("jaccard") === 1.0)
      .select("doc_a", "doc_b")
    val found = DedupLsh.m01MinHashPairs(spark, sfTiny)
      .select("doc_a", "doc_b")
    assert(exactDups.except(found).count() == 0)
  }

  test("m01 pairs all verify at jaccard >= 0.5") {
    val df = DedupLsh.m01MinHashPairs(spark, sfTiny)
    assert(df.count() > 0)
    assert(df.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("m02 simhash is deterministic and total") {
    val a = DedupLsh.m02SimHash(spark, sfTiny).collect()
    val b = DedupLsh.m02SimHash(spark, sfTiny).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sfTiny).count())
  }

  test("m03 pairs honor the hamming bound") {
    val df = DedupLsh.m03SimHashPairs(spark, sfTiny)
    assert(df.filter(col("hamming") > 6).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }
}
