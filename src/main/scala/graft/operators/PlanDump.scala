package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Scratch interior-plan dumper for the optimization round (r14): rebuilds
  * the hot interior frames of checkpoint-tailed queries (whose final plans
  * print as Scan ExistingRDD) so .explain can see the real operators. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val what = args.drop(1).toSet
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    if (what.isEmpty || what("ml07")) {
      val sp = graft.Tables.documents(s, dir)
        .withColumn("h", DedupLsh.h60($"doc_id".cast("string")) % 10)
      val test = sp.filter($"h" === 9)
        .orderBy(DedupLsh.h60($"doc_id".cast("string")), $"doc_id")
        .limit(Corpus.KnnBudget)
      val nPart = s.sessionState.conf.numShufflePartitions
      // rep = false replicates the pre-r14 interior, rep = true the r14 one
      // (the only difference is the pinned doc_id fan-out in sparseTf).
      def cosOf(rep: Boolean) = {
        def sparseTf(d0: org.apache.spark.sql.DataFrame) = {
          val d = if (rep) d0.repartition(nPart, $"doc_id") else d0
          val c = d.select($"doc_id", $"lang", explode(TextOps.toks(lower($"text"))).as("w"))
            .groupBy($"doc_id", $"lang", $"w")
            .agg(count(lit(1)).cast("double").as("tf"))
          c.join(c.groupBy($"doc_id").agg(sqrt(sum($"tf" * $"tf")).as("nrm")), "doc_id")
        }
        val tr = sparseTf(sp.filter($"h" <= 7))
          .select($"doc_id".as("tid"), $"lang".as("nl"), $"w", $"tf".as("ttf"), $"nrm".as("tnrm"))
        val te = sparseTf(test)
          .select($"doc_id".as("qid"), $"lang".as("tl"), $"w", $"tf".as("qtf"), $"nrm".as("qnrm"))
        broadcast(te).join(tr, "w")
          .groupBy($"qid", $"tl", $"qnrm", $"tid", $"nl", $"tnrm")
          .agg(sum($"qtf" * $"ttf").as("dot"))
      }
      println("========== ml07 interior BEFORE (pair join + agg, no fan-out) ==========")
      println(cosOf(rep = false).queryExecution.explainString(FormattedMode))
      println("========== ml07 interior AFTER (pinned doc_id fan-out) ==========")
      println(cosOf(rep = true).queryExecution.explainString(FormattedMode))
    }

    if (what.isEmpty || what("e18")) {
      val nPart = s.sessionState.conf.numShufflePartitions
      def halfOf(rep: Boolean) = {
        val xe = graft.Tables.embeddings(s, dir)
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
          .select($"vec_id", posexplode($"v"))
          .select($"vec_id", ($"pos" + 1).cast("int").as("i"), $"col".as("x"))
        val mu = xe.groupBy($"i").agg(Num.davg($"x").as("mu"))
        val cx0 = xe.join(broadcast(mu), "i")
          .select($"vec_id", $"i", ($"x" - $"mu").as("cx"))
        val cx = if (rep) cx0.repartition(nPart, $"vec_id") else cx0
        cx.as("a").join(cx.as("b"), "vec_id")
          .select(col("a.i").as("i"), col("b.i").as("j"),
            (col("a.cx") * col("b.cx")).as("p"))
          .filter($"i" <= $"j")
          .groupBy($"i", $"j").agg(Num.dsum($"p").as("sp"))
      }
      println("========== e18/e31 covariance interior BEFORE (no fan-out) ==========")
      println(halfOf(rep = false).queryExecution.explainString(FormattedMode))
      println("========== e18/e31 covariance interior AFTER (pinned vec_id fan-out) ==========")
      println(halfOf(rep = true).queryExecution.explainString(FormattedMode))
    }
    s.stop()
  }
}
