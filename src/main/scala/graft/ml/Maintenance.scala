package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Telemetry

/** The reference's ML path (SURVEY.md §2.3 M1–M4) as an MLlib pipeline:
  *
  *   - M1 feature assembly (`realtime_inference.py:68-78`) →
  *     VectorAssembler over {temperature, vibration};
  *   - M2 RandomForest training (`README.md:102-108`, sklearn
  *     RandomForestClassifier on 10k rows, target `is_anomaly`) →
  *     RandomForestClassifier, fixed seed;
  *   - M3 train/test split + precision/recall evaluation
  *     (`README.md:106-108`: 1.00/1.00 on the separable dataset);
  *   - M4 per-record scoring (`realtime_inference.py:117-123`) →
  *     `model.transform` — total function, so the reference's
  *     predict-failure drop hazard disappears by construction.
  *
  * Training data is the deterministic generator twin ([[Telemetry.twin]]).
  * The data is linearly separable (threshold rule temp≥80 ∧ vib≥3, M5), so
  * the trained forest must agree with the rule on every record — that
  * equivalence is the golden test (MaintenanceSpec), replacing a DuckDB
  * oracle (MLlib is not SQL-expressible; Verify records rows-only).
  *
  * Scale: `transform` broadcasts the (tiny) model to executors; scoring is
  * scan-local and embarrassingly parallel. Training at 100 TB would sample
  * or use gradient-boosted alternatives; the pipeline shape is unchanged.
  */
object Maintenance {

  val FeatureCols: Array[String] = Array("temperature", "vibration")

  def buildPipeline(numTrees: Int = 20, seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setLabelCol("is_anomaly").setFeaturesCol("features")
      .setNumTrees(numTrees).setSeed(seed)
    new Pipeline().setStages(Array(assembler, rf))
  }

  def train(s: SparkSession): PipelineModel =
    buildPipeline().fit(Telemetry.twin(s))

  /** Held-out evaluation reproducing README.md:106-108. */
  def evaluate(s: SparkSession): (Double, Double) = {
    val Array(tr, te) = Telemetry.twin(s).randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = buildPipeline().fit(tr)
    val scored = model.transform(te)
    def metricOf(m: String): Double = new MulticlassClassificationEvaluator()
      .setLabelCol("is_anomaly").setPredictionCol("prediction")
      .setMetricName(m).setMetricLabel(1.0).evaluate(scored)
    (metricOf("precisionByLabel"), metricOf("recallByLabel"))
  }

  /** ml01 — train-and-score the full twin; emit per-record prediction next
    * to the threshold-rule twin for drift inspection. Deterministic (fixed
    * seed); no oracle → rows-only + MaintenanceSpec. */
  def ml01RfScoring(s: SparkSession, dir: String): DataFrame = {
    val scored = train(s).transform(Telemetry.twin(s))
    scored.select(
      col("id"), col("is_anomaly"),
      col("prediction").cast("int").as("rf_prediction"),
      ((col("temperature") >= 80.0) && (col("vibration") >= 3.0)).cast("int")
        .as("rule_prediction"))
      .orderBy(col("id"))
  }

  /** ml02 — the same M1–M4 pipeline shape with a calibrated linear model:
    * logistic regression over {temperature, vibration}, emitting the
    * anomaly probability next to the hard prediction. On the separable
    * twin the decision boundary must agree with the threshold rule
    * (MaintenanceSpec pins ≥ 99.9% agreement + probability bounds).
    * Scoring is a broadcast model + scan-local transform — same 100 TB
    * story as ml01; no oracle (MLlib) → rows-only + spec. */
  def ml02LrScoring(s: SparkSession, dir: String): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("is_anomaly").setFeaturesCol("features")
      .setMaxIter(100)
    val model = new Pipeline().setStages(Array(assembler, lr))
      .fit(Telemetry.twin(s))
    model.transform(Telemetry.twin(s))
      .select(col("id"), col("is_anomaly"),
        col("prediction").cast("int").as("lr_prediction"),
        vector_to_array(col("probability")).getItem(1).as("p_anomaly"))
      .orderBy(col("id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml01_rf_scoring" -> (ml01RfScoring _),
    "ml02_lr_scoring" -> (ml02LrScoring _))

  val oracles: Map[String, String] = Map.empty
}
