package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the step beyond rule gates: train a
  * classifier over the engine's own text features and score every doc
  * with a calibrated probability, the way production curation
  * pipelines replace hand-tuned thresholds (fasttext-style quality
  * classifiers) once rules stop discriminating.
  *
  * Labels here come from WEAK SUPERVISION by default: the rule gate
  * ([[TextAnalysis.qualityFeatures]] `is_quality`) bootstraps the
  * first model, which generalizes the rules into a soft score; a real
  * deployment swaps in human/LLM labels through the same `labelCol`
  * without touching the plumbing.
  *
  * Scale shape: feature extraction is the narrow/one-join pipeline
  * the text tier already proves; L-BFGS training is per-iteration
  * gradient treeAggregate (executors reduce d-dimensional vectors,
  * d = 7 here — model-sized traffic only); scoring broadcasts the
  * weight vector inside the transform — a pure narrow pass.
  */
object QualityModel {

  val FeatureCols: Seq[String] = Seq(
    "word_count", "avg_word_len", "punct_ratio", "stopword_ratio",
    "distinct_token_ratio", "char_entropy", "dup2_ratio")

  /** Per-doc feature frame: the quality/repetition/diversity blocks
    * joined by id, nulls (empty docs) zero-filled so the assembler
    * never drops rows — an empty doc is a legitimately scoreable
    * (terrible) document, not a missing one.
    */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ruleFeats = TextAnalysis.withRepetitionSignals(
        TextAnalysis.qualityFeatures(df, textCol), textCol)
      .withColumn("dup2_ratio", col("dup2_mass").cast("double") /
        greatest(col("n_chars_m"), lit(1)).cast("double"))
      .select(col(idCol), col("word_count").cast("double").as("word_count"),
        col("avg_word_len"), col("punct_ratio"), col("stopword_ratio"),
        col("dup2_ratio"), col("is_quality"))
    val divFeats = TextAnalysis.diversityFeatures(df, idCol, textCol)
      .withColumnRenamed("doc_id", idCol)
    ruleFeats.join(divFeats, Seq(idCol))
      .na.fill(0.0, FeatureCols)
  }

  /** Train on any boolean/0-1 label column over [[features]] output.
    * Deterministic: L-BFGS from a zero start on a fixed feature frame
    * converges to the same optimum regardless of partitioning.
    */
  def train(featureFrame: DataFrame, labelCol: String = "is_quality",
      regParam: Double = 0.01): LogisticRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
      .transform(featureFrame)
      .withColumn("label", col(labelCol).cast("double"))
    new LogisticRegression()
      .setMaxIter(50).setRegParam(regParam).setStandardization(true)
      .fit(assembled)
  }

  /** Score docs: appends `quality_prob` (P(label=1)) and
    * `pred_quality`. Narrow — the weight vector rides in the
    * transform's closure.
    */
  def score(model: LogisticRegressionModel, featureFrame: DataFrame): DataFrame =
    model.transform(new VectorAssembler()
        .setInputCols(FeatureCols.toArray).setOutputCol("features")
        .transform(featureFrame))
      .withColumn("quality_prob",
        round(element_at(vector_to_array(col("probability")), 2), 4))
      .withColumn("pred_quality", col("prediction") === 1.0)
      .drop("features", "rawPrediction", "probability", "prediction")
}
