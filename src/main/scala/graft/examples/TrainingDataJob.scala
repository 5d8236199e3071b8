package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupCluster, Sampling, TextAnalysis}

/** The canonical pre-training corpus pipeline, composed from the
  * engine's ext-tier operators — the end-to-end shape a 100 TB
  * training-data run takes, with each stage's scale story already
  * proven at the operator level:
  *
  *  1. quality gate — per-row codegen'd features, narrow, no shuffle
  *     ([[TextAnalysis.qualityFeatures]])
  *  2. near-dup pruning — MinHash+LSH pairs → connected components →
  *     keep each cluster's canonical doc ([[DedupCluster]]); the only
  *     super-linear stage, bounded by LSH candidate generation
  *  3. deterministic stratified sampling — md5-bucketed per-language
  *     fractions, reproducible and growth-stable ([[Sampling]])
  *  4. feature annotation — tokens, language, normalized form,
  *     fingerprints for downstream joins ([[TextAnalysis]])
  *
  * Stage ORDER is the scale decision: the cheap narrow gate runs
  * before the quadratic-ish dedup so junk never reaches the pair
  * space, and sampling runs after dedup so duplicate clusters can't
  * vote their way past the sample.
  */
object TrainingDataJob {

  final case class Config(
      jaccardThreshold: Double = 0.7,
      langFractions: Map[String, Double] = Map("en" -> 1.0),
      defaultFraction: Double = 0.5)

  /** documents(doc_id, text, lang, …) → curated corpus with features.
    * Deterministic end-to-end: same input ⇒ same output rows.
    */
  def run(documents: DataFrame, config: Config = Config()): DataFrame = {
    // 1. quality gate (narrow)
    val quality = TextAnalysis.qualityFeatures(documents)
      .filter(col("is_quality"))
      .select(documents.columns.map(col): _*)

    // 2. near-dup pruning: keep each cluster's canonical member
    val clustered = DedupCluster.minHashClusters(
      quality, "doc_id", "text", k = 3, threshold = config.jaccardThreshold)
    val kept = quality.join(
      clustered.filter(col("is_canonical")).select("doc_id"),
      Seq("doc_id"), "left_semi")

    // 3. deterministic stratified sample (per-language balance)
    val sampled = Sampling.stratified(kept, "doc_id", "lang",
      config.langFractions, config.defaultFraction)

    // 4. feature annotation for downstream consumers
    TextAnalysis.fingerprints(sampled)
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
  }
}
