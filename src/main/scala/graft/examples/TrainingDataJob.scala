package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupCluster, Packing, QualityModel, Sampling, TextAnalysis}

/** The canonical pre-training corpus pipeline, composed from the
  * engine's ext-tier operators — the end-to-end shape a 100 TB
  * training-data run takes, with each stage's scale story already
  * proven at the operator level:
  *
  *  0. PII redaction — emails/IPs/phones become typed placeholders
  *     before any other stage reads the text ([[TextAnalysis
  *     .redactPii]]); narrow, fuses with the stage-1 scan
  *  1. quality + repetition gate — per-row codegen'd features,
  *     narrow, no shuffle ([[TextAnalysis.qualityFeatures]] +
  *     [[TextAnalysis.repetitionSignals]] — the Gopher-style
  *     boilerplate/loop filter length gates miss)
  *  2. near-dup pruning — MinHash+LSH pairs → connected components →
  *     keep each cluster's canonical doc ([[DedupCluster]]); the only
  *     super-linear stage, bounded by LSH candidate generation
  *  3. benchmark decontamination — drop docs leaking eval-set
  *     k-grams; the eval shingle set broadcasts ([[Dedup
  *     .contamination]])
  *  4. deterministic stratified sampling — md5-bucketed per-language
  *     fractions, reproducible and growth-stable ([[Sampling]])
  *  5. feature annotation — tokens, language, normalized form,
  *     fingerprints for downstream joins ([[TextAnalysis]])
  *  6. sequence packing — context-window assignment via distributed
  *     prefix sum ([[Packing.packSequences]])
  *  7. global shuffle + sharding — seeded, reproducible export order
  *     for parallel loaders ([[Sampling.shuffleShards]])
  *
  * Stage ORDER is the scale decision: the cheap narrow gate runs
  * before the quadratic-ish dedup so junk never reaches the pair
  * space, decontamination after dedup (fewer docs to probe),
  * sampling after both so duplicate clusters and contaminated docs
  * can't vote their way past the sample, packing after the final row
  * set is known — pack ids depend on exactly the rows that ship —
  * and the shuffle last of all, so shard files are the deliverable.
  */
object TrainingDataJob {

  final case class Config(
      jaccardThreshold: Double = 0.7,
      langFractions: Map[String, Double] = Map("en" -> 1.0),
      defaultFraction: Double = 0.5,
      contaminationThreshold: Double = 0.5,
      packBudget: Int = 2048,
      // drop docs whose duplicated-2-gram char mass exceeds this
      // fraction of total chars (integer-arithmetic compare, so the
      // gate is engine-exact like the rest of the pipeline)
      maxRepetitionRatio: Double = 0.5,
      redactPii: Boolean = true,
      // model-based gate: when set, stage 1 filters on the classifier's
      // calibrated probability instead of the raw rule gate (the rules
      // still run — they feed the model its features)
      qualityModel: Option[org.apache.spark.ml.classification.LogisticRegressionModel] = None,
      minQualityProb: Double = 0.5,
      numShards: Int = 8,
      shuffleSeed: String = "epoch0")

  /** documents(doc_id, text, lang, …) → curated corpus with features
    * and pack assignments. Deterministic end-to-end: same input ⇒
    * same output rows.
    *
    * @param evalSet held-out benchmark docs (doc_id, text) to
    *                decontaminate against; None skips the stage
    */
  def run(rawDocuments: DataFrame, config: Config = Config(),
      evalSet: Option[DataFrame] = None): DataFrame = {
    // 0. PII redaction — BEFORE any stage reads the text, so nothing
    // downstream (fingerprints, shingles, features, shard files) ever
    // sees a raw email/IP/phone. Narrow regexp chain, fuses with the
    // stage-1 scan.
    val documents =
      if (config.redactPii)
        rawDocuments.withColumn("text",
          TextAnalysis.redactPii(col("text")))
      else rawDocuments

    // 1. quality + repetition gate (both per-row, narrow). Repetition
    // rule: the fraction of 2-gram instances that are duplicated must
    // not exceed maxRepetitionRatio — integer cross-multiplication
    // (dup2_n·10⁶ ≤ ratio·10⁶·(2-gram count)), engine-exact
    val repThreshold = (config.maxRepetitionRatio * 1000000L).round
    val quality = config.qualityModel match {
      case Some(model) =>
        // classifier gate: calibrated probability over the same
        // feature blocks (scoring is a narrow broadcast-weights pass)
        documents.join(
          QualityModel.score(model,
              QualityModel.features(documents, "doc_id", "text"))
            .filter(col("quality_prob") >= config.minQualityProb)
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
      case None =>
        TextAnalysis.withRepetitionSignals(
            TextAnalysis.qualityFeatures(documents), "text")
          .filter(col("is_quality") &&
            col("dup2_n") * lit(1000000L) <=
              lit(repThreshold) * greatest(col("word_count") - 1L, lit(1L)))
          .select(documents.columns.map(col): _*)
    }

    // 2. near-dup pruning: keep each cluster's canonical member
    val clustered = DedupCluster.minHashClusters(
      quality, "doc_id", "text", k = 3, threshold = config.jaccardThreshold)
    val kept = quality.join(
      clustered.filter(col("is_canonical")).select("doc_id"),
      Seq("doc_id"), "left_semi")

    // 3. benchmark decontamination (broadcast eval shingles)
    val clean = evalSet match {
      case None => kept
      case Some(eval) =>
        val leaked = Dedup.contamination(kept, eval, "doc_id", "text",
            k = 3, threshold = config.contaminationThreshold)
          .filter(col("is_contaminated")).select("doc_id")
        kept.join(broadcast(leaked), Seq("doc_id"), "left_anti")
    }

    // 4. deterministic stratified sample (per-language balance)
    val sampled = Sampling.stratified(clean, "doc_id", "lang",
      config.langFractions, config.defaultFraction)

    // 5. feature annotation for downstream consumers
    val features = TextAnalysis.fingerprints(sampled)
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))

    // 6. context-window assignment over exactly the shipped rows
    val packed = features.join(
      Packing.packSequences(sampled, "doc_id", "text", config.packBudget)
        .select("doc_id", "pack_id", "pack_offset"),
      Seq("doc_id"))

    // 7. reproducible global shuffle: shard + order keys for loaders
    // (narrow — the exchange is paid only if/when shard files are
    // written via Sampling.writeShuffledShards)
    Sampling.shuffleShards(packed, "doc_id", config.shuffleSeed,
      config.numShards)
  }
}
