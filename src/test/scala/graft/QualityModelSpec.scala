package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel
import graft.sources.Tables

/** Model-based quality scoring: the classifier must recover the weak
  * labels it was bootstrapped from and generalize their boundary, and
  * the whole train/score loop must be deterministic.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("LR recovers the weak-label boundary and separates scores") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = QualityModel.features(docs, "doc_id", "text")
    val model = QualityModel.train(feats)
    val scored = QualityModel.score(model, feats)
      .select(col("doc_id"), col("is_quality"), col("quality_prob"),
        col("pred_quality"))
    val rows = scored.collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r =>
      r.getAs[Boolean]("pred_quality") == r.getAs[Boolean]("is_quality"))
      .toDouble / rows.length
    assert(acc >= 0.85, s"model failed to recover its own weak labels: $acc")
    // calibrated separation: mean P(quality) of positives well above
    // negatives
    val (pos, neg) = rows.partition(_.getAs[Boolean]("is_quality"))
    if (pos.nonEmpty && neg.nonEmpty) {
      val mp = pos.map(_.getAs[Double]("quality_prob")).sum / pos.length
      val mn = neg.map(_.getAs[Double]("quality_prob")).sum / neg.length
      assert(mp > mn + 0.2, s"no separation: pos=$mp neg=$mn")
    }
  }

  test("train/score is deterministic across runs") {
    val docs = Tables.load(spark, sfDir, "documents").limit(150)
    val feats = QualityModel.features(docs, "doc_id", "text")
    def run() = QualityModel.score(QualityModel.train(feats), feats)
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(run() == run())
  }

  test("empty and junk docs score low, never crash the assembler") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then walks on today"),
      (2L, ""),
      (3L, "zz zz zz zz zz zz zz zz zz zz"))
      .toDF("doc_id", "text")
    // train on the corpus (has both classes), score the junk frame
    val corpus = Tables.load(spark, sfDir, "documents")
    val model = QualityModel.train(
      QualityModel.features(corpus, "doc_id", "text"))
    val scored = QualityModel.score(model,
        QualityModel.features(docs, "doc_id", "text"))
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(scored.keySet == Set(1L, 2L, 3L), "every doc must be scored")
    assert(scored(2L) < scored(1L), "empty doc must not outscore real text")
  }
}
