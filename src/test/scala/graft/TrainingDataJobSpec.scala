package graft

import org.apache.spark.sql.functions._

import graft.examples.TrainingDataJob
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** End-to-end training-data pipeline: quality gate → dedup prune →
  * stratified sample → features; deterministic and duplicate-free.
  */
class TrainingDataJobSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline output is curated, duplicate-free, deterministic") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val out = TrainingDataJob.run(docs,
      TrainingDataJob.Config(
        jaccardThreshold = 0.7,
        langFractions = Map("en" -> 1.0), defaultFraction = 0.5))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // subset of the input universe
    val inIds = docs.select("doc_id").as[Long].collect().toSet
    val outIds = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(outIds.subsetOf(inIds) && outIds.size == rows.length)
    // no near-dup pair survives (both members above threshold gone)
    val survivors = out.select(col("doc_id"), col("text"))
    val pairs = Dedup.minHashLsh(survivors, "doc_id", "text",
      k = 3, threshold = 0.7)
    assert(pairs.count() == 0, "near-dup pair survived pruning")
    // every survivor passed the quality gate
    val q = TextAnalysis.qualityFeatures(out.select("doc_id", "text"))
      .filter(!col("is_quality")).count()
    assert(q == 0)
    // deterministic rerun
    val again = TrainingDataJob.run(docs,
      TrainingDataJob.Config(
        jaccardThreshold = 0.7,
        langFractions = Map("en" -> 1.0), defaultFraction = 0.5))
    assert(again.select("doc_id").as[Long].collect().toSet == outIds)
    // feature columns present and populated
    assert(rows.forall(r => r.getAs[Int]("n_tokens") > 0))
    assert(rows.forall(r => r.getAs[String]("md5_exact").length == 32))
    // packing covers every shipped row with a valid window slot
    assert(rows.forall(r => r.getAs[Long]("pack_id") >= 0))
    assert(rows.forall { r =>
      val off = r.getAs[Long]("pack_offset")
      off >= 0 && off < 2048
    })
  }

  test("decontamination stage drops docs that leak the eval set") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    // adversarial eval set: exact copies of two training docs
    val eval = docs.filter(col("doc_id").isin(20L, 40L))
      .select(col("doc_id") + 100000, col("text"))
      .toDF("doc_id", "text")
    val cfg = TrainingDataJob.Config(
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0)
    // guard against vacuity: without an eval set these docs ship
    val withoutEval = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assume(withoutEval.contains(20L) && withoutEval.contains(40L))
    val ids = TrainingDataJob.run(docs, cfg, evalSet = Some(eval))
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(20L) && !ids.contains(40L),
      "docs identical to eval members must not ship")
    // the stage is a filter, not a rewrite: clean docs still flow and
    // nothing outside it is added
    assert(ids.nonEmpty && ids.subsetOf(withoutEval))
  }
}
