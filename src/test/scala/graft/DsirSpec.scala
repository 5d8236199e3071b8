package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dsir
import graft.sources.Tables

class DsirSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val model =
    Dsir.fit(docs.filter(col("lang") === "en"), docs, "text", buckets = 1024)

  test("fit is deterministic and every bucket is finite (Laplace smoothing)") {
    val again =
      Dsir.fit(docs.filter(col("lang") === "en"), docs, "text", buckets = 1024)
    assert(model.logRatio.toSeq == again.logRatio.toSeq,
      "fit twice must be identical")
    assert(model.logRatio.forall(lr => !lr.isNaN && !lr.isInfinite),
      "smoothing must keep every bucket finite")
  }

  test("target-like documents outscore off-target documents") {
    // target = en: the synthetic corpora use language-disjoint word
    // inventories, so the en hashed-bigram profile must separate
    val byLang = Dsir.scores(docs, "doc_id", "text", model)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy($"lang" === "en").agg(avg("dsir_logw"))
      .as[(Boolean, Double)].collect().toMap
    assert(byLang(true) > byLang(false) + 1.0,
      s"mean en score must clearly exceed mean non-en, got $byLang")
  }

  test("empty and NULL documents score exactly 0 (never NULL)") {
    val df = Seq((1L, Some("")), (2L, Some("   ")), (3L, None))
      .toDF("doc_id", "text")
    val s = Dsir.scores(df, "doc_id", "text", model)
    assert(s.as[(Long, Double)].collect().toSet ==
      Set(1L -> 0.0, 2L -> 0.0, 3L -> 0.0))
    // and a NULL-text doc is still sampleable (its key is the pure
    // Gumbel draw, not NULL-sorted-last)
    val sel = Dsir.select(df, "doc_id", "text", model, k = 3, "s")
    assert(sel.filter(col("dsir_key").isNull).count() == 0)
    assert(sel.count() == 3)
  }

  test("select draws k docs, reruns identically, and enriches the target") {
    val k = 100
    val sel = Dsir.select(docs, "doc_id", "text", model, k, "epoch0")
      .as[(Long, Double)].collect()
    assert(sel.length == k)
    assert(sel.map(_._2).toSeq == sel.map(_._2).sorted(
      Ordering[Double].reverse).toSeq, "output must be key-descending")
    val again = Dsir.select(docs, "doc_id", "text", model, k, "epoch0")
      .as[(Long, Double)].collect()
    assert(sel.toSeq == again.toSeq, "same seed must reproduce the draw")
    val enFrac = docs.filter($"lang" === "en").count().toDouble / docs.count()
    val selEn = docs.join(sel.map(_._1).toSeq.toDF("doc_id"), "doc_id")
      .filter($"lang" === "en").count().toDouble / k
    assert(selEn > enFrac + 0.15,
      s"importance resampling must enrich en: $selEn vs corpus $enFrac")
  }

  test("a fresh seed is a different draw of the same distribution") {
    val a = Dsir.select(docs, "doc_id", "text", model, 100, "epoch0")
      .select("doc_id").as[Long].collect().toSet
    val b = Dsir.select(docs, "doc_id", "text", model, 100, "epoch1")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b, "different seeds must not replay the same sample")
    assert((a intersect b).size > 20,
      "both draws still concentrate on the high-weight docs")
  }

  test("incremental counts: merge(+delta, -retracted) refits the exact full model") {
    val half = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 === 1)
    // grow: counts(half) + counts(delta) must refit identically to
    // fit over the whole corpus (integer counts — exact)
    val grown = Dsir.mergeCounts(
      Dsir.bucketCounts(half, "text", 1024),
      Dsir.bucketCounts(delta, "text", 1024))
    val viaCounts = Dsir.modelFromCounts(
      Dsir.mergeCounts(
        Dsir.bucketCounts(half.filter($"lang" === "en"), "text", 1024),
        Dsir.bucketCounts(delta.filter($"lang" === "en"), "text", 1024)),
      grown, 1024)
    assert(viaCounts.logRatio.toSeq == model.logRatio.toSeq,
      "maintained counts must refit bit-identically to a full fit")
    // shrink: subtracting the delta's counts lands exactly on counts(half)
    val shrunk = Dsir.mergeCounts(grown,
      Dsir.negatedCounts(delta, "text", 1024))
      .as[(Long, Long)].collect().toMap
    val direct = Dsir.bucketCounts(half, "text", 1024)
      .as[(Long, Long)].collect().toMap
    assert(shrunk == direct, "retraction must subtract exactly")
  }

  test("save/load round-trips the model bit-for-bit") {
    val root = Files.createTempDirectory("dsir").resolve("model").toString
    Dsir.saveModel(spark, model, root)
    val back = Dsir.loadModel(spark, root)
    assert(back.buckets == model.buckets)
    assert(back.logRatio.toSeq == model.logRatio.toSeq)
    // and the scores under the reloaded model are identical
    val a = Dsir.scores(docs, "doc_id", "text", model)
      .as[(Long, Double)].collect().toSet
    val b = Dsir.scores(docs, "doc_id", "text", back)
      .as[(Long, Double)].collect().toSet
    assert(a == b)
  }
}
