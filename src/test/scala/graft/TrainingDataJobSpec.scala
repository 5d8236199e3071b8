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
    // every shipped row carries its export shard + shuffle order key
    assert(rows.forall { r =>
      val s = r.getAs[Long]("shard")
      s >= 0 && s < 8 && r.getAs[String]("shuffle_key").length == 32
    })
  }

  test("PII never reaches the shipped corpus (redaction runs first)") {
    val base = Tables.load(spark, sfDir, "documents").limit(50)
    // plant PII into otherwise-passing docs
    val docs = base.withColumn("text",
      concat(col("text"), lit(" reach me at leak@example.com or 10.1.2.3")))
    val out = TrainingDataJob.run(docs,
      TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
        defaultFraction = 1.0))
    val texts = out.select("text").as[String].collect()
    assert(texts.nonEmpty)
    assert(texts.forall(t => !t.contains("leak@example.com") &&
      !t.contains("10.1.2.3")))
    assert(texts.forall(t => t.contains("<EMAIL>") && t.contains("<IP>")))
    // the fingerprints/features were computed over the REDACTED text
    val md5s = out.select("text", "md5_exact").as[(String, String)].collect()
    md5s.foreach { case (t, m) =>
      assert(m == java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    // opting out keeps raw bytes (compliance decision is explicit)
    val raw = TrainingDataJob.run(docs,
      TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
        defaultFraction = 1.0, redactPii = false))
      .select("text").as[String].collect()
    assert(raw.forall(_.contains("leak@example.com")))
  }

  test("model-based quality gate swaps in for the rule gate") {
    val docs = Tables.load(spark, sfDir, "documents").limit(120)
    val model = graft.operators.QualityModel.train(
      graft.operators.QualityModel.features(docs, "doc_id", "text"))
    val out = TrainingDataJob.run(docs,
      TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
        defaultFraction = 1.0, qualityModel = Some(model),
        minQualityProb = 0.5))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every survivor clears the model's probability bar
    val survivors = out.select("doc_id", "text")
    val probs = graft.operators.QualityModel.score(model,
        graft.operators.QualityModel.features(survivors, "doc_id", "text"))
      .select("quality_prob").as[Double].collect()
    assert(probs.forall(_ >= 0.5))
    // schema is identical to the rule-gate pipeline's output
    val ruleOut = TrainingDataJob.run(docs,
      TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
        defaultFraction = 1.0))
    assert(out.columns.toSeq == ruleOut.columns.toSeq)
  }

  test("incremental tick ≡ full run on shipped ids; packs continue the bookmark") {
    val docs = Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)

    val fullIds = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    val priorOut = TrainingDataJob.run(old, cfg)
    val priorIds = priorOut.select("doc_id").as[Long].collect().toSet
    val bookmark = priorOut.agg(sum(col("n_tokens").cast("long")))
      .as[Long].head()
    // the prior clustering over the old quality docs (what run used)
    val priorClusters = graft.operators.DedupCluster.minHashClusters(
        TrainingDataJob.curatedQuality(old, cfg), "doc_id", "text",
        k = 3, threshold = cfg.jaccardThreshold)
      .select("doc_id", "cluster_id")

    val r = TrainingDataJob.tick(old, priorClusters, bookmark, delta, cfg)
    val (adds, retracted) = (r.additions, r.retractedIds)
    val addIds = adds.select("doc_id").as[Long].collect().toSet
    val retractIds = retracted.as[Long].collect().toSet
    assert((priorIds -- retractIds) ++ addIds == fullIds)
    // additions' pack slots continue after the bookmark
    val minStart = adds
      .agg(min(col("pack_id") * cfg.packBudget + col("pack_offset")))
      .as[Long].head()
    assert(minStart >= bookmark)
  }

  test("gopher gate: a symbol-heavy delta doc never ships; tick ≡ full run") {
    val base = Tables.load(spark, sfDir, "documents").limit(120)
    // passes the base quality gate (long enough, English stopwords)
    // but fails Gopher's symbol-to-word ratio (8 '#' over ~20 words)
    val badText = "the cat and the dog have been to the # market # with " +
      "# all # of # that # hash # spam # noise # stuff"
    val bad = base.limit(1).withColumn("doc_id", lit(990000L))
      .withColumn("text", lit(badText))
    val docs = base.unionByName(bad)
    val cfgOff = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0)
    // fixture vocabulary carries only "the" from the 8-word list, so
    // re-threshold stop hits to 1 (the battery's published 2 would
    // blank the corpus); the bad doc fails on symbol ratio regardless
    val cfgOn = cfgOff.copy(gopherGate = true, gopherMinWords = 5,
      gopherMinStopHits = 1)
    // without the gopher gate the doc ships (it IS base-gate quality)…
    assert(TrainingDataJob.run(docs, cfgOff)
      .filter(col("doc_id") === 990000L).count() == 1)
    // …with it, the batch run drops it and keeps real docs
    val full = TrainingDataJob.run(docs, cfgOn)
    val fullIds = full.select("doc_id").as[Long].collect().toSet
    assert(!fullIds.contains(990000L) && fullIds.nonEmpty)
    // streaming tier: the bad doc arrives as a DELTA — the tick gates
    // through the same code path, so it never ships and shipped state
    // converges to the batch run
    val old = base.filter(col("doc_id") < 300)
    val delta = base.filter(col("doc_id") >= 300).unionByName(bad)
    val priorOut = TrainingDataJob.run(old, cfgOn)
    val priorIds = priorOut.select("doc_id").as[Long].collect().toSet
    val bookmark = priorOut.agg(sum(col("n_tokens").cast("long")))
      .as[Long].head()
    val priorClusters = graft.operators.DedupCluster.minHashClusters(
        TrainingDataJob.curatedQuality(old, cfgOn), "doc_id", "text",
        k = 3, threshold = cfgOn.jaccardThreshold)
      .select("doc_id", "cluster_id")
    val r = TrainingDataJob.tick(old, priorClusters, bookmark, delta, cfgOn)
    val addIds = r.additions.select("doc_id").as[Long].collect().toSet
    val retractIds = r.retractedIds.as[Long].collect().toSet
    assert(!addIds.contains(990000L))
    assert((priorIds -- retractIds) ++ addIds == fullIds)
  }

  test("canonicalByQuality keeps the longest duplicate; the tick retracts the demoted copy") {
    // near-dup pair where the LONGER (least-truncated) copy has the
    // LARGER id: min-id election keeps 1, quality election keeps 2.
    // Stopwords planted so the quality gate passes (the@11, and@15).
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    val short = (1L, txt(1, 20), "en")  // 20 words, truncated copy
    val long = (2L, txt(1, 24), "en")   // 24 words, J = 18/22 ≈ 0.82
    val docs = Seq(short, long).toDF("doc_id", "text", "lang")
    val base = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0, jaccardThreshold = 0.7)

    val minId = TrainingDataJob.run(docs, base)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L), "default election keeps the smallest id")
    val cfg = base.copy(canonicalByQuality = true)
    val best = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(best == Set(2L), "quality election must keep the longest member")

    // incremental: the short copy shipped alone; the longer copy
    // arrives as a delta, wins the election, and demotes it
    val old = Seq(short).toDF("doc_id", "text", "lang")
    val delta = Seq(long).toDF("doc_id", "text", "lang")
    val priorClusters = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    val bookmark = TrainingDataJob.run(old, cfg)
      .agg(sum(col("n_tokens").cast("long"))).as[Long].head()
    val r = TrainingDataJob.tick(old, priorClusters, bookmark, delta, cfg)
    assert(r.additions.select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(r.retractedIds.as[Long].collect().toSet == Set(1L),
      "the demoted shipped copy must be retracted")
  }

  test("subword-denominated pipeline: n_tokens and pack budgets count pieces; tick contract holds") {
    val docs = Tables.load(spark, sfDir, "documents")
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 60)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5, subwordVocab = Some(model.vocab))

    val out = TrainingDataJob.run(docs, cfg)
    // n_tokens is the subword piece count, not the word count
    val sample = out.select("doc_id", "text", "n_tokens").limit(20)
      .collect()
    sample.foreach { r =>
      val pieces = Seq((r.getLong(0), r.getString(1)))
        .toDF("doc_id", "text")
        .select(size(graft.operators.Bpe.pieces(col("text"), model.vocab,
          model.maxPieceLen))).head().getInt(0)
      assert(r.getInt(2) == pieces,
        s"doc ${r.getLong(0)}: n_tokens ${r.getInt(2)} != pieces $pieces")
    }

    // the FROZEN vocab keeps the incremental contract: tick ≡ full
    // run on shipped ids, packs continue the piece-denominated bookmark
    val old = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300)
    val fullIds = out.select("doc_id").as[Long].collect().toSet
    val priorOut = TrainingDataJob.run(old, cfg)
    val priorIds = priorOut.select("doc_id").as[Long].collect().toSet
    val bookmark = priorOut.agg(sum(col("n_tokens").cast("long")))
      .as[Long].head()
    val priorClusters = graft.operators.DedupCluster.minHashClusters(
        TrainingDataJob.curatedQuality(old, cfg), "doc_id", "text",
        k = 3, threshold = cfg.jaccardThreshold)
      .select("doc_id", "cluster_id")
    val r = TrainingDataJob.tick(old, priorClusters, bookmark, delta, cfg)
    val addIds = r.additions.select("doc_id").as[Long].collect().toSet
    val retractIds = r.retractedIds.as[Long].collect().toSet
    assert((priorIds -- retractIds) ++ addIds == fullIds)
    val minStart = r.additions
      .agg(min(col("pack_id") * cfg.packBudget + col("pack_offset")))
      .as[Long].head()
    assert(minStart >= bookmark)
  }

  test("repetition gate drops looping boilerplate that passes length gates") {
    val looping = ("the spam " * 40).trim            // dup2 ratio ≈ 1
    val normal = "the quick brown fox jumps over the lazy dog and then " +
      "walks across a quiet field toward the distant river bank today"
    val docs = Seq((1L, looping, "en"), (2L, normal, "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = TrainingDataJob.Config(
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0,
      maxRepetitionRatio = 0.5)
    val ids = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L), "high-repetition doc must be gated out")
    assert(ids.contains(2L), "normal doc must survive the repetition gate")
    // and the looping doc DID pass the quality gate — repetition is
    // the signal that caught it, not length/stopwords
    val q = graft.operators.TextAnalysis.qualityFeatures(docs)
      .filter(col("doc_id") === 1L).select("is_quality").as[Boolean].head()
    assert(q, "fixture must defeat the quality gate for this test to bite")
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

  test("assembleEpoch: mix -> oversample -> curriculum composes deterministically") {
    def text(id: Long, words: Int) =
      (1 to words).map(j => s"w${id}x$j").mkString(" ")
    // big: 64 docs of 8 tokens; rare: 16 docs of 24 tokens (higher
    // quality score, 2x multiplier)
    val corpus = ((1L to 64L).map(id => (id, text(id, 8), "big")) ++
      (101L to 116L).map(id => (id, text(id, 24), "rare")))
      .toDF("doc_id", "text", "source")
    val epoch = TrainingDataJob.assembleEpoch(corpus, alpha = 0.5,
      docBudget = 40L, multipliers = Map("rare" -> 2.0),
      thresholds = Seq(16.0), epochSeed = "e0")
      .select("doc_id", "source", "epoch", "phase", "curriculum_pos")
      .as[(Long, String, Int, Int, Long)].collect()
    // sqrt quotas: sqrt(64):sqrt(16) = 2:1 -> big 26, rare 13
    val drawn = epoch.filter(_._3 == 0).map(_._1).distinct
    val bySource = epoch.filter(_._3 == 0).groupBy(_._2)
      .view.mapValues(_.map(_._1).distinct.length).toMap
    assert(bySource == Map("big" -> 26, "rare" -> 13), s"got $bySource")
    // rare's multiplier doubles it: every rare doc appears twice,
    // each copy with its own distinct curriculum position
    val rareCopies = epoch.filter(_._2 == "rare")
    assert(rareCopies.length == 26 &&
      rareCopies.map(_._1).distinct.length == 13)
    assert(epoch.map(_._5).distinct.length == epoch.length,
      "every copy owns a distinct position")
    assert(epoch.map(_._5).sorted.toSeq == (1L to epoch.length).toSeq,
      "positions are a 1-based permutation")
    // curriculum: 24-token rare docs are phase 0 and lead the order
    assert(epoch.filter(_._2 == "rare").forall(_._4 == 0))
    assert(epoch.filter(_._2 == "big").forall(_._4 == 1))
    assert(epoch.filter(_._4 == 0).map(_._5).max <
      epoch.filter(_._4 == 1).map(_._5).min)
    // same seed reproduces, a fresh seed redraws
    val again = TrainingDataJob.assembleEpoch(corpus, 0.5, 40L,
      Map("rare" -> 2.0), Seq(16.0), "e0")
      .select("doc_id", "source", "epoch", "phase", "curriculum_pos")
      .as[(Long, String, Int, Int, Long)].collect()
    assert(epoch.sortBy(r => (r._1, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._3)).toSeq)
    val fresh = TrainingDataJob.assembleEpoch(corpus, 0.5, 40L,
      Map("rare" -> 2.0), Seq(16.0), "e1")
      .select("doc_id").as[Long].collect().toSet
    assert(fresh != drawn.toSet, "a fresh seed is a fresh draw")
  }

  test("pre-flight gate: a clean drop curates; a dup-id drop stops loudly") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    assert(TrainingDataJob.runChecked(docs).count() > 0)
    // duplicated doc_id: the replace-by-doc state contract is void
    val dup = docs.unionByName(docs.limit(1))
    val e = intercept[IllegalStateException] {
      TrainingDataJob.runChecked(dup)
    }
    assert(e.getMessage.contains("unique(doc_id)"), e.getMessage)
  }
}
