package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Eval, Linkage, TextAnalysis}

/** Round-5 curation operators: Gopher quality rules, directional
  * shingle containment, blocked fuzzy record linkage, and retrieval
  * rank metrics — hand-computed fixtures pinning each formula.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Gopher rules -------------------------------------------------

  test("gopherRules: measurements and composite on a crafted doc") {
    // 6 words incl. 2 distinct stopwords; '#' and '...' symbols
    val docs = Seq((1L, "the cat sat with the mat# ...")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, minWords = 5, maxWords = 100)
      .select("word_count", "mean_word_len", "symbol_word_ratio",
        "alpha_word_ratio", "stop_hits", "gopher_pass")
      .as[(Int, Double, Double, Double, Int, Boolean)].head()
    // tokens: the, cat, sat, with, the, mat#, ... → 7 words
    assert(r._1 == 7)
    // symbols: one '#', one '...' → 2/7
    assert(r._3 == 0.2857)
    // alpha words: all but "..." → 6/7
    assert(r._4 == 0.8571)
    // distinct stopword hits: the, with → 2
    assert(r._5 == 2)
    // symbol ratio 0.29 ≥ 0.1 → fails the battery
    assert(!r._6)
  }

  test("gopherRules: stop_hits counts DISTINCT list words, not occurrences") {
    val docs = Seq((1L, "the the the the")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).select("stop_hits").as[Int].head()
    assert(r == 1)
  }

  test("gopherRules: empty doc yields null-safe false, not divide-by-zero") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs)
      .select("gopher_pass").as[Boolean].head()
    assert(!r)
  }

  // ---- Containment --------------------------------------------------

  test("shingleContainment: short doc inside long scores c_ab=1 while Jaccard stays low") {
    val short = "alpha beta gamma delta"                       // 2 shingles
    val long = short + " x1 y1 z1 x2 y2 z2 x3 y3 z3 x4 y4 z4"  // 14 shingles
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val c = Dedup.shingleContainment(docs, "doc_id", "text", k = 3, threshold = 0.6)
      .as[(Long, Long, Double, Double)].collect()
    assert(c.toSeq == Seq((1L, 2L, 1.0, 0.1429)))
    // the symmetric baseline on the same pair: J = 2/14 — below any
    // useful threshold, which is exactly the blind spot containment fills
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3, threshold = 0.0)
      .select("jaccard").as[Double].head()
    assert(j == 0.1429)
  }

  test("shingleContainment: respects the stop-shingle cap universe") {
    // one hot shingle shared by all docs; capping removes it so the
    // pair space collapses
    val docs = Seq((1L, "a b c q r s"), (2L, "a b c t u v"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.shingleContainment(docs, "doc_id", "text",
      k = 3, threshold = 0.1)
    assert(uncapped.count() == 3)
    val capped = Dedup.shingleContainment(docs, "doc_id", "text",
      k = 3, threshold = 0.1, maxShingleFreq = Some(2L))
    assert(capped.count() == 0)
  }

  // ---- Linkage ------------------------------------------------------

  test("linkRecords: dictionary collapse + blocked pairs with support counts") {
    val recs = Seq("red widget", "red widget", "red widgat", "red bolt",
      "blue widget").toDF("name0")
    val out = Linkage.linkRecords(recs, "name0", maxDist = 2)
      .as[(String, String, Int, Long, Long)].collect().toSet
    // "red widgat"~"red widget" dist 1; support: widget×2, widgat×1.
    // "blue widget" is in another block — never paired despite dist 2
    // from "red widget"; "red bolt" is dist>2 from both reds.
    assert(out == Set(("red widgat", "red widget", 1, 1L, 2L)))
  }

  test("fuzzyNamePairs: oversized blocks are dropped and auditable") {
    val dict = Seq(("aa x", 1L), ("aa y", 1L), ("aa z", 1L), ("bb x", 1L),
      ("bb y", 1L)).toDF("name", "n_records")
    val capped = Linkage.fuzzyNamePairs(dict, maxDist = 2,
      maxBlockSize = Some(2L))
    // blocks "0:aa"/"1:a" (3 names each) dropped; "0:bb"/"1:b" kept —
    // the aa names fall out of BOTH keys' blocks, bb pairs dedupe
    // across the two keys that both find them
    assert(capped.select("name_a").as[String].collect().forall(_.startsWith("bb")))
    val audit = Linkage.oversizedBlocks(dict, cap = 2L)
      .as[(String, Long)].collect().toSeq.sorted
    assert(audit == Seq(("0:aa", 3L), ("1:a", 3L)))
  }

  test("second blocking key links names a first-character typo separates") {
    // "Widget Corp" / "Qidget Corp": dist 1, but first tokens differ
    // in char 1 — the first-token key alone can NEVER pair them; the
    // skip-first-char key puts both in block "idget"
    val recs = Seq("Widget Corp", "Qidget Corp", "Widget Corp").toDF("name0")
    val out = Linkage.linkRecords(recs, "name0", maxDist = 2)
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(out == Set(("Qidget Corp", "Widget Corp", 1, 1L, 2L)))
    // and with only the first-token key, the pair is (by design) missed
    val firstOnly = Linkage.linkRecords(recs, "name0", maxDist = 2,
      blockKeys = Seq(Linkage.firstTokenBlock))
    assert(firstOnly.isEmpty)
  }

  test("linkDelta ≡ full resolveEntities on the union; bridging delta merges old entities") {
    // old corpus: two entities in block "aa" that sit 3 edits apart
    // (abcd vs axyz — NOT linkable at maxDist=2), plus a singleton
    val old = Seq("aa abcd", "aa abcd", "aa axyz", "bb solo").toDF("nm")
    val priorDict = Linkage.nameDictionary(old, "nm")
    val prior = Linkage.resolveEntities(old, "nm", maxDist = 2)
    val priorLabels = prior.select("name", "entity")
    // delta: "aa abyz" bridges abcd (dist 2) and axyz (dist 1) — the
    // two OLD entities must merge without recomputing old×old pairs;
    // plus a re-shipped known name (support bump only) and a brand-new
    // singleton block
    val delta = Seq("aa abyz", "bb solo", "cc fresh").toDF("nm")
    val out = Linkage.linkDelta(priorDict, priorLabels, delta, "nm",
      maxDist = 2)
    val full = Linkage.resolveEntities(old.unionByName(delta), "nm",
      maxDist = 2)
    val o = out.as[(String, String, Boolean, Long)].collect().toSet
    val f = full.as[(String, String, Boolean, Long)].collect().toSet
    assert(o == f)
    // and the merge actually happened: one entity spans the bridge
    assert(o.contains(("aa axyz", "aa abcd", false, 1L)))
    assert(o.contains(("aa abyz", "aa abcd", false, 1L)))
    // support bump for the re-shipped name, no phantom pair
    assert(o.contains(("bb solo", "bb solo", true, 2L)))
    // merged dictionary ≡ rebuilt dictionary
    val md = Linkage.mergeDictionary(priorDict, delta, "nm")
      .as[(String, Long)].collect().toSet
    val rd = Linkage.nameDictionary(old.unionByName(delta), "nm")
      .as[(String, Long)].collect().toSet
    assert(md == rd)
  }

  test("resolveEntities: transitive closure across a fuzzy chain, canonical = min name") {
    // aa abcd ~1~ aa abce ~2~ aa abef, but lev(abcd, abef) = 3 > 2:
    // one entity only via transitivity; "bb solo" stays a singleton
    val recs = Seq("aa abcd", "aa abce", "aa abce", "aa abef", "bb solo")
      .toDF("nm")
    val out = Linkage.resolveEntities(recs, "nm", maxDist = 2)
      .as[(String, String, Boolean, Long)].collect().toSet
    assert(out == Set(
      ("aa abcd", "aa abcd", true, 1L),
      ("aa abce", "aa abcd", false, 2L),
      ("aa abef", "aa abcd", false, 1L),
      ("bb solo", "bb solo", true, 1L)))
  }

  // ---- Calibration --------------------------------------------------

  test("equiDepthBins: balanced bins, ordered ranges, ≡ the single-window rule") {
    val df = (1 to 23).map(i => (i.toLong, (i * 7 % 23) / 10.0)).toDF("id", "s")
    val bins = graft.operators.Calibrate.equiDepthBins(df, "id", "s", 4)
      .orderBy("bin").as[(Int, Long, Double, Double)].collect()
    assert(bins.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // ((rank-1)*4) div 23: ranks 1..6 → bin 1, 7..12 → 2, 13..18 → 3, 19..23 → 4
    assert(bins.map(_._2).toSeq == Seq(6L, 6L, 6L, 5L))
    // equi-depth over a total order: ranges are disjoint and ascending
    bins.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
    // reference: the same rule through one global row_number
    import org.apache.spark.sql.expressions.Window
    val ref = df.withColumn("rk",
        row_number().over(Window.orderBy(col("s"), col("id"))))
      .withColumn("bin", (expr("((rk - 1) * 4) div 23") + 1).cast("int"))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"),
        round(min(col("s")), 4).as("lo"), round(max(col("s")), 4).as("hi"))
    assertSameRows(
      graft.operators.Calibrate.equiDepthBins(df, "id", "s", 4), ref)
  }

  test("equiDepthBins: tie runs across a bin boundary don't change the table") {
    // 10 equal scores, k=3: boundaries fall inside the tie run; the
    // bin table must match the windowed reference no matter which
    // tied rows land where
    val df = (1 to 10).map(i => (i.toLong, 0.5)).toDF("id", "s")
    val bins = graft.operators.Calibrate.equiDepthBins(df, "id", "s", 3)
      .orderBy("bin").as[(Int, Long, Double, Double)].collect()
    assert(bins.map(b => (b._1, b._2)).toSeq ==
      Seq((1, 4L), (2, 3L), (3, 3L)))
    assert(bins.forall(b => b._3 == 0.5 && b._4 == 0.5))
  }

  test("equiDepthBins: no window at all; bin pass rides the checkpointed range partitions") {
    val df = (1 to 50).map(i => (i.toLong, i / 3.0)).toDF("id", "s")
    val p = graft.operators.Calibrate.equiDepthBins(df, "id", "s", 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"), p)
    // only the model-sized bin aggregation shuffles downstream of the
    // (checkpointed) range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("ExistingRDD"), p)
  }

  // ---- Rank metrics -------------------------------------------------

  test("rankMetrics: hand-computed RR / recall / nDCG") {
    // q1: relevant {10, 11, 12}; system ranks 10 at 2, 12 at 3.
    //   rr = 1/2; recall@3 = 2/3
    //   dcg = 1/log2(3) + 1/log2(4) = 0.63093 + 0.5
    //   idcg (3 rel, k=3) = 1 + 1/log2(3) + 1/log2(4) = 2.13093
    //   ndcg = 1.13093/2.13093 = 0.5307
    // q2: relevant {20}; not retrieved → all zeros
    val results = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 12L, 3),
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3))
      .toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("qid", "nid")
    val m = Eval.rankMetrics(results, qrels, k = 3)
      .orderBy("qid").as[(Long, Double, Double, Double)].collect()
    assert(m.toSeq == Seq(
      (1L, 0.5, 0.6667, 0.5307),
      (2L, 0.0, 0.0, 0.0)))
  }

  test("rankMetrics: ideal ranking scores ndcg=1 and rr=1; rows beyond k ignored") {
    val results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 20L, 3))
      .toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 20L)).toDF("qid", "nid")
    val m = Eval.rankMetrics(results, qrels, k = 2)
      .as[(Long, Double, Double, Double)].head()
    // k=2: rank-3 hit ignored; idcg over min(3,2)=2 ideal slots
    assert(m == ((1L, 1.0, 0.6667, 1.0)))
  }

  test("rankSummary: macro averages") {
    val results = Seq((1L, 10L, 1), (2L, 98L, 1)).toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L), (2L, 20L)).toDF("qid", "nid")
    val s = Eval.rankSummary(results, qrels, k = 1)
      .as[(Double, Double, Double, Long)].head()
    assert(s == ((0.5, 0.5, 0.5, 2L)))
  }

  test("rankMetrics: duplicate result rows keep min rank and cannot push metrics past 1") {
    // (1,10) appears at ranks 1 AND 2: without dedup n_hits=2 would
    // inflate recall to 2/1 and dcg past the ideal
    val results = Seq((1L, 10L, 1), (1L, 10L, 2), (1L, 11L, 3))
      .toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L)).toDF("qid", "nid")
    val m = Eval.rankMetrics(results, qrels, k = 3)
      .as[(Long, Double, Double, Double)].head()
    assert(m == ((1L, 1.0, 1.0, 1.0)))
  }

  // ---- Approximate containment (the LSH scale path) -----------------

  test("containmentLsh ≡ shingleContainment, including the asymmetric pair") {
    // doc 1 fully inside doc 2 (c_ab=1) with J=0.5 — the banding
    // finds J=0.5 pairs with P(miss) ≈ (1-0.25)^64 < 1e-8 under the
    // FIXED seeded permutations, so this equality is deterministic;
    // doc 3 shares nothing
    val short = "alpha beta gamma delta epsilon zeta"           // 4 shingles
    val long = short + " k1 k2 k3 k4"                           // 8 shingles
    val docs = Seq((1L, short), (2L, long), (3L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val exact = Dedup.shingleContainment(docs, "doc_id", "text",
      k = 3, threshold = 0.6).as[(Long, Long, Double, Double)].collect().toSet
    val lsh = Dedup.containmentLsh(docs, "doc_id", "text",
      k = 3, threshold = 0.6).as[(Long, Long, Double, Double)].collect().toSet
    assert(exact == Set((1L, 2L, 1.0, 0.5)))
    assert(lsh == exact) // survivor scores are exact, not estimates
  }

  test("containmentLsh: estimate prefilter drops sub-threshold candidates before verification") {
    // docs 1/2 share half their shingles (J=1/3, c=0.5 both ways) —
    // banding WILL surface them as a candidate, but with threshold
    // 0.9 and margin 0.1 the signature estimate ĉ≈0.5 < 0.8 kills the
    // pair before any shingle row is touched, and the exact output is
    // empty either way
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d x y"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentLsh(docs, "doc_id", "text",
      k = 3, threshold = 0.9, margin = 0.1)
    assert(out.count() == 0)
    // sanity: at a threshold the pair clears, LSH finds what exact finds
    val lo = Dedup.containmentLsh(docs, "doc_id", "text", k = 3, threshold = 0.4)
      .as[(Long, Long, Double, Double)].collect().toSet
    val exactLo = Dedup.shingleContainment(docs, "doc_id", "text",
      k = 3, threshold = 0.4).as[(Long, Long, Double, Double)].collect().toSet
    assert(lo == exactLo && lo.nonEmpty)
  }

  test("equiDepthBins: null scores are excluded, not a runtime crash") {
    val df = Seq((1L, Some(0.1)), (2L, None), (3L, Some(0.3)), (4L, Some(0.2)),
      (5L, None)).toDF("id", "s")
    val bins = graft.operators.Calibrate.equiDepthBins(df, "id", "s", 3)
      .orderBy("bin").as[(Int, Long, Double, Double)].collect()
    // 3 non-null scores → 3 bins of 1
    assert(bins.toSeq == Seq((1, 1L, 0.1, 0.1), (2, 1L, 0.2, 0.2),
      (3, 1L, 0.3, 0.3)))
  }

  test("rankMetricsGraded: hand-computed graded DCG; ideal ranking scores 1") {
    // q1: judged {(10, gain 2), (11, gain 1), (12, gain 2)}; system
    // ranks 11 (gain 1) first, then 10 (gain 2) — a binary metric
    // sees two hits either way, graded nDCG penalizes the order
    val results = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 99L, 3),
      (2L, 20L, 1)).toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L, 2), (1L, 11L, 1), (1L, 12L, 2),
      (2L, 20L, 2)).toDF("qid", "nid", "gain")
    val m = Eval.rankMetricsGraded(results, qrels, k = 3)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    // q1 dcg = 1/log2(2) + 2/log2(3); idcg = 2 + 2/log2(3) + 1/log2(4)
    val dcg1 = 1.0 / log2(2) + 2.0 / log2(3)
    val idcg1 = 2.0 + 2.0 / log2(3) + 1.0 / log2(4)
    assert(m(0)._1 == 1L && m(0)._4 == 3L)
    assert(math.abs(m(0)._2 - dcg1) < 1e-3 &&
      math.abs(m(0)._3 - dcg1 / idcg1) < 1e-3, m(0).toString)
    // q2: the single judged doc at rank 1 — perfect graded ranking
    assert(m(1) == ((2L, 2.0, 1.0, 1L)))
  }

  test("rankMetricsGraded: all-gain-0 query yields ndcg 0, not null") {
    // TREC qrels routinely carry judged-nonrelevant gain-0 rows; a
    // query where EVERY judged row is gain 0 has idcg=0 — ndcg must
    // come back 0 (the divide-by-zero guard), never null
    val results = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "nid", "rank")
    val qrels = Seq((1L, 10L, 0), (1L, 11L, 0)).toDF("qid", "nid", "gain")
    val m = Eval.rankMetricsGraded(results, qrels, k = 3)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(m == Seq((1L, 0.0, 0.0, 2L)))
  }

  test("classificationMetrics: hand-computed confusion, one-sided classes") {
    // true: A A A B B C ; pred: A B A B B D
    val preds = Seq(("A", "A"), ("A", "B"), ("A", "A"),
      ("B", "B"), ("B", "B"), ("C", "D")).toDF("t", "p")
    val m = Eval.classificationMetrics(preds, "t", "p")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(m.toSeq == Seq(
      // A: support 3, predicted 2, tp 2 → P=1.0 R=0.6667 F1=2·2/5=0.8
      ("A", 3L, 2L, 2L, 1.0, 0.6667, 0.8),
      // B: support 2, predicted 3, tp 2 → P=0.6667 R=1.0 F1=0.8
      ("B", 2L, 3L, 2L, 0.6667, 1.0, 0.8),
      // C: never predicted → precision 0 by convention
      ("C", 1L, 0L, 0L, 0.0, 0.0, 0.0),
      // D: never true → recall 0 by convention
      ("D", 0L, 1L, 0L, 0.0, 0.0, 0.0)))
    // micro accuracy = Σtp / Σn_true
    assert(m.map(_._4).sum.toDouble / m.map(_._2).sum == 4.0 / 6.0)
  }
}
