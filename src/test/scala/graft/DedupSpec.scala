package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dedup family (ext tier): exact groups, shingle edge cases, and the
  * LSH-verified == exact-Jaccard contract the oracle also checks.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: canonical id = min id per identical text") {
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc"), (4L, "aa bb"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 3L, false), (4L, 1L, true)))
  }

  test("shingles: docs shorter than k yield zero shingles, not an error") {
    val docs = Seq((1L, "one two"), (2L, "a b c d"), (3L, ""))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toSet
    assert(sh == Set((2L, "a b c"), (2L, "b c d")))
  }

  test("shingles are distinct per doc (repeated trigrams collapse)") {
    val docs = Seq((1L, "x y x y x y x")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toSeq
    assert(sh.distinct == sh)
    assert(sh.map(_._2).toSet == Set("x y x", "y x y"))
  }

  test("minHashLsh equals exact ngramJaccard on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3, threshold = 0.7)
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", k = 3, threshold = 0.7)
    // verified-LSH must equal the exact answer (candidates ⊇ true pairs
    // at this threshold, verification trims to ground truth)
    assertSameRows(lsh, exact)
    assert(exact.count() > 0) // corpus actually contains near-dups
  }

  test("ngramJaccard maxShingleFreq drops hot shingles from candidates") {
    // 3 docs share a stop-shingle; only 1-2 share a rare one
    val docs = Seq(
      (1L, "the of and rare pair one"),
      (2L, "the of and rare pair two"),
      (3L, "the of and different tail here")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.0)
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.0,
      maxShingleFreq = Some(2))
    // capping never invents pairs and drops at least the all-hot ones
    val up = uncapped.select("da", "db").as[(Long, Long)].collect().toSet
    val cp = capped.select("da", "db").as[(Long, Long)].collect().toSet
    assert(cp.subsetOf(up))
    // jaccard over ONE consistent universe (the capped sets): docs 1,2
    // keep {of and rare, and rare pair, rare pair one/two} → |∩|=2,
    // |A|=|B|=3 → J = 2/(3+3−2) = 0.5. (Sizing from the UNCAPPED sets
    // — the round-1 advice bug — gave 2/(4+4−2) ≈ 0.3333.)
    val j12 = capped.filter(col("da") === 1 && col("db") === 2)
      .select("jaccard").as[Double].head()
    assert(j12 == 0.5, s"expected capped-universe jaccard 0.5, got $j12")
  }

  test("minHashLshDelta returns exactly the full answer's delta-touching pairs") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val full = Dedup.minHashLsh(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    // delta = the last quarter of doc ids (arrived "this tick")
    val cut = 150L
    val deltaIds = docs.filter(col("doc_id") >= cut).select(col("doc_id"))
    val (sh, bands) = Dedup.minHashIndex(docs, "doc_id", "text", k = 3)
    val delta = Dedup.minHashLshDelta(sh, bands, deltaIds, threshold = 0.5)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    val expected = full.filter(p => p._1 >= cut || p._2 >= cut)
    assert(delta == expected,
      s"missing=${expected -- delta}, extra=${delta -- expected}")
    assert(expected.nonEmpty, "test corpus produced no delta-touching pairs")
  }

  test("containmentLshDelta returns exactly the full LSH answer's delta-touching pairs") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val full = Dedup.containmentLsh(docs, "doc_id", "text",
        k = 3, threshold = 0.4)
      .as[(Long, Long, Double, Double)].collect().toSet
    val cut = 150L
    val deltaIds = docs.filter(col("doc_id") >= cut).select(col("doc_id"))
    // the containment path's finer banding (64 × 2)
    val (sh, _, bands) = Dedup.minHashIndexFull(docs, "doc_id", "text",
      k = 3, numPerm = 128, bands = 64)
    val delta = Dedup.containmentLshDelta(sh, bands, deltaIds,
        threshold = 0.4)
      .as[(Long, Long, Double, Double)].collect().toSet
    val expected = full.filter(p => p._1 >= cut || p._2 >= cut)
    assert(delta == expected,
      s"missing=${expected -- delta}, extra=${delta -- expected}")
    assert(expected.nonEmpty, "test corpus produced no delta-touching pairs")
  }

  test("bucketed minhash index: delta probe correct and plans without a full-index shuffle") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val (sh, bands) = Dedup.minHashIndex(docs, "doc_id", "text", k = 3)
    try {
      // the index persisted as store tables: band rows bucketed on the
      // probe key (SURVEY §9.1), shingles as a plain table (probed via
      // broadcast semi-join, never the join's shuffled side)
      graft.sources.AnalysisStore.writeBucketed(
        bands, "mh_bands", Seq("band", "bkey"), nBuckets = 8)
      val shDir = java.nio.file.Files.createTempDirectory("mhidx")
        .resolve("sh").toString
      graft.sources.AnalysisStore.writeFull(sh, shDir)
      sh.unpersist()
      val bandsT = spark.table("mh_bands")
      val shT = spark.read.parquet(shDir)

      // correctness through the store round-trip: same contract as the
      // in-memory delta test
      val cut = 150L
      val deltaIds = docs.filter(col("doc_id") >= cut).select(col("doc_id"))
      val full = Dedup.minHashLsh(docs, "doc_id", "text", k = 3, threshold = 0.5)
        .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
      val delta = Dedup.minHashLshDelta(shT, bandsT, deltaIds, threshold = 0.5)
        .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(delta == full.filter(p => p._1 >= cut || p._2 >= cut),
        "store-backed delta probe must equal the in-memory answer")

      // plan shape: the band self-join reads co-located buckets — the
      // only hash exchange anywhere is the candidate-pair distinct
      // (delta-sized); the full index never shuffles
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = Dedup.deltaCandidates(bandsT, deltaIds)
          .queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
        assert(p.contains("SortMergeJoin"), p)
        assert(p.contains("BroadcastHashJoin"), p) // the delta semi-join
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS mh_bands")
  }

  test("simhashPairs: near-identical docs collide, distinct docs don't") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " mu"), // tiny edit → small hamming
      (3L, "totally different words about unrelated subject matter entirely"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("contamination: leaked shingles flagged, clean and short docs handled") {
    val eval = Seq((100L, "the quick brown fox jumps over dogs"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps high today"), // 3 of 5 shingles leak
      (2L, "completely unrelated training content here"),
      (3L, "ab")) // shorter than k words → no shingles → not emitted
      .toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, eval, "doc_id", "text",
        k = 3, threshold = 0.5)
      .orderBy("doc_id").as[(Long, Double, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._2 == 0.6 && out(0)._3) // 3/5 leaked → contaminated
    assert(out(1)._2 == 0.0 && !out(1)._3)
  }

  test("contaminationBloom: superset of exact flags; exact on this fixture") {
    val eval = Seq((100L, "the quick brown fox jumps over dogs"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "completely unrelated training content here"),
      (3L, "ab"))
      .toDF("doc_id", "text")
    // tiny fixture + 1% fpp → zero false positives: bloom output must
    // EQUAL the exact path here; superset-ness at scale is what the
    // driver gate (contamination_bloom_gate) pins on real data
    assertSameRows(
      Dedup.contaminationBloom(corpus, eval, "doc_id", "text",
        k = 3, threshold = 0.5),
      Dedup.contamination(corpus, eval, "doc_id", "text",
        k = 3, threshold = 0.5))
    // ratio monotonicity is structural (no false negatives): a doc
    // fully inside the eval set reads 1.0 regardless of fpp
    val leaked = Dedup.contaminationBloom(
      Seq((9L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text"),
      eval, "doc_id", "text", k = 3, threshold = 0.5)
      .as[(Long, Double, Boolean)].head()
    assert(leaked._2 == 1.0 && leaked._3)
  }

  test("spanDedup keeps first occurrence by (doc, pos) and reassembles") {
    val docs = Seq(
      (1L, "a b c d"),  // both spans first occurrences
      (2L, "a b x y"),  // "a b" already seen in doc 1
      (3L, "c d"))      // whole doc = doc 1's second span
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", span = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 1L, 0L, "")))
  }

  test("spanDedup: short tail span is its own piece; within-doc repeats collapse") {
    val docs = Seq((1L, "p q p q p")).toDF("doc_id", "text")
    // spans of 2: "p q"(0), "p q"(1, dup), "p"(2)
    val out = Dedup.spanDedup(docs, "doc_id", "text", span = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 3L, 2L, "p q p")))
  }

  test("duplicatedSubstringSpans merges overlapping dup windows into maximal ranges") {
    val docs = Seq(
      (1L, "a b c d e"),        // "a b","b c" shared with doc 2
      (2L, "x a b c y"),        // same two windows at pos 1,2
      (3L, "a b z z z a b"))    // within-doc repeats: "a b"×2, "z z"×2
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSubstringSpans(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // doc 1: dup windows at 0,1 → tokens [0,2]
      (1L, 0L, 2L, 3L, 2L),
      // doc 2: dup windows at 1,2 → tokens [1,3]
      (2L, 1L, 3L, 3L, 2L),
      // doc 3: dup windows 0,2,3,5 chain (gap ≤ k) → whole doc [0,6]
      (3L, 0L, 6L, 7L, 4L)))
  }

  test("duplicatedSubstringSpansDelta ≡ full run restricted to delta; merge ≡ rebuild") {
    val docs = Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300)
    val index = Dedup.substringWindowIndex(old, "doc_id", "text", k = 5)
    val incremental = Dedup.duplicatedSubstringSpansDelta(
      index, delta, "doc_id", "text", k = 5)
    val full = Dedup.duplicatedSubstringSpans(docs, "doc_id", "text", k = 5)
      .filter(col("doc_id") >= 300)
    assertSameRows(incremental, full)
    assertSameRows(
      Dedup.mergeSubstringWindowIndex(index, delta, "doc_id", "text", k = 5),
      Dedup.substringWindowIndex(docs, "doc_id", "text", k = 5))
  }

  test("spanDedupDelta ≡ full spanDedup restricted to the delta docs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300)
    val full = Dedup.spanDedup(docs, "doc_id", "text", span = 5)
      .filter(col("doc_id") >= 300)
    val incremental = Dedup.spanDedupDelta(
      Dedup.spanFirstIndex(old, "doc_id", "text", span = 5),
      delta, "doc_id", "text", span = 5)
    assertSameRows(incremental, full)
    // and the old docs' full-run results were not affected by the
    // delta at all (monotonic ids ⇒ first occurrences never move back)
    val oldFull = Dedup.spanDedup(docs, "doc_id", "text", span = 5)
      .filter(col("doc_id") < 300)
    val oldOnly = Dedup.spanDedup(old, "doc_id", "text", span = 5)
    assertSameRows(oldFull, oldOnly)
  }

  test("embeddingCosinePairs finds only above-threshold pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embeddingCosinePairsLsh ⊆ exact with identical scores; recall holds on the fixture") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.embeddingCosinePairsLsh(e, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    // verification is exact: every emitted pair IS an exact pair,
    // score included — the approximation can only MISS, never invent
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble / exact.size >= 0.9)
    // near-identical vectors (the production dedup regime) are found
    // regardless of bucket luck: cos≈1 agrees on every sign bit
    val twin = Seq((9001L, Array.fill(64)(0.5f)), (9002L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val t = Dedup.embeddingCosinePairsLsh(twin, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(t == Seq((9001L, 9002L, 1.0)))
  }

  test("signLshPlan: corpus-derived geometry; degeneracy falls with threshold") {
    // sf0.01 fixture regime: reproduces the hand-tuned 4-bit geometry
    assert(Dedup.signLshPlan(500, 0.4) == ((4, 30)))
    // 10x corpus: bits grow with n (buckets hold ~constant population),
    // tables grow to hold recall at the SAME threshold
    val (b1, t1) = Dedup.signLshPlan(20000, 0.4)
    assert(b1 == 8 && t1 > 30)
    // production threshold (cos >= 0.9): the per-bit gap p1/p_rand =
    // 0.86/0.5 is wide, so random pairs are pruned hard...
    val (b9, t9) = Dedup.signLshPlan(20000, 0.9)
    assert(Dedup.signLshDegeneracy(b9, t9) < 0.1,
      s"production plan must prune: ${Dedup.signLshDegeneracy(b9, t9)}")
    // ...while the adversarial 0.4 threshold is DEGENERATE at scale:
    // no plan holds recall 0.99 without keeping ~half of all pairs —
    // the documented 'use semDeDup here' regime
    assert(Dedup.signLshDegeneracy(b1, t1) > 0.4)
  }

  test("semDeDup: keep-farthest-from-centroid policy on a constructed cluster") {
    // one cluster (k=1 ⇒ centroid = normalized mean, deterministic):
    // x at 0°, y at 5°, z at 60°. Mean direction ≈ 20.9°, so x is
    // FARTHER from the centroid than y (cos 20.9° < cos 15.9°). The
    // only ≥0.99 pair is (x,y) (cos 5° ≈ 0.9962) — SemDeDup must drop
    // y (the more-typical member) and keep x and z.
    def v(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    val docs = Seq((1L, v(0)), (2L, v(5)), (3L, v(60)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(docs, "vec_id", "embedding",
        threshold = 0.99, nClusters = 1)
      .select("vec_id", "is_duplicate").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("semDeDup: exact twins dedup to the smaller id; output partitions the corpus") {
    val twin = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(twin, "vec_id", "embedding",
      threshold = 0.95, nClusters = 2)
    val m = out.select("vec_id", "is_duplicate")
      .as[(Long, Boolean)].collect().toMap
    assert(m == Map(1L -> false, 2L -> true, 3L -> false))
    assert(out.count() == 3 && out.select("vec_id").distinct().count() == 3)
  }

  test("semDeDup invariants on the embeddings fixture: partition, valid drops, no kept in-cluster dup") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val out = Dedup.semDeDup(e, "vec_id", "embedding",
      threshold = 0.4, nClusters = 16).cache()
    assert(out.count() == n && out.select("vec_id").distinct().count() == n)
    // cross-check the drop set against the EXACT pair list restricted
    // to the operator's own clusters (the dedup_semdedup_gate logic)
    val exact = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 0.4)
      .select("va", "vb")
    val a = out.select(col("vec_id").as("va"), col("cluster").as("ca"),
      col("centroid_sim").as("da"), col("is_duplicate").as("dup_a"))
    val b = out.select(col("vec_id").as("vb"), col("cluster").as("cb"),
      col("centroid_sim").as("db"), col("is_duplicate").as("dup_b"))
    val inCluster = exact.join(a, Seq("va")).join(b, Seq("vb"))
      .filter(col("ca") === col("cb")).cache()
    // no surviving same-cluster pair above threshold
    assert(inCluster.filter(!col("dup_a") && !col("dup_b")).count() == 0)
    val expected = inCluster.select(
        when(col("da") <= col("db"), col("vb")).otherwise(col("va"))
          .as("vec_id")).distinct()
      .as[Long].collect().toSet
    val actual = out.filter(col("is_duplicate")).select("vec_id")
      .as[Long].collect().toSet
    assert(actual == expected)
    assert(actual.nonEmpty, "fixture should contain semantic near-dups")
    out.unpersist(); inCluster.unpersist()
  }
}
