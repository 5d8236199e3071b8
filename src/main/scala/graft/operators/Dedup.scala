package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication family for training-data pipelines (ext tier,
  * SURVEY §7.1): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine. Each returns a deterministic result so the
  * DuckDB oracle can hash-check it; the *plans* differ in how they
  * avoid the O(n²) pair space at 100 TB.
  */
object Dedup {

  /** Exact dedup: canonical id per identical-content group, one
    * hash-groupBy (well, a window over the content hash — same single
    * shuffle). At scale: shuffle is by md5, perfectly uniform, no
    * skew.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    df.select(col(idCol),
        min(col(idCol)).over(w).as("canonical_id"))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Distinct k-word shingles per doc: (id, shingle) long table.
    * Narrow (explode) — no shuffle until someone aggregates it. The
    * shingling itself is the [[graft.functions.WordShingles]] native
    * expression (one eval per doc; composed higher-order functions
    * were measured 12× slower under JIT profile pollution).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol).as("doc"),
      explode(graft.functions.WordShingles.column(col(textCol), k)).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs.
    *
    * Candidate generation = self-join on shared shingle (docs sharing
    * zero shingles can't have J > 0), then J = |∩| / (|A|+|B|−|∩|)
    * from exact integer counts. This is the *exact baseline*; its
    * cost grows with the shared-shingle pair count, which is why
    * [[minHashLsh]] exists as the scale path. Frequent-shingle skew
    * is the risk at 100 TB — AQE skew-join handles moderate skew, and
    * a stop-shingle cap (drop shingles appearing in >0.1% of docs)
    * is the standard mitigation, applied here via `maxShingleFreq`.
    */
  def ngramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5,
      maxShingleFreq: Option[Long] = None): DataFrame =
    sharedShingleCounts(df, idCol, textCol, k, maxShingleFreq)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")

  /** Directional shingle containment: c(A⊆B) = |sh(A)∩sh(B)| / |sh(A)|.
    * Catches the asymmetric near-dups Jaccard misses — a short doc
    * quoted wholesale inside a much longer one scores J ≈ |A|/|B| (≈0)
    * but containment ≈ 1. Same candidate generation as [[ngramJaccard]]
    * (docs sharing zero shingles score 0), same stop-shingle cap; only
    * the final arithmetic differs. Emits both directions per unordered
    * pair (da < db): `c_ab` = how much of A lies in B, `c_ba` the
    * reverse; kept when either clears the threshold.
    *
    * WEAK BY DESIGN at 100 TB: this is the exact baseline riding the
    * quadratic shared-shingle self-join — [[containmentLsh]] is the
    * scale path (banded MinHash candidates + signature-derived
    * containment estimate + exact verification of survivors), gated
    * against this ground truth by the `dedup_containment_gate` driver
    * query.
    */
  def shingleContainment(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.6,
      maxShingleFreq: Option[Long] = None): DataFrame =
    sharedShingleCounts(df, idCol, textCol, k, maxShingleFreq)
      .withColumn("c_ab", round(col("i").cast("double") / col("na"), 4))
      .withColumn("c_ba", round(col("i").cast("double") / col("nb"), 4))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .select("da", "db", "c_ab", "c_ba")

  /** Shared-shingle pair counts feeding [[ngramJaccard]] and
    * [[shingleContainment]]: for every doc pair (da < db) sharing ≥1
    * distinct k-shingle, the intersection size `i` and per-doc shingle
    * counts `na`/`nb`. One shingle-keyed self-join + one (da, db) agg.
    */
  private def sharedShingleCounts(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxShingleFreq: Option[Long]): DataFrame = {
    val sh = shingles(df, idCol, textCol, k)
    val shCapped = maxShingleFreq match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy("shingle").count().filter(col("count") > cap)
          .select("shingle")
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
    // sizes from the CAPPED set: scores must be computed over one
    // shingle universe — intersections come from shCapped, so sizes
    // from the uncapped sh would inflate the denominator and
    // systematically underestimate every score
    val sizes = shCapped.groupBy("doc").agg(count(lit(1)).as("n"))
    val a = shCapped.select(col("doc").as("da"), col("shingle"))
    val b = shCapped.select(col("doc").as("db"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc").as("db"), col("n").as("nb")), Seq("db"))
  }

  /** MinHash + banded LSH near-dup pairs, verified.
    *
    * The scale path: signature = NUM_PERM permutation-mins over
    * xxhash64'd shingles (one grouped agg), candidates = pairs
    * sharing any of `bands` band-hashes (self-join on tiny band keys,
    * NOT on raw shingles), then candidates are *verified* with exact
    * Jaccard so the output equals [[ngramJaccard]]'s (same oracle)
    * while the pair space explored is orders of magnitude smaller.
    * With b=32, r=4: P(detect | J=0.7) ≈ 0.9998, →1 rapidly above.
    *
    * minhash_i(doc) = min over shingles of (a_i·h + b_i mod p):
    * computed as ONE typed aggregation with a long[numPerm] buffer
    * ([[graft.functions.MinHashAggregator]]) — single shuffle by doc,
    * map-side partial mins. The equivalent 128-column min() aggregate
    * produced codegen so large its compile time dominated the query.
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5,
      numPerm: Int = 128, bands: Int = 32): DataFrame = {
    val (sh, bandRows) = minHashIndex(df, idCol, textCol, k, numPerm, bands)
    pairsFromIndex(sh, bandRows, threshold)
  }

  /** Verified pairs from a prebuilt index — the all-pairs step shared
    * by [[minHashLsh]] and [[DedupCluster]]. Callers that materialize
    * the result (checkpoint/write) should `unpersist` the index
    * shingles afterwards: the persist exists to serve the signature +
    * verification branches of ONE pass, not to live beyond it.
    */
  def pairsFromIndex(
      indexShingles: DataFrame, indexBands: DataFrame,
      threshold: Double): DataFrame = {
    val l = indexBands.select(col("doc").as("da"), col("band"), col("bkey"))
    val r = indexBands.select(col("doc").as("db"), col("band"), col("bkey"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    verifyJaccard(candidates, indexShingles, threshold)
  }

  /** Verified near-dup pairs BETWEEN two corpora (ids must be
    * disjoint): banded MinHash candidates restricted to left×right —
    * each side builds its own index under the same seeded hash
    * family, so the band join never generates a within-side pair —
    * then exact Jaccard verification. The cross twin of
    * [[minHashLsh]]: same recall behavior per pair, strictly less
    * candidate work (no left×left / right×right bands survive the
    * join). This is the scale shape for train/holdout leakage
    * detection ([[Sampling.splitLeakageGuard]]) and cross-shard
    * dedup: at 100 TB the smaller side's band rows are the only
    * thing the bigger side's index is probed with.
    */
  def crossJaccardPairs(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5,
      numPerm: Int = 128, bands: Int = 32): DataFrame = {
    val (shL, bandL) = minHashIndex(left, idCol, textCol, k, numPerm, bands)
    val (shR, bandR) = minHashIndex(right, idCol, textCol, k, numPerm, bands)
    val candidates = bandL.select(col("doc").as("da"), col("band"), col("bkey"))
      .join(bandR.select(col("doc").as("db"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select("da", "db").distinct()
    verifyJaccard(candidates, shL.unionByName(shR), threshold,
      ordered = false)
  }

  /** The MinHash index: hashed shingle rows (doc, shingle, h) and LSH
    * band rows (doc, band, bkey). At corpus scale BOTH are analysis-
    * store tables written once (ideally bucketed by their join keys —
    * [[graft.sources.AnalysisStore.writeBucketed]]) and maintained
    * incrementally; [[minHashLshDelta]] probes them with only a
    * delta's docs.
    */
  def minHashIndex(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 128, bands: Int = 32): (DataFrame, DataFrame) = {
    val (sh, _, bandRows) = minHashIndexFull(df, idCol, textCol, k, numPerm, bands)
    (sh, bandRows)
  }

  /** [[minHashIndex]] plus the raw signature table (doc,
    * sig=array<long>[numPerm]) — the extra output [[containmentLsh]]
    * estimates Jaccard (and from it containment) from, without
    * touching shingle rows until exact verification.
    */
  def minHashIndexFull(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 128,
      bands: Int = 32): (DataFrame, DataFrame, DataFrame) = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    // 2^31-1 (Mersenne): with h,a,b < 2^31 the product a*h+b stays
    // under 2^62 — no Long overflow under ANSI mode. 31-bit signature
    // values are plenty: candidate pairs are exact-verified afterwards.
    val prime = 2147483647L
    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(numPerm)(
      (rnd.nextInt((prime - 1).toInt).toLong + 1L,
        rnd.nextInt(prime.toInt).toLong))

    // shingle rows feed the signature AND the exact verification (3
    // plan branches) — persist so the tokenize+explode+distinct work
    // runs once, spilling to disk if the corpus outgrows memory.
    val sh = shingles(df, idCol, textCol, k)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(prime)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mh = org.apache.spark.sql.functions.udaf(
      graft.functions.MinHashAggregator.minhash(
        coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, prime),
      org.apache.spark.sql.Encoders.scalaLong)
    val sig = sh.groupBy(col("doc")).agg(mh(col("h")).as("sig"))

    // ALL bands in one projection (explode of (band, bkey) structs):
    // a per-band select + union would re-run the signature job once
    // per band — measured 30× slower at sf0.1. element_at pulls the
    // same longs the old per-column form fed xxhash64, so band keys
    // (and thus candidates) are bit-identical.
    val bandRows = sig.select(col("doc"), explode(array((0 until bands).map { bi =>
      val cols = (bi * rowsPerBand until (bi + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(bi).as("band"), xxhash64(cols: _*).as("bkey"))
    }: _*)).as("tb"))
      .select(col("doc"), col("tb.band"), col("tb.bkey"))
    (sh, sig, bandRows)
  }

  /** Incremental near-dup detection — the shape dedup actually runs at
    * 100 TB: a delta of new/changed docs probes the persisted index,
    * returning exactly the verified pairs that TOUCH the delta
    * (new×old and new×new; old×old pairs were reported when their
    * docs arrived). Cost tracks |delta| × bucket hit rate, never
    * |corpus|²: the delta's band rows broadcast-join the full band
    * table, and verification shingles are semi-joined down to docs in
    * candidate pairs.
    *
    * @param indexShingles (doc, shingle, …) of the FULL corpus
    *                      (delta included — the index is maintained
    *                      first, probed second)
    * @param indexBands    (doc, band, bkey) of the full corpus
    * @param deltaIds      one-column frame of the delta's doc ids
    */
  def minHashLshDelta(
      indexShingles: DataFrame, indexBands: DataFrame,
      deltaIds: DataFrame, threshold: Double): DataFrame =
    verifyJaccard(deltaCandidates(indexBands, deltaIds), indexShingles,
      threshold)

  /** Incremental approximate containment — [[containmentLsh]]'s delta
    * twin, the same probe shape as [[minHashLshDelta]]: the delta's
    * band rows probe the persisted index, candidates touching the
    * delta are exact-containment-verified. Build the index with
    * [[minHashIndexFull]] at [[containmentLsh]]'s finer banding
    * (64 × 2) so the delta probe inherits the containment path's
    * recall envelope. Cost tracks |delta| × bucket hit rate.
    */
  def containmentLshDelta(
      indexShingles: DataFrame, indexBands: DataFrame,
      deltaIds: DataFrame, threshold: Double): DataFrame =
    verifyContainment(deltaCandidates(indexBands, deltaIds), indexShingles,
      threshold)

  /** The delta probe's candidate join, exposed for plan auditing: when
    * `indexBands` is a store table bucketed on (band, bkey)
    * ([[graft.sources.AnalysisStore.writeBucketed]]), this join plans
    * with NO shuffle of the index — the delta semi-join broadcasts
    * (preserving the scan's bucket distribution) and the band
    * self-join reads matching buckets directly; the only exchange
    * left carries the candidate PAIRS (delta-sized), which is the
    * whole 100 TB story for incremental dedup.
    */
  def deltaCandidates(indexBands: DataFrame, deltaIds: DataFrame): DataFrame = {
    val delta = deltaIds.toDF("doc")
    val deltaBands = indexBands.join(broadcast(delta), Seq("doc"), "left_semi")
    val l = deltaBands.select(col("doc").as("da"), col("band"), col("bkey"))
    val r = indexBands.select(col("doc").as("db"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("da") =!= col("db"))
      // normalize (a,b) ordering so new×old pairs found in either
      // direction, and new×new pairs found twice, dedup to one row
      .select(least(col("da"), col("db")).as("da"),
        greatest(col("da"), col("db")).as("db"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs — shared by the
    * LSH paths. Shingle rows are first semi-joined down to docs that
    * appear in any candidate, so verification cost tracks the
    * candidate count, not the corpus.
    */
  private def verifyJaccard(
      candidates: DataFrame, sh: DataFrame, threshold: Double,
      ordered: Boolean = true): DataFrame =
    verifiedPairCounts(candidates, sh, ordered)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")

  /** Exact-containment verification of candidate pairs — the
    * containment twin of [[verifyJaccard]], same candidate-restricted
    * cost shape. Output schema matches [[shingleContainment]].
    */
  private def verifyContainment(
      candidates: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    verifiedPairCounts(candidates, sh)
      .withColumn("c_ab", round(col("i").cast("double") / col("na"), 4))
      .withColumn("c_ba", round(col("i").cast("double") / col("nb"), 4))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .select("da", "db", "c_ab", "c_ba")

  /** Exact intersection/size counts (da, db, i, na, nb) for candidate
    * pairs only — shingle rows are first semi-joined down to docs that
    * appear in any candidate, so cost tracks the candidate count, not
    * the corpus.
    */
  /** `ordered = true` (the self-join dedup paths) assumes candidate
    * pairs satisfy da < db and halves the shared-shingle join early
    * on that; `ordered = false` (cross-corpus pairs, where the
    * orientation carries meaning — da is always the left-side doc)
    * keeps both orders and lets the candidate semi-join pick the
    * given one.
    */
  private def verifiedPairCounts(
      candidates: DataFrame, sh: DataFrame,
      ordered: Boolean = true): DataFrame = {
    // materialize the candidate pipeline (band self-join + distinct)
    // ONCE: it feeds three plan branches below (docsInPlay → sizes,
    // docsInPlay → inter's semi-join, the pair semi-join itself), and
    // without truncation each branch re-executes the whole subtree —
    // measured 2.2× wall / 3.4× CPU on the sf0.1 flagship dedup path
    val cands = candidates.localCheckpoint(true)
    val docsInPlay = cands.select(col("da").as("doc"))
      .union(cands.select(col("db").as("doc"))).distinct()
    val shC = sh.join(broadcast(docsInPlay), Seq("doc"), "left_semi")
    // sizes from the candidate-restricted rows: shC keeps EVERY
    // shingle of each in-play doc, so counts are identical to the
    // full-table aggregate — but the delta path's cost now tracks the
    // candidate set instead of group-counting the whole corpus index
    val sizes = shC.groupBy("doc").agg(count(lit(1)).as("n"))
    val inter = shC.select(col("doc").as("da"), col("shingle"))
      .join(shC.select(col("doc").as("db"), col("shingle")), Seq("shingle"))
      .filter(if (ordered) col("da") < col("db") else col("da") =!= col("db"))
      .join(broadcast(cands), Seq("da", "db"), "left_semi")
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc").as("db"), col("n").as("nb")), Seq("db"))
  }

  /** Approximate directional containment — the scale path for
    * [[shingleContainment]] (which rides the quadratic shared-shingle
    * self-join and cannot survive 100 TB).
    *
    * Three stages, none corpus-quadratic:
    *  1. CANDIDATES from banded MinHash ([[minHashIndexFull]]) — the
    *     same tiny band-key self-join as [[minHashLsh]]. Asymmetric
    *     pairs have LOWER Jaccard than symmetric near-dups (c_ab = 0.6
    *     with |B| ≫ |A| drives J toward 0), so the default banding is
    *     FINER than the Jaccard path's: 64 bands × 2 rows ⇒
    *     P(candidate | J) = 1−(1−J²)^64 ≈ 0.93 at J = 0.2, →1 above
    *     J ≈ 0.3. Pairs below that Jaccard floor need |B|/|A| ≳ 4 to
    *     clear a 0.6 containment threshold — the documented recall
    *     envelope, measured by the `dedup_containment_gate` driver
    *     query against the exact baseline.
    *  2. ESTIMATE ĉ from signatures + exact per-doc shingle counts:
    *     Ĵ = (matching signature components)/numPerm, and since
    *     i = J·(na+nb)/(1+J) exactly, ĉ(A⊆B) = Ĵ·(na+nb)/((1+Ĵ)·na).
    *     Candidate pairs with max(ĉ_ab, ĉ_ba) < threshold − margin are
    *     dropped BEFORE any shingle row is touched — the pair-sized
    *     signature join is the whole cost (the per-pair zip_with is
    *     interpreted, but it runs on candidates, not the corpus).
    *  3. VERIFY survivors exactly ([[verifyContainment]], shingles
    *     semi-joined to candidate docs) — emitted scores are exact, so
    *     output rows equal [[shingleContainment]]'s wherever stage-1/2
    *     recall holds.
    */
  def containmentLsh(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.6,
      numPerm: Int = 128, bands: Int = 64,
      margin: Double = 0.2): DataFrame = {
    val (sh, sig, bandRows) =
      minHashIndexFull(df, idCol, textCol, k, numPerm, bands)
    val l = bandRows.select(col("doc").as("da"), col("band"), col("bkey"))
    val r = bandRows.select(col("doc").as("db"), col("band"), col("bkey"))
    val rawCands = l.join(r, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val withSig = rawCands
      .join(sig.select(col("doc").as("da"), col("sig").as("sa")), Seq("da"))
      .join(sig.select(col("doc").as("db"), col("sig").as("sb")), Seq("db"))
      .join(sizes.select(col("doc").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc").as("db"), col("n").as("nb")), Seq("db"))
    val jHat = aggregate(
      zip_with(col("sa"), col("sb"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(numPerm)
    val cEst = (den: Column) =>
      jHat * (col("na") + col("nb")) / ((lit(1.0) + jHat) * den)
    val cands = withSig
      .filter(greatest(cEst(col("na")), cEst(col("nb")))
        >= lit(threshold - margin))
      .select("da", "db")
    verifyContainment(cands, sh, threshold)
  }

  /** Span-level (C4-style) dedup: docs are cut into consecutive
    * `span`-word pieces, each piece is kept only at its globally first
    * occurrence (ordered by doc id, then position), and docs are
    * reassembled from their surviving pieces. This removes repeated
    * boilerplate (headers, navigation, license blocks) INSIDE
    * otherwise-unique documents — the gap whole-doc dedup can't touch.
    *
    * Plan shape at scale: one narrow slice+explode, then first
    * occurrences via groupBy(span).agg(min(doc,pos)) — map-side
    * partial aggregation absorbs hot boilerplate spans BEFORE the
    * exchange, which is why this is an aggregate+join-back rather
    * than a row_number window (a window partitioned by span has an
    * irreducible skew partition for every hot span; the join back can
    * be AQE-skew-split, the window sort cannot). Reassembly is one
    * more uniform shuffle by doc id.
    */
  def spanDedup(
      df: DataFrame, idCol: String, textCol: String,
      span: Int = 10): DataFrame = {
    val exploded = spanRows(df, idCol, textCol, span)
    val firsts = exploded.groupBy("span")
      .agg(min(struct(col("doc_id"), col("pos"))).as("__first"))
    reassemble(exploded.join(firsts, Seq("span"))
      .withColumn("__kept",
        struct(col("doc_id"), col("pos")) === col("__first")))
  }

  /** (doc_id, pos, span) piece rows — [[TextAnalysis.chunk]] with
    * stride == chunkSize (one shared implementation of the window
    * slicing, so an off-by-one fix there cannot diverge here). Feeds
    * two plan branches in [[spanDedup]] (first-occurrence agg + the
    * probe side of the join back); both re-run this narrow subtree,
    * which is cheap — persisting it was measured at <3% wall at sf0.1
    * and would cost corpus-scale cache at 100 TB.
    */
  private def spanRows(
      df: DataFrame, idCol: String, textCol: String, span: Int): DataFrame =
    graft.operators.TextAnalysis.chunk(df, idCol, textCol,
        chunkSize = span, stride = span)
      .select(col("doc_id"), col("chunk_id").as("pos"),
        col("chunk_text").as("span"))

  /** Rebuild (doc_id, n_spans, n_kept, dedup_text) from flagged span
    * rows — one uniform shuffle by doc id.
    */
  private def reassemble(flagged: DataFrame): DataFrame =
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("pos"), col("span"))))),
          s => s.getField("span")), " ").as("dedup_text"))

  /** The span first-occurrence index: (span, first=(doc_id, pos)) —
    * at corpus scale an analysis-store table, ideally bucketed on
    * `span` ([[graft.sources.AnalysisStore.writeBucketed]]) so delta
    * probes join it bucket-locally without a full-index exchange.
    */
  def spanFirstIndex(
      df: DataFrame, idCol: String, textCol: String,
      span: Int = 10): DataFrame =
    spanRows(df, idCol, textCol, span).groupBy("span")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))

  /** Incremental span dedup — the shape this op runs at 100 TB: a
    * delta of NEW docs (ids above every indexed doc, the bookmark
    * contract [[Incremental.changedSince]] already enforces) probes
    * the persisted first-occurrence index. A delta piece survives iff
    * its span is absent from the index (never seen by any older doc)
    * AND it is the delta's own first occurrence. Because delta ids
    * are greater than every indexed id, previously-shipped docs are
    * never re-cut — the outputs of earlier runs stay valid, and the
    * updated index is the old one plus the delta's new spans.
    *
    * Cost tracks |delta|: the delta's span rows shuffle by span into
    * the (bucketed) index's layout; nothing corpus-sized moves.
    */
  def spanDedupDelta(
      indexFirsts: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, span: Int = 10): DataFrame = {
    val dExp = spanRows(delta, idCol, textCol, span)
    val dFirsts = dExp.groupBy("span")
      .agg(min(struct(col("doc_id"), col("pos"))).as("__dfirst"))
    reassemble(dExp
      .join(indexFirsts.select(col("span"), lit(1).as("__seen")),
        Seq("span"), "left")
      .join(dFirsts, Seq("span"))
      .withColumn("__kept", col("__seen").isNull &&
        struct(col("doc_id"), col("pos")) === col("__dfirst")))
  }

  /** Maximal duplicated-substring spans — the ExactSubstr flavor of
    * training-data dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"), at token-window granularity: a
    * k-token window is duplicated iff it occurs more than once in the
    * corpus (within- OR cross-document — both are verbatim repetition
    * a trainer would memorize). Emits, per doc, the maximal merged
    * UNION-OF-COVERAGE ranges [span_start, span_end] (0-based token
    * positions, inclusive) of all duplicated windows — every token in
    * a reported range is covered by at least one duplicated window,
    * but two abutting duplicated regions merge into one range even
    * when the windows straddling their boundary are unique, so a
    * range is NOT itself a verbatim-repeated substring. That is the
    * right contract for a removal pass (cut every token that verbatim
    * repetition covers); [[spanDedup]] is the companion that actually
    * rewrites text, at coarser fixed-block granularity.
    *
    * Plan shape at scale: windows are a narrow slide-explode, hashed
    * to TWO 60-bit ints (the md5 halves) IMMEDIATELY so the
    * duplicate-detection shuffle carries (doc, pos, int64×2) — not
    * window text (k× the corpus in bytes). 120 hash bits matter here:
    * a count>1 predicate turns every hash collision into a false
    * duplicate, and at ~10^13 windows a single 60-bit key would
    * fabricate ~10^7 of them (n²/2^61) while 120 bits keeps the
    * expected count below 10⁻¹⁰ ([[TextAnalysis.tokenHash60b]]).
    * Repeated-hash detection is a groupBy(hash) aggregate +
    * join back (map-side combine absorbs hot boilerplate windows
    * before the exchange; a count window partitioned by hash would
    * put every occurrence of a hot window in one partition — the same
    * skew argument as [[spanDedup]]). The window subtree is
    * deliberately COMPUTED TWICE (once into the count agg, once as
    * the probe side the small duplicated-hash set broadcast-joins):
    * window rows are k× the corpus — far too big to materialize for
    * reuse — so two narrow passes with one tiny broadcast is the
    * cheaper plan at every scale that matters. Interval merge is a
    * per-doc window over only the SURVIVING duplicated windows —
    * doc-granular keys, uniform. A true suffix array finds character-exact ranges
    * without the k× window blowup but needs corpus-order global
    * indexing; hashed fixed-k windows are the standard distributed
    * approximation (k bounds the finest detectable duplicate).
    */
  def duplicatedSubstringSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val wins = windowHashRows(df, idCol, textCol, k)
    val repeated = wins.groupBy("__hv", "__hv2").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select("__hv", "__hv2")
    mergeIslands(wins.join(repeated, Seq("__hv", "__hv2")), k)
  }

  /** (doc_id, pos, __hv, __hv2) rows: every k-token slide-window,
    * hashed to a pair of 60-bit ints (120 bits — see
    * [[duplicatedSubstringSpans]] for why one half is not enough
    * here) the moment it exists — downstream shuffles carry int64s,
    * never window text.
    */
  private def windowHashRows(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // one monolithic pass (tokenize, build each window's bytes once,
    // hash once) — the chunk(stride=1) + two-md5-walks formulation
    // built every window string through an interpreted transform()
    // lambda; values are bit-identical (WindowHashes scaladoc)
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.WindowHashes.column(col(textCol), k)).as("__w"))
      .select(col("doc_id"), col("__w.pos").as("pos"),
        col("__w.hv").as("__hv"), col("__w.hv2").as("__hv2"))

  /** Merge surviving duplicated windows into maximal per-doc token
    * ranges. Windows cover [pos, pos+k-1]; the next one extends the
    * current range iff its start is within (or adjacent to) the
    * range, i.e. pos <= prev_pos + k; island id = running count of
    * range breaks. Per-doc window over duplicated windows only —
    * doc-granular keys, uniform.
    */
  private def mergeIslands(dupWins: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    dupWins
      .withColumn("__new",
        coalesce((col("pos") > lag(col("pos"), 1).over(byDoc) + k)
          .cast("int"), lit(1)))
      .withColumn("__grp", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "__grp")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("span_end"),
        count(lit(1)).cast("long").as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("n_tokens"),
        col("n_windows"))
  }

  /** The substring-dedup serving index: (hv, hv2, n) occurrence
    * counts of every k-token window's 120-bit hash pair — at corpus
    * scale an analysis-store table bucketed on `hv` so delta probes
    * join it bucket-locally (the same pattern as [[spanFirstIndex]]
    * and the ANN indexes; `hv` alone spreads buckets fine, `hv2`
    * rides along to keep the count>1 predicate collision-proof).
    */
  def substringWindowIndex(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame =
    windowHashRows(df, idCol, textCol, k)
      .groupBy(col("__hv").as("hv"), col("__hv2").as("hv2"))
      .agg(count(lit(1)).as("n"))

  /** Fold a delta's window counts into the persisted index — counts
    * add exactly, so merge ≡ rebuild (spec-pinned). One delta-sized
    * shuffle into the index layout.
    */
  def mergeSubstringWindowIndex(
      index: DataFrame, delta: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame =
    index.unionByName(substringWindowIndex(delta, idCol, textCol, k))
      .groupBy("hv", "hv2").agg(sum(col("n")).as("n"))

  /** Incremental [[duplicatedSubstringSpans]]: report spans for DELTA
    * docs only, against corpus = index ∪ delta. A delta window is
    * duplicated iff its global occurrence count (indexed + in-delta)
    * exceeds 1 — exactly the full run's predicate, so the result
    * equals the full rerun restricted to the delta (spec-pinned).
    * Old docs' shipped span reports are frozen by contract (new
    * duplicates don't retroactively grow them — the same
    * append-only posture as [[spanDedupDelta]]); a periodic full
    * rebuild picks up old-doc spans newly duplicated by later data.
    *
    * Cost tracks |delta|: delta windows probe the (bucketed) index;
    * nothing corpus-sized moves.
    */
  def duplicatedSubstringSpansDelta(
      index: DataFrame, delta: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val wins = windowHashRows(delta, idCol, textCol, k)
    val repeated = wins.groupBy("__hv", "__hv2").agg(count(lit(1)).as("__dn"))
      .join(index.select(col("hv").as("__hv"), col("hv2").as("__hv2"),
          col("n").as("__in")),
        Seq("__hv", "__hv2"), "left")
      .filter(coalesce(col("__in"), lit(0L)) + col("__dn") > 1)
      .select("__hv", "__hv2")
    mergeIslands(wins.join(repeated, Seq("__hv", "__hv2")), k)
  }

  /** Benchmark decontamination: per corpus doc, the fraction of its
    * k-word shingles that appear anywhere in the eval/benchmark set —
    * the train/test-overlap check a training-data pipeline runs before
    * shipping a corpus (flag, then drop or ablate, docs that leak
    * benchmark content).
    *
    * Scale shape: the eval side is benchmark-sized (thousands of docs,
    * not the corpus), so its distinct shingle set BROADCASTS; the
    * corpus side is one narrow shingle explode + a single hash
    * aggregation by doc. Nothing corpus-sized shuffles except the
    * (doc, count) rows. Docs with zero shingles (shorter than k words)
    * cannot carry a k-gram leak and are not emitted.
    */
  def contamination(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val c = shingles(corpus, idCol, textCol, k)
    val e = shingles(eval, idCol, textCol, k)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    c.join(broadcast(e), Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("hit"), lit(0))).as("h"))
      .select(col("doc").as(idCol),
        round(col("h").cast("double") / col("n"), 4).as("overlap_ratio"))
      .withColumn("is_contaminated", col("overlap_ratio") >= threshold)
  }

  /** Benchmark decontamination, Bloom-filter scale path: same
    * per-doc leaked-shingle ratio as [[contamination]], but the eval
    * side ships as a BLOOM FILTER instead of its exact distinct
    * shingle set. [[contamination]]'s broadcast set is fine while the
    * benchmark suite is thousands of docs; a full eval-suite library
    * (hundreds of benchmarks, tens of millions of shingles) broadcasts
    * GiB as an exact set vs ~1.2·log2(1/fpp) BITS per shingle as a
    * Bloom filter (~12 MiB at 10M shingles / 1% fpp) — that is the
    * artifact you pin alongside a 100 TB run and re-use every tick.
    * At that scale the session's runtime-Bloom caps must be raised
    * first (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`,
    * default 4M, and `.maxNumBits`, default 64M ≈ what 10M shingles
    * need at 1% fpp): Spark clamps to them silently, so this builder
    * VALIDATES the requested size against the session conf and
    * refuses to build a clamped (fpp-violating) filter.
    *
    * Mechanics: eval shingles hash to 64-bit (xxhash64), a distributed
    * [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
    * builds the filter (optimal bit count for the measured shingle
    * cardinality at `fpp`), and the corpus probes it with the codegen'd
    * `BloomFilterMightContain` — the exact expression pair Spark's own
    * runtime-filter injection uses, so build/probe hashing agree by
    * construction. Union-of-benchmarks composes: Bloom bitsets OR.
    *
    * Guarantee: NO false negatives (every leaked shingle is counted),
    * so the flagged set is a SUPERSET of [[contamination]]'s and
    * per-doc `overlap_ratio` is ≥ the exact ratio; false positives
    * inflate ratios by ~fpp. Approximation → the driver query is
    * rows-only; `contamination_bloom_gate` pins superset-ness and the
    * FP excess bound against the exact path.
    */
  def contaminationBloom(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

    val evalHashes = shingles(eval, idCol, textCol, k)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    // benchmark-sized count; optimal m = -n·ln(fpp)/ln²2 bits
    val n = math.max(evalHashes.count(), 1L)
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // Spark's BloomFilterAggregate SILENTLY clamps both arguments to
    // the runtime-filter session caps (defaults: 4M items / 64M bits).
    // A clamped build still has no false negatives, but the realized
    // FP rate exceeds the requested fpp — which would quietly void the
    // 2×fpp bound contamination_bloom_gate pins. Fail loudly and name
    // the conf to raise instead of letting the clamp degrade the gate.
    val conf = corpus.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(n <= maxItems && numBits <= maxBits,
      s"eval set needs $n items / $numBits bits but the session caps are " +
      s"$maxItems / $maxBits; raise spark.sql.optimizer.runtime.bloomFilter" +
      s".maxNumItems/.maxNumBits (or accept a larger fpp) — proceeding " +
      "would silently clamp the filter and void the fpp guarantee")
    val bloomBytes = evalHashes
      .agg(GraftSqlBridge.column(new BloomFilterAggregate(
          GraftSqlBridge.expression(col("h")),
          Literal(n), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")

    val mightContain = GraftSqlBridge.column(new BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      GraftSqlBridge.expression(xxhash64(col("shingle")))))
    shingles(corpus, idCol, textCol, k)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n"),
        sum(mightContain.cast("int")).as("h"))
      .select(col("doc").as(idCol),
        round(col("h").cast("double") / col("n"), 4).as("overlap_ratio"))
      .withColumn("is_contaminated", col("overlap_ratio") >= threshold)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Pigeonhole-exact blocking: the 60-bit simhash splits into
    * (maxHamming+1) disjoint bands; two hashes within Hamming d must
    * agree on ≥1 band, so joining per-band finds every qualifying
    * pair — no recall loss, unlike probabilistic LSH. Join keys are
    * 15-bit ints: tiny shuffle.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = TextAnalysis.SimhashBits / nBands
    val hashes = TextAnalysis.simhash(df, idCol, textCol)
    // one pass over the simhash agg (explode, not select-per-band ∪)
    val banded = hashes.select(col(idCol).as("doc"), col("simhash"),
      explode(array((0 until nBands).map { bi =>
        struct(lit(bi).as("band"),
          shiftright(col("simhash"), bi * bandBits)
            .bitwiseAND((1L << bandBits) - 1).as("bkey"))
      }: _*)).as("tb"))
      .select(col("doc"), col("simhash"), col("tb.band"), col("tb.bkey"))
    val l = banded.select(col("doc").as("da"), col("simhash").as("ha"),
      col("band"), col("bkey"))
    val r = banded.select(col("doc").as("db"), col("simhash").as("hb"),
      col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs — exact all-pairs above the
    * diagonal. Quadratic by design (the EXACT BASELINE, weak at
    * 100 TB); [[embeddingCosinePairsLsh]] is the bucketed scale path,
    * gated against this ground truth by the `dedup_semantic_gate`
    * driver query.
    *
    * Plan shape: BroadcastNestedLoopJoin with the cosine predicate
    * fully codegen'd (the [[VectorFunctions.dot]] native expression —
    * interpreted higher-order fns here were the #1 bench hotspot).
    * The streamed side is repartitioned so the O(n²) predicate work
    * spreads across all cores instead of one-task-per-input-file.
    */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = VectorFunctions.toDouble(col(vecCol))
    // norms once per ROW, not per pair: the O(n²) inner loop then
    // walks each vector pair once (cosinePre), not three times
    val base = df.select(col(idCol), v.as("v"))
      .withColumn("n2", VectorFunctions.normSq(col("v")))
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val a = base.select(col(idCol).as("va"), col("v").as("xa"), col("n2").as("na"))
      .repartition(parallelism)
    val b = base.select(col(idCol).as("vb"), col("v").as("xb"), col("n2").as("nb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos",
        round(VectorFunctions.cosinePre(col("xa"), col("xb"),
          col("na"), col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("va", "vb", "cos")
  }

  /** Approximate embedding-cosine near-dup pairs — the scale path for
    * [[embeddingCosinePairs]]: candidates from multi-table sign-LSH
    * buckets ([[Similarity.lshAssign]] — the same persisted index the
    * ANN serving path probes), exact cosine verification restricted to
    * candidate pairs. Survivor scores are exact, so output rows equal
    * the exact baseline's wherever candidate recall holds (measured by
    * the `dedup_semantic_gate` driver query).
    *
    * Plan shape: the corpus computes its bucket ids in one codegen'd
    * narrow pass; candidates come from the (tbl, bucket) self-join —
    * the only superlinear term, bounded per bucket — and verification
    * is two id-keyed hash joins over candidate pairs (never an
    * all-pairs NLJ). Recall tuning is the standard sign-LSH curve,
    * P(candidate) = 1 − (1 − p^b)^L with p = 1 − θ/π: at a production
    * dedup threshold (cos ≥ 0.9, p ≈ 0.86) the defaults prune buckets
    * ~256× with recall ≥ 0.995; the fixture gate runs at the far
    * harder cos ≥ 0.4 (p ≈ 0.63, near-random 64-dim corpus). A corpus
    * whose near-dup threshold genuinely sits that low gains little
    * from any LSH — the gate, not the scaladoc, is what says so per
    * corpus.
    *
    * bitsPerTable/tables default to 0 = AUTO: [[signLshPlan]] sizes
    * both from the corpus count and the threshold. Frozen geometry is
    * the one way this path goes quadratic (measured 142× wall on a
    * 10× corpus with the old fixed 4×32 before the plan existed);
    * auto keeps growth at the LSH-theoretic n^(1+ρ),
    * ρ = ln(1/p₁)/ln 2 — ≈0.22 (near-linear) at cos ≥ 0.9, ≈0.66 at
    * the adversarial 0.4. For the truly linear semantic-dedup path at
    * ANY threshold, [[semDeDup]] is the semantics built for it.
    */
  def embeddingCosinePairsLsh(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerTable: Int = 0, tables: Int = 0,
      dim: Int = 64): DataFrame = {
    val (b, t) =
      if (bitsPerTable > 0 && tables > 0) (bitsPerTable, tables)
      else signLshPlan(df.select(idCol).count(), threshold)
    val index = graft.operators.Similarity.lshAssign(
      df, idCol, vecCol, b, t, dim)
    val l = index.select(col("nid").as("va"), col("tbl"), col("bucket"))
    val r = index.select(col("nid").as("vb"), col("tbl"), col("bucket"))
    // the same pair surfaces from several tables — distinct BEFORE the
    // vector joins so verification pays each pair once
    val cands = l.join(r, Seq("tbl", "bucket"))
      .filter(col("va") < col("vb"))
      .select("va", "vb").distinct()
      .localCheckpoint(true)
    val base = df.select(col(idCol).as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("n2", VectorFunctions.normSq(col("v")))
    cands
      .join(base.select(col("id").as("va"), col("v").as("xa"),
        col("n2").as("na")), Seq("va"))
      .join(base.select(col("id").as("vb"), col("v").as("xb"),
        col("n2").as("nb")), Seq("vb"))
      .withColumn("cos",
        round(VectorFunctions.cosinePre(col("xa"), col("xb"),
          col("na"), col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("va", "vb", "cos")
  }

  /** Sign-LSH geometry for a corpus of `n` vectors at a cosine
    * `threshold`: bits sized so buckets hold ~`targetBucket` vectors
    * (random-pair collisions per table then stay ≈ n·targetBucket/2,
    * linear in n), tables sized from the single-table hit rate
    * p₁ = (1 − θ/π)^bits so candidate recall for true pairs AT the
    * threshold is ≥ `recall` (pairs above it survive more). This is
    * the standard (b, L) curve solved for the corpus instead of
    * frozen at tuning scale; growth is n^(1+ρ) with
    * ρ = ln(1/p₁-per-bit)/ln 2 — the LSH exponent no parameter
    * choice beats. At the sf0.01 fixture (n = 2000, threshold 0.4)
    * this reproduces 4 bits and ~30 tables — the hand-tuned 4×32
    * geometry, derived.
    */
  def signLshPlan(n: Long, threshold: Double,
      targetBucket: Long = 125, recall: Double = 0.99,
      minBits: Int = 4, maxBits: Int = 20,
      maxTables: Int = 1024): (Int, Int) = {
    val bits = math.min(maxBits, math.max(minBits,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt))
    val pBit = 1.0 - math.acos(math.min(1.0, math.max(-1.0, threshold))) / math.Pi
    val p1 = math.pow(pBit, bits)
    val tables = math.min(maxTables, math.max(1,
      math.ceil(math.log(1.0 / (1.0 - recall)) / p1).toInt))
    (bits, tables)
  }

  /** Expected fraction of RANDOM (orthogonal) pairs that survive a
    * sign-LSH plan as candidates: 1 − (1 − 2^−bits)^tables — the
    * degeneracy diagnostic for [[embeddingCosinePairsLsh]]. Near 0,
    * LSH prunes (cos ≥ 0.9 plans sit ≈ 0.001); near 1, ~every pair
    * is a candidate and the "approximate" path costs MORE than
    * [[embeddingCosinePairs]]' exact join (measured at the fixture's
    * adversarial threshold 0.4: p₁/p_rand = 0.63/0.5 per bit is too
    * thin a gap for ANY (bits, tables) to hold recall 0.99 without
    * keeping ≥ half of all pairs — sf1 wall 440s vs semDeDup's 3.2s).
    * A pipeline whose threshold puts this fraction high should run
    * [[semDeDup]] — cluster-scoped semantics, linear at every
    * threshold — not a bigger LSH.
    */
  def signLshDegeneracy(bits: Int, tables: Int): Double =
    1.0 - math.pow(1.0 - math.pow(0.5, bits), tables)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — cluster-scoped
    * semantic dedup, the third posture in the embedding-dedup family:
    * [[embeddingCosinePairs]] is the exact global quadratic,
    * [[embeddingCosinePairsLsh]] recovers (almost) the same pair set
    * from sign-LSH buckets, and SemDeDup CHANGES THE SEMANTICS to buy
    * scale — near-dups are only sought inside k-means clusters, which
    * is what makes it tractable on billion-doc corpora (the paper
    * dedups LAION/C4 this way).
    *
    * Per cluster: all member pairs with cosine ≥ `threshold` are
    * duplicate edges; a member is dropped when ANY edge connects it
    * to a higher-priority member, where priority = FARTHER from the
    * cluster centroid first (the paper's keep-low-centroid-similarity
    * choice — retains the cluster's atypical examples), ties by
    * smaller id. Drops follow edges to higher-priority members
    * whether or not those survive themselves (the paper's one-pass
    * rule) — so any surviving pair within a cluster is guaranteed
    * below `threshold` (`dedup_semdedup_gate` asserts exactly this).
    *
    * Output: one row per input doc — (idCol, cluster, centroid_sim,
    * is_duplicate).
    *
    * Plan shape: the k-means model is driver-sized
    * ([[Similarity.trainCentroids]]); assignment is one narrow
    * codegen'd pass ([[Similarity.ivfAssign]], checkpointed — three
    * consumers); the pair join hash-exchanges by cluster id, so the
    * quadratic term is bounded per cell and AQE skew-splits hot
    * cells; the drop set and the final join are pair- and
    * corpus-keyed hash joins. At 100 TB, scale `nClusters` with the
    * corpus (the paper runs ~10⁴-member clusters) so per-cell work
    * stays constant.
    */
  def semDeDup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nClusters: Int = 0, iters: Int = 5): DataFrame = {
    // nClusters = 0 → cells scale with the corpus (Similarity
    // .autoCells): fixed-count cells make the in-cell pair join
    // quadratic (measured 18× wall on a 10× corpus); constant-
    // population cells are the paper's own billion-doc recipe
    val nc =
      if (nClusters > 0) nClusters
      else graft.operators.Similarity.autoCells(df.select(idCol).count())
    val centroids = graft.operators.Similarity.trainCentroids(
      df, idCol, vecCol, nc, iters)
    semDeDupAssigned(
      graft.operators.Similarity.ivfAssign(df, idCol, vecCol, centroids),
      centroids, idCol, threshold)
  }

  /** [[semDeDup]] over a PREBUILT (nid, cv, cid) IVF index — the
    * persisted-assignment path (the ANN serving index doubles as the
    * SemDeDup clustering, one corpus pass for both).
    */
  def semDeDupAssigned(
      index: DataFrame, centroids: Array[Array[Double]],
      idCol: String, threshold: Double): DataFrame = {
    val dots = graft.functions.CentroidDots.column(col("cv"), centroids)
    val assigned = index
      .withColumn("cdot", round(element_at(dots, col("cid") + 1), 4))
      .localCheckpoint(true)
    val a = assigned.select(col("cid"), col("nid").as("va"),
      col("cv").as("xa"), col("cdot").as("da"))
    val b = assigned.select(col("cid"), col("nid").as("vb"),
      col("cv").as("xb"), col("cdot").as("db"))
    val edges = a.join(b, Seq("cid")).filter(col("va") < col("vb"))
      .withColumn("cos", round(VectorFunctions.dot(col("xa"), col("xb")), 4))
      .filter(col("cos") >= threshold)
    // priority: farther-from-centroid wins; cdot tie → smaller id
    // (va < vb always, so the tie drops vb)
    val dropped = edges.select(
        when(col("da") <= col("db"), col("vb"))
          .otherwise(col("va")).as("nid"))
      .distinct()
      .withColumn("is_duplicate", lit(true))
    assigned.join(dropped, Seq("nid"), "left")
      .select(col("nid").as(idCol), col("cid").as("cluster"),
        col("cdot").as("centroid_sim"),
        coalesce(col("is_duplicate"), lit(false)).as("is_duplicate"))
  }
}
