package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted mergeable distinct-count sketch state — the incremental
  * rollup pattern behind "daily uniques → monthly uniques without
  * rescanning": a fine-grain state table of Datasketches HLL sketches
  * (Spark's native `hll_sketch_agg` family) is maintained per
  * ingestion delta, and every coarser-grain distinct count is a
  * sketch UNION over state rows — never a rescan of raw data.
  *
  * This is the sketch-state twin of the exact incremental family
  * ([[Incremental.merge]] for rows, [[Dedup.mergeSubstringWindowIndex]]
  * for counts): COUNT(DISTINCT) does not decompose over unions, so
  * the exact q3-style aggregate ([[graft.queries.RefQueries]] A2) must
  * re-shuffle every contributing row each time a rollup is asked —
  * at 100 TB that is the difference between a group-grain state table
  * (KiB per group: one 2^lgK-register HLL) and a corpus-wide exchange
  * per question.
  *
  * Why merge ≡ rebuild holds EXACTLY here (spec-pinned, gate-pinned):
  * an HLL register array is a per-register MAX over the hashed
  * stream, and max is associative/commutative — union of partial
  * sketches has bit-identical registers to the directly-built sketch
  * (in sparse mode, coupon-set union, same argument). Estimates in
  * [[estimateRollup]] are always taken AFTER a `hll_union_agg` pass,
  * so both the rebuilt and the incrementally-merged state estimate
  * from identical registers through the same composite estimator —
  * equal values, not just equal-within-error. (Estimating a direct
  * sketch WITHOUT the union pass may differ by ulps: direct sketches
  * carry a HIP accumulator the union path drops; routing every read
  * through [[estimateRollup]] sidesteps that asymmetry.)
  *
  * Scale shape: [[distinctSketches]] is one uniform groupBy exchange
  * with map-side partial sketch merge (registers fold before the
  * shuffle — hot groups cost one sketch per mapper, not one row per
  * event); [[mergeSketches]] and [[estimateRollup]] move only
  * state-table rows (O(groups × 2^lgK bytes)). Nothing raw ever
  * re-shuffles after first ingest.
  */
object SketchState {

  /** Join on `keys` with NULL-SAFE equality (`<=>`). groupBy — like
    * the Window.partitionBy shapes these agg+join-back rewrites
    * replaced — treats a NULL key as a real group, but a plain
    * `join(_, keys)` uses null-unsafe equality and silently DROPS
    * every NULL-keyed group from the output (heavy-hitter/theta/
    * sample state for that group would just vanish). `<=>` is still
    * an equi-join key for Spark (EqualNullSafe participates in
    * ExtractEquiJoinKeys), so hash joins and AQE's broadcast
    * conversion apply as usual. Right-side keys are internally
    * renamed and the output keeps ONE copy per key: under null-safe
    * matching a matched row's two key values are provably
    * interchangeable (both equal or both null), so
    * `coalesce(left, right)` is exact for every join type including
    * full_outer's one-sided rows. Non-key output columns are
    * left-then-right; callers keep them disjoint.
    */
  private[graft] def joinNullSafe(left: DataFrame, right: DataFrame,
      keys: Seq[String], joinType: String = "inner",
      broadcastRight: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "joinNullSafe needs at least one key")
    val renamed = keys.foldLeft(right)((d, k) =>
      d.withColumnRenamed(k, s"__r_$k"))
    val r = if (broadcastRight) broadcast(renamed) else renamed
    val cond = keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    val joined = left.join(r, cond, joinType)
    val outCols =
      keys.map(k => coalesce(col(k), col(s"__r_$k")).as(k)) ++
        left.columns.filterNot(keys.contains).map(col) ++
        right.columns.filterNot(keys.contains).map(col)
    joined.select(outCols: _*)
  }

  /** Build (or rebuild) the fine-grain sketch state: one row per
    * distinct `groupCols` tuple carrying the HLL sketch of
    * `valueCol` plus an exact contributing-row count (`n_rows` —
    * exact bookkeeping rides along for free and audits the sketch).
    *
    * `lgK` = 12 ⇒ 4 KiB registers, relative standard error
    * 1.04/√2¹² ≈ 1.6%; low-cardinality groups stay in sparse mode
    * (exact). The state table is what [[graft.sources.AnalysisStore]]
    * persists; each ingestion delta builds its own partial state with
    * this same function and folds in via [[mergeSketches]].
    */
  def distinctSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Fold a delta's partial state into the persisted state: sketch
    * union + exact count addition per group. Merge ≡ rebuild
    * (register argument above), so ingestion order never changes any
    * downstream estimate. One state-table-sized shuffle.
    */
  def mergeSketches(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    prior.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"),
        sum(col("n_rows")).as("n_rows"))

  /** Answer a coarser-grain distinct count from state alone:
    * group to `rollupCols`, union the sketches, estimate. The raw
    * data is never touched — this is the whole point of the state
    * table. Output: (rollupCols…, approx_distinct, n_rows).
    */
  def estimateRollup(state: DataFrame, rollupCols: Seq[String]): DataFrame =
    state.groupBy(rollupCols.map(col): _*)
      .agg(hll_sketch_estimate(
          hll_union_agg(col("sketch"), lit(false))).as("approx_distinct"),
        sum(col("n_rows")).as("n_rows"))

  // ------------------------------------------------------------------
  // Count-Min frequency-sketch state (Cormode–Muthukrishnan 2005)
  // ------------------------------------------------------------------

  /** 60-bit hash pair for double hashing (Kirsch–Mitzenmacher): two
    * disjoint 15-hex-char windows of md5, each `('0x'||hex)::BIGINT`-
    * replayable in the DuckDB oracle — the same cross-engine recipe
    * the minhash/simhash oracles established. Row i probes bucket
    * (h1 + i·h2) mod width; h1,h2 < 2^60 and i ≤ depth-1 keeps the sum
    * overflow-free in BOTH engines (DuckDB errors on BIGINT overflow,
    * so wrap semantics must never be relied on).
    */
  private def md5Window(c: Column, from: Int): Column =
    conv(substring(md5(c.cast("string").cast("binary")), from, 15), 16, 10)
      .cast("long")

  /** Build the Count-Min frequency-sketch state table: one row per
    * occupied (groupCols…, cm_row, cm_bucket) cell carrying its count.
    * Point-lookup guarantee after [[estimateFreq]]: estimate ≥ true
    * count always (every occurrence increments all `depth` cells), and
    * estimate ≤ true + e·N/width with probability ≥ 1 − e^-depth per
    * key (N = total items in the rolled-up grain).
    *
    * Why a RELATIONAL sparse representation rather than an opaque
    * array blob: cells are plain (int, int, long) rows, so merge is
    * `groupBy.sum` (counts are additive — merge ≡ rebuild EXACTLY,
    * not within-error), rollups to coarser grains are the same sum,
    * the state stays oracle-replayable row-for-row, and unoccupied
    * cells cost nothing. Scale shape: one uniform groupBy exchange of
    * ≤ depth·width rows per group with map-side partial counts —
    * "how often does token X occur" at 100 TB without a
    * corpus-cardinality token exchange ([[MisraGriesAggregator]] finds
    * WHICH keys are heavy; this answers point queries about ANY key
    * from O(depth·width) state).
    */
  def freqSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val rows = df
      .select((groupCols.map(col) :+
        md5Window(col(valueCol), 1).as("__h1") :+
        md5Window(col(valueCol), 16).as("__h2")): _*)
      .withColumn("cm_row", explode(sequence(lit(0), lit(depth - 1))))
    rows
      .withColumn("cm_bucket",
        ((col("__h1") + col("cm_row") * col("__h2")) % width).cast("int"))
      .groupBy((groupCols.map(col) :+ col("cm_row") :+ col("cm_bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a delta's partial CMS state into the persisted state — cell
    * counts are additive, so this is an exact merge (ingestion order
    * can never change any estimate). One state-table-sized shuffle.
    */
  def mergeFreqSketches(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    prior.unionByName(delta)
      .groupBy((groupCols.map(col) :+ col("cm_row") :+ col("cm_bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes` (a key column) from state
    * alone, rolled up across ALL state groups (pre-filter the state to
    * estimate within one grain): estimate = min over sketch rows of
    * the key's cell count, an unoccupied cell reading as 0. The raw
    * data is never touched; the rolled-up cell table is model-sized
    * (≤ depth·width rows) and BROADCASTS to the probe side.
    */
  def estimateFreq(
      state: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = state
      .groupBy(col("cm_row"), col("cm_bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    probes
      .select(col(keyCol),
        md5Window(col(keyCol), 1).as("__h1"),
        md5Window(col(keyCol), 16).as("__h2"))
      .withColumn("cm_row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cm_bucket",
        ((col("__h1") + col("cm_row") * col("__h2")) % width).cast("int"))
      .join(broadcast(cells), Seq("cm_row", "cm_bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------
  // Mergeable Misra–Gries heavy-hitter state (Agarwal, Cormode,
  // Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012)
  // ------------------------------------------------------------------

  /** Build the heavy-hitter summary state: per `groupCols` tuple, at
    * most k rows (item, est) forming a VALID Misra–Gries(k) summary —
    * est ≤ true count ≤ est + n_group/(k+1) for EVERY item of the
    * group, including the dropped ones (whose est reads as 0).
    *
    * Construction is the ORDER-INDEPENDENT batch form (not the
    * streaming counter walk, whose output depends on arrival order
    * and so could never be oracle-replayed): exact per-item counts,
    * subtract the (k+1)-th largest count t from everything, keep the
    * positive survivors (plus the rank-1 row at est = 0 when the whole
    * group ties — see [[compress]]; it carries `n_rows` so merge
    * totals never lose a group's mass). Validity: every dropped item has cnt ≤ t, so
    * its error is ≤ t; every kept item's error is exactly t; and the
    * top k+1 items each count ≥ t, so n ≥ (k+1)·t ⇒ t ≤ n/(k+1).
    * Ties at the boundary break by item ascending — fully
    * deterministic, pure integer arithmetic, DuckDB-replayable
    * row-for-row (the reason this joins the relational sketch tier
    * next to CMS/quantile state).
    *
    * `n_rows` (the group's exact item total) rides along per row: the
    * merge bound needs Σn, and exact bookkeeping audits the sketch —
    * same discipline as the HLL state table.
    *
    * Scale shape: one uniform groupBy exchange for the exact counts
    * (map-side combined), a rank-pruned top-(k+1) pass over the
    * aggregated (group, item) rows ([[compress]]), and the group
    * totals as a re-aggregation OF THE COUNTS FRAME (Σcnt ≡ the raw
    * row total; the shuffle stage is shared via exchange reuse)
    * joined back by broadcast — not a sum window partitioned by group, whose
    * window task would hold the group's ENTIRE distinct-item set
    * (window partitions are not AQE-splittable; the tfidf/bm25 df
    * hazard). State is ≤ k rows/group.
    */
  def heavyHitterSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val grain = groupCols.map(col)
    val counts = df
      .groupBy((grain :+
        col(valueCol).cast("string").as("item")): _*)
      .agg(count(lit(1)).as("cnt"))
    // the group's exact item total (the bound column and the audit
    // column in one) — derived FROM counts (Σcnt per group ≡ the raw
    // row total), never a second full aggregation over the raw input:
    // the totals re-aggregation shares counts' shuffle stage through
    // exchange reuse. The broadcast hint is the tier contract made
    // executable: sketch state is ≤ k rows/GROUP, so the tier only
    // makes sense for broadcast-scale grains — the hint keeps the
    // corpus-sized counts frame from reshuffling by grain, and a
    // grain too big to broadcast fails LOUDLY instead of silently
    // building a corpus-sized "state" table.
    val totals = counts.groupBy(grain: _*).agg(sum(col("cnt")).as("__n"))
    val withN =
      if (groupCols.isEmpty) counts.crossJoin(broadcast(totals))
      else joinNullSafe(counts, totals, groupCols, broadcastRight = true)
    compress(withN, groupCols, k)
  }

  /** Fold a delta's partial summaries into the persisted state — the
    * PODS'12 merge: add counters item-wise, then re-compress with the
    * combined (k+1)-th largest. Each compress subtracts its own t,
    * and the subtractions telescope: merged error stays ≤ Σn/(k+1)
    * over everything folded in (the mergeability theorem) — the gate
    * pins that bound, NOT exact merge ≡ rebuild (unlike CMS/quantile
    * state, an MG summary is lossy; equal-within-bound is the
    * contract). `n_rows` is a per-GROUP total (constant across the
    * group's rows), so totals combine per group — never per item,
    * which would drop the mass of items absent from one side.
    */
  def mergeHeavyHitters(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String],
      k: Int = 16): DataFrame = {
    require(groupCols.nonEmpty,
      "mergeHeavyHitters needs group columns; a global fold is heavyHittersRollup(state, Seq())")
    val grain = groupCols.map(col)
    def totals(s: DataFrame, as: String) =
      s.groupBy(grain: _*).agg(max(col("n_rows")).as(as))
    val nTot = joinNullSafe(totals(prior, "__np"), totals(delta, "__nd"),
        groupCols, "full_outer")
      .select((grain :+ (coalesce(col("__np"), lit(0L)) +
        coalesce(col("__nd"), lit(0L))).as("__n")): _*)
    val summed = joinNullSafe(
      prior.unionByName(delta)
        .groupBy((grain :+ col("item")): _*)
        .agg(sum(col("est")).as("cnt")),
      nTot, groupCols)
    compress(summed, groupCols, k)
  }

  /** Answer "heavy items over [range]" from state alone: re-sum the
    * range's summary rows to the rollup grain and re-compress — one
    * pass over O(windows × k) state rows, the raw stream never
    * replays. Every state column outside (rollupCols, item, est,
    * n_rows) is treated as constituent-summary identity (e.g. the
    * window column), so the range total is the sum of each
    * constituent's group total counted ONCE. Output (rollupCols…,
    * item, est, n_rows) with the telescoped bound
    * est ≤ true ≤ est + n_rows/(k+1).
    */
  def heavyHittersRollup(
      state: DataFrame, rollupCols: Seq[String], k: Int = 16): DataFrame = {
    val grain = rollupCols.map(col)
    val winCols = state.columns.toSeq
      .diff(rollupCols ++ Seq("item", "est", "n_rows"))
    val nTot = state
      .groupBy((rollupCols ++ winCols).map(col): _*)
      .agg(max(col("n_rows")).as("__wn"))
      .groupBy(grain: _*).agg(sum(col("__wn")).as("__n"))
    val summed = state
      .groupBy((grain :+ col("item")): _*)
      .agg(sum(col("est")).as("cnt"))
    // a grain-less rollup ("heavy over the whole range") joins the
    // single total row by broadcast; the global rank in compress then
    // runs single-partition BY DESIGN over O(windows × k) STATE rows,
    // never raw data — same posture as estimateFreq's global cell sum
    val joined =
      if (rollupCols.isEmpty) summed.crossJoin(broadcast(nTot))
      else joinNullSafe(summed, nTot, rollupCols)
    compress(joined, rollupCols, k)
  }

  /** The shared (k+1)-th-largest compress over (groupCols…, item,
    * cnt, __n) rows: rank counts desc (ties by item asc), t = the
    * (k+1)-th value (0 when the group holds ≤ k items), keep rank ≤ k
    * with est = cnt − t > 0; `__n` passes through as `n_rows`.
    *
    * The rank-1 row is kept even at est = 0 (every count tied with
    * the (k+1)-th): est = 0 claims nothing — validity is untouched —
    * but the row carries the group's `n_rows`, without which a fully
    * tied group would VANISH from the state and its mass would
    * silently drop out of every downstream merge/rollup total (the
    * merged bound would then understate n and the "≤ n/(k+1)"
    * guarantee would be fiction). A nonempty group therefore always
    * keeps ≥ 1 state row.
    *
    * The empty-grain global form (rollups over the whole range) is
    * expressed window-free: top-(k+1) by sort-limit
    * (TakeOrderedAndProject — map-side top-k, no empty-spec
    * WindowExec, no single-partition warning), t as a one-row
    * broadcast over it. Rows with cnt > t are EXACTLY the original's
    * rank ≤ k ∧ est > 0 set (any such row outranks every cnt = t row,
    * and at most k rows exceed the (k+1)-th value); the rank-1
    * keep-alive row is the sort-limit(1) head when nothing clears t.
    */
  private def compress(
      counts: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val grain = groupCols.map(col)
    if (groupCols.isEmpty) {
      val top = counts.orderBy(col("cnt").desc, col("item").asc)
        .limit(k + 1).localCheckpoint(true)
      val tF = top.agg(
        when(count(lit(1)) === k + 1, min(col("cnt")))
          .otherwise(lit(0L)).as("__t"))
      val withT = top.crossJoin(broadcast(tF))
      val survivors = withT.filter(col("cnt") > col("__t"))
      val keepAlive = withT
        .orderBy(col("cnt").desc, col("item").asc).limit(1)
        .filter(col("cnt") === col("__t"))
      survivors.unionByName(keepAlive)
        .select(col("item"), (col("cnt") - col("__t")).as("est"),
          col("__n").as("n_rows"))
    } else {
      // grouped: ONE rank window whose `<= k+1` filter plans as
      // WindowGroupLimit (map tasks keep k+1 rows per group before the
      // exchange), checkpointed for its two consumers; t then comes
      // from a grain-sized aggregate broadcast back. The former shape
      // — a max-when window next to the rank — blocked the rank-limit
      // pushdown (multi-function window), so every group's ENTIRE
      // item-count set sorted in one window task.
      val w = Window.partitionBy(grain: _*)
        .orderBy(col("cnt").desc, col("item").asc)
      val top = counts
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k + 1)
        .localCheckpoint(true)
      val tF = top.groupBy(grain: _*).agg(
        when(count(lit(1)) === k + 1, min(col("cnt")))
          .otherwise(lit(0L)).as("__t"))
      joinNullSafe(top, tF, groupCols, broadcastRight = true)
        .filter(col("__rk") <= k &&
          (col("cnt") - col("__t") > 0 || col("__rk") === 1))
        .select((grain :+ col("item") :+
          (col("cnt") - col("__t")).as("est") :+
          col("__n").as("n_rows")): _*)
    }
  }

  // ------------------------------------------------------------------
  // Quantile-sketch state (decimal two-significant-digit histogram)
  // ------------------------------------------------------------------

  /** Log-scale bucket lower bound for a non-negative integral value:
    * 0–9 keep their exact value (singleton buckets); larger values
    * keep their first TWO decimal digits with the rest zeroed
    * (`rpad(substr(str,1,2), digits, '0')`) — so every bucket
    * [m·10^(d-2), (m+1)·10^(d-2)) with m ∈ [10,99] has relative width
    * ≤ 1/10. Pure integer/string arithmetic: no floating log, so the
    * bucket id is bit-identical in Spark and the DuckDB oracle (the
    * reason this variant is used instead of DDSketch's γ-log buckets,
    * whose libm rounding may disagree at bucket boundaries).
    */
  private def decimalBucket(v: Column): Column = {
    val s = v.cast("string")
    when(v < 10, v).otherwise(
      call_function("rpad", substring(s, 1, 2), length(s), lit("0"))
        .cast("long"))
  }

  /** Build the quantile-sketch state table: one row per occupied
    * (groupCols…, q_lb, cnt) bucket of the non-negative integral
    * `valueCol` (nulls are ignored, negatives rejected loudly — a
    * quantile over mixed-sign data needs an explicit offset, not a
    * silent wrong bucket). This is the mergeable-quantile member of
    * the sketch-state family (HLL = distinct, CMS = frequency,
    * Misra–Gries = heavy hitters): counts are additive, so merge and
    * rollup are `groupBy.sum` — EXACTLY merge ≡ rebuild — and any
    * quantile of any rollup grain is answered from O(buckets) state
    * (≤ 10 + 90·decades rows per group) without rescanning raw data,
    * with ≤ 10% relative value error from the bucket width.
    */
  def quantileSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val checked = when(v < 0, raise_error(concat(
        lit(s"quantileSketches: negative $valueCol: "), v.cast("string"))))
      .otherwise(v)
    df.filter(v.isNotNull)
      .groupBy((groupCols.map(col) :+
        decimalBucket(checked).as("q_lb")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a delta's partial quantile state into the persisted state —
    * additive counts, exact merge, one state-table-sized shuffle.
    */
  def mergeQuantileSketches(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    prior.unionByName(delta)
      .groupBy((groupCols.map(col) :+ col("q_lb")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Answer quantiles at a coarser grain from state alone: re-sum to
    * the rollup grain, cumulate buckets in value order, and for each
    * requested q report the lower bound of the bucket holding the
    * ceil(q·n)-th value (the classic inverse-CDF position; estimate ≤
    * true < 1.1 × estimate from the bucket geometry). The windows run
    * over STATE rows (≤ 10 + 90·decades per group) — never raw data.
    * Output: (rollupCols…, n, one `p<q>` column per requested q).
    */
  def quantileRollup(
      state: DataFrame, rollupCols: Seq[String],
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1], got $qs")
    require(qs.map(q => (q * 100).round).distinct.size == qs.size,
      s"quantiles must map to distinct p<q> column names, got $qs")
    val grain = rollupCols.map(col)
    val g = state.groupBy((grain :+ col("q_lb")): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val c = g
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(grain: _*).orderBy(col("q_lb"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(grain: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pCols = qs.map { q =>
      min(when(col("cum") >= ceil(col("n") * q), col("q_lb")))
        .as(s"p${(q * 100).round}")
    }
    c.groupBy(grain: _*)
      .agg(max(col("n")).as("n"), pCols: _*)
  }

  // ------------------------------------------------------------------
  // Bottom-k sample state (KMV / AKMV: Bar-Yossef et al. 2002;
  // Beyer, Haas, Reinwald, Sismanis, Gemulla — "On Synopses for
  // Distinct-Value Estimation Under Multiset Operations", SIGMOD'07)
  // ------------------------------------------------------------------

  /** 2^60 as double — exact (power of two), the KMV hash-space size
    * for normalizing a 60-bit md5 window key into (0,1].
    */
  private val HashSpace = 1.152921504606846976e18

  /** Build the bottom-k sample state: per `groupCols` tuple, the k
    * DISTINCT items with the SMALLEST 60-bit md5 key (ties by item
    * asc), each with its EXACT occurrence count — the AKMV synopsis.
    * This is the sample member of the sketch-state tier (HLL =
    * distinct count, CMS = frequency, Misra–Gries = heavy hitters,
    * decimal buckets = quantiles): a statistically uniform
    * without-replacement sample of the group's distinct items that is
    * deterministic (hash order, no RNG — the reason it is
    * DuckDB-replayable row-for-row and delta-stable), mergeable, and
    * doubles as a distinct-count estimator ([[estimateDistinctKmv]]).
    *
    * Why merge/rollup ≡ rebuild EXACTLY (stronger than Misra–Gries'
    * within-bound): each item's key is a fixed function of the item,
    * so bottom-k of a union of constituent bottom-k's equals bottom-k
    * of the union — any item in the true union bottom-k has key ≤ the
    * union's k-th smallest ≤ every constituent's k-th smallest (a
    * constituent samples FEWER items, so its threshold is no smaller),
    * hence survived in every constituent where it appeared. The same
    * argument makes the summed `cnt` of every surviving item exact
    * (no constituent ever dropped it) — Beyer et al.'s AKMV closure.
    *
    * `n_rows` (the group's exact occurrence total) rides along per
    * row for audit, the [[heavyHitterSketches]] discipline. A group
    * with < k distinct items keeps ALL of them — the sample is then
    * the exact distinct set (exact mode, flagged by
    * [[estimateDistinctKmv]] reading row count < k).
    *
    * Scale shape: one uniform groupBy exchange for the exact
    * per-(group, item) counts (map-side combined); the group totals
    * come from a model-sized aggregate BROADCAST-joined back (never a
    * sum window over the full distinct-item set — that would cluster
    * the whole corpus into |groups| partitions, and for the global
    * build into ONE; the totals re-aggregation shares the counts
    * shuffle stage through AQE exchange reuse); the bottom-k filter
    * itself plans as map-side WindowGroupLimit, so no task ever sorts
    * or moves more than k·partitions rows of one group (see
    * [[sampleCompress]]). State is ≤ k rows/group.
    */
  def sampleSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val counts = df
      .groupBy((groupCols.map(col) :+
        col(valueCol).cast("string").as("item")): _*)
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("__n"))
    val withN =
      if (groupCols.isEmpty) counts.crossJoin(broadcast(totals))
      else joinNullSafe(counts, totals, groupCols, broadcastRight = true)
    sampleCompress(withN.withColumn("hkey", md5Window(col("item"), 1)),
      groupCols, k)
  }

  /** Fold a delta's partial samples into the persisted state: sum
    * counts item-wise (exact for every item that survives — AKMV
    * closure, scaladoc above), combine per-GROUP totals (the
    * [[mergeHeavyHitters]] rule: per-constituent max, never per-item
    * sum), re-take bottom-k. Merge ≡ rebuild exactly; spec-pinned.
    */
  def mergeSampleSketches(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    require(groupCols.nonEmpty,
      "mergeSampleSketches needs group columns; a global fold is sampleRollup(state, Seq())")
    val grain = groupCols.map(col)
    def totals(s: DataFrame, as: String) =
      s.groupBy(grain: _*).agg(max(col("n_rows")).as(as))
    val nTot = joinNullSafe(totals(prior, "__np"), totals(delta, "__nd"),
        groupCols, "full_outer")
      .select((grain :+ (coalesce(col("__np"), lit(0L)) +
        coalesce(col("__nd"), lit(0L))).as("__n")): _*)
    val summed = joinNullSafe(
      prior.unionByName(delta)
        .groupBy((grain :+ col("item")): _*)
        .agg(sum(col("cnt")).as("cnt"), min(col("hkey")).as("hkey")),
      nTot, groupCols)
    sampleCompress(summed, groupCols, k)
  }

  /** Re-grain the sample state: bottom-k over the union of the
    * range's constituent samples — exactly the bottom-k sample of the
    * underlying union (merge argument above), with exact survivor
    * counts. Columns outside (rollupCols, item, hkey, cnt, n_rows)
    * are constituent-summary identity (e.g. the window column), so
    * each constituent's group total counts ONCE toward the range
    * total ([[heavyHittersRollup]]'s rule). A grain-less rollup's
    * global top-k window runs single-partition BY DESIGN over
    * O(windows × k) STATE rows, never raw data.
    */
  def sampleRollup(
      state: DataFrame, rollupCols: Seq[String], k: Int = 64): DataFrame = {
    val grain = rollupCols.map(col)
    val winCols = state.columns.toSeq
      .diff(rollupCols ++ Seq("item", "hkey", "cnt", "n_rows"))
    val nTot = state
      .groupBy((rollupCols ++ winCols).map(col): _*)
      .agg(max(col("n_rows")).as("__wn"))
      .groupBy(grain: _*).agg(sum(col("__wn")).as("__n"))
    val summed = state
      .groupBy((grain :+ col("item")): _*)
      .agg(sum(col("cnt")).as("cnt"), min(col("hkey")).as("hkey"))
    val joined =
      if (rollupCols.isEmpty) summed.crossJoin(broadcast(nTot))
      else joinNullSafe(summed, nTot, rollupCols)
    sampleCompress(joined, rollupCols, k)
  }

  /** Distinct-count estimate per rollup grain from sample state
    * alone: with < k sample rows the sample IS the distinct set
    * (exact); otherwise the KMV unbiased estimator (k−1)/U₍k₎ with
    * U₍k₎ = k-th smallest key normalized into (0,1] — relative
    * standard error ≈ 1/√(k−2) (Beyer et al. §4). The arithmetic is
    * one exact double multiply (k−1 times a power of two) and one
    * IEEE division of values both engines derive from the same
    * BIGINT, so the estimate is bit-reproducible cross-engine —
    * unlike HLL's engine-specific composite estimator, THIS
    * approximate distinct count hash-oracles directly.
    * Output: (rollupCols…, est_distinct, n_sample, n_rows).
    */
  def estimateDistinctKmv(
      state: DataFrame, rollupCols: Seq[String], k: Int = 64): DataFrame = {
    val rolled = sampleRollup(state, rollupCols, k)
    val grain = rollupCols.map(col)
    rolled
      .groupBy(grain: _*)
      .agg(count(lit(1)).as("n_sample"),
        max(col("hkey")).as("__uk"),
        max(col("n_rows")).as("n_rows"))
      .withColumn("est_distinct",
        when(col("n_sample") < k, col("n_sample").cast("double"))
          .otherwise(lit((k - 1) * HashSpace) /
            greatest(col("__uk"), lit(1L)).cast("double")))
      .select((grain :+ col("est_distinct") :+ col("n_sample") :+
        col("n_rows")): _*)
  }

  /** Pairwise set-overlap estimates between groups, from sample state
    * ALONE — the multiset-operations payoff AKMV was designed for
    * (Beyer et al. SIGMOD'07 §5): for every unordered group pair, the
    * combined bottom-k L of the two samples is a valid KMV synopsis
    * of the UNION (merge argument on [[sampleSketches]]), and the
    * fraction ρ of L's items present in BOTH samples is an unbiased
    * Jaccard estimator (each of L's items is a uniform draw from the
    * union, and membership flags are exact — a sampled item missing
    * from a sample is provably absent from that set). Outputs per
    * pair: `jaccard_est` = ρ, `union_est` (KMV estimate over L, exact
    * below k), `inter_est` = ρ·union — "how much do two corpora
    * overlap" answered at 4-significant-digit determinism without
    * ever rescanning (or even retaining) the raw corpora.
    *
    * Error: ρ has binomial deviation ≤ 1/(2√k'); the union estimate
    * adds its own 1/√(k−2) RSE — gate-pinned.
    *
    * Scale shape: pairs × 2k state rows — intended for corpus-level
    * grains (langs, sources, snapshot versions) where the group count
    * is model-sized; the pair frame broadcasts. Raw data never moves.
    *
    * CONTRACT: `k` must be ≤ the k the state was BUILT with
    * ([[sampleSketches]]'s k). A larger k silently voids the
    * exact-membership argument (an item absent from a truncated
    * sample is no longer provably absent from the set → biased
    * Jaccard/union). The state does not carry its build k, so pass it
    * via `buildK` to get a loud guard; left at the default the
    * contract is documentation-only.
    */
  def jaccardFromSamples(
      state: DataFrame, groupCol: String, k: Int,
      buildK: Int = Int.MaxValue): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(k <= buildK,
      s"jaccardFromSamples: k=$k exceeds the state's build k=$buildK — " +
        "estimates over a coarser state than requested would be biased")
    val groups = state.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("ga"))
      .crossJoin(groups.select(col(groupCol).as("gb")))
      .filter(col("ga") < col("gb"))
    val cand = state.join(broadcast(pairs),
        col(groupCol) === col("ga") || col(groupCol) === col("gb"))
      .groupBy(col("ga"), col("gb"), col("item"), col("hkey"))
      .agg(max(when(col(groupCol) === col("ga"), 1).otherwise(0)).as("ina"),
        max(when(col(groupCol) === col("gb"), 1).otherwise(0)).as("inb"))
    val w = Window.partitionBy(col("ga"), col("gb"))
      .orderBy(col("hkey").asc, col("item").asc)
    val l = cand.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
    l.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("__kk"),
        sum(col("ina") * col("inb")).cast("long").as("__both"),
        max(col("hkey")).as("__uk"))
      .withColumn("__j", col("__both").cast("double") / col("__kk").cast("double"))
      .withColumn("__u",
        when(col("__kk") < k, col("__kk").cast("double"))
          .otherwise(lit((k - 1) * HashSpace) /
            greatest(col("__uk"), lit(1L)).cast("double")))
      .select(col("ga"), col("gb"),
        round(col("__j"), 4).as("jaccard_est"),
        round(col("__u"), 4).as("union_est"),
        round(col("__j") * col("__u"), 4).as("inter_est"))
  }

  /** Equi-join OUTPUT-SIZE estimate from two GLOBAL sample states
    * alone (Beyer et al. SIGMOD'07 §5's aggregate-over-union
    * estimator applied to g(v) = cA(v)·cB(v)) — the query-planning
    * payoff of the AKMV family: "how many rows would A ⋈ B on this
    * key produce" (equivalently, how hard a self-join explodes)
    * answered BEFORE running the join, from two ≤ k-row state tables,
    * never touching the raw sides. The combined bottom-k L of the two
    * samples is a KMV synopsis of the key-space UNION; each of L's
    * items is a uniform draw from it, membership flags and ride-along
    * multiplicities are EXACT (AKMV closure), so
    * D̂_union × mean over L of (v ∈ A∩B ? cA(v)·cB(v) : 0) is the
    * unbiased join-size estimator. Exact fall-through: fewer than k
    * combined rows means both samples were complete and the output is
    * the exact Σ cA·cB.
    *
    * Determinism: exact long products, one double multiply + divide
    * of identically-derived values — the estimate itself
    * hash-oracles, like [[estimateDistinctKmv]]. The union frame is
    * ≤ 2k rows and its bottom-k is a sort-limit
    * (TakeOrderedAndProject). Error scales with the product distribution's
    * spread (heavy key skew needs larger k) — envelope pinned
    * empirically in kmv_joinsize_gate.
    *
    * CONTRACT: `k` must be ≤ BOTH states' build k (same argument as
    * [[jaccardFromSamples]] — membership/count exactness over the
    * combined bottom-k needs both samples un-truncated at rank k).
    * Pass `buildK` = min of the two build k's for a loud guard.
    */
  def estimateJoinSize(a: DataFrame, b: DataFrame, k: Int,
      buildK: Int = Int.MaxValue): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(k <= buildK,
      s"estimateJoinSize: k=$k exceeds the states' build k=$buildK — " +
        "the exact-membership/exact-count argument no longer holds")
    val av = a.select(col("item"), col("hkey"), col("cnt").as("__ca"))
    val bv = b.select(col("item"), col("hkey"), col("cnt").as("__cb"))
    // null-safe: a NULL raw value is a real sampled item (its hkey is
    // null too) — plain key equality would emit it twice, once per side
    val u = joinNullSafe(av, bv, Seq("item", "hkey"), "full_outer")
    // global bottom-k via sort-limit (TakeOrderedAndProject) — same
    // rows as a rank window + filter, with no empty-spec WindowExec
    // (and so none of Spark's single-partition window warnings)
    u.orderBy(col("hkey").asc, col("item").asc).limit(k)
      .agg(count(lit(1)).as("__kk"), max(col("hkey")).as("__uk"),
        sum(when(col("__ca").isNotNull && col("__cb").isNotNull,
          col("__ca") * col("__cb")).otherwise(lit(0L)))
          .cast("long").as("__g"))
      .select(
        when(col("__kk") < k, col("__g").cast("double"))
          .otherwise(round(
            (lit((k - 1) * HashSpace) /
              greatest(col("__uk"), lit(1L)).cast("double")) *
              (col("__g").cast("double") / col("__kk").cast("double")), 4))
          .as("join_size_est"),
        col("__kk").cast("long").as("n_sample"))
  }

  /** Fixed-threshold sample state — the Theta-sketch SAMPLING mode
    * (Datasketches' θ-sketch with a pinned θ rather than an adaptive
    * one): per group, ALL distinct items whose normalized 60-bit key
    * falls below `theta`, with exact occurrence counts. Expected state
    * size is θ·D per group (D = distinct items); the estimator
    * [[estimateDistinctTheta]] reads |S|/θ.
    *
    * Why this exists NEXT TO [[sampleSketches]]: bottom-k needs a
    * rank window, which Structured Streaming aggregation cannot run —
    * a fixed θ turns the sample into a plain filter + groupBy count,
    * which streams ([[graft.streaming.EventsStreaming
    * .sampleSketchWindows]]) and merges by `groupBy.sum`. The filter
    * runs BEFORE the aggregation exchange, so only the θ-fraction of
    * the stream ever shuffles — at 100 TB that is the difference
    * between sampling the firehose and aggregating it.
    *
    * Bottom-k reads recover from θ-state via [[sampleFromTheta]]:
    * the state holds EVERY item under the threshold, so its k
    * hash-smallest are the TRUE bottom-k whenever ≥ k state rows
    * exist for the grain (the k-th smallest key is then provably
    * < θ·2^60). Counts are exact outright (nothing under the
    * threshold is ever dropped — no compress, stronger than AKMV
    * closure).
    */
  def thetaSketches(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      theta: Double = 0.0625): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta must be in (0,1], got $theta")
    val threshold = (theta * HashSpace).toLong
    df.select((groupCols.map(col) :+
        col(valueCol).cast("string").as("item")): _*)
      .withColumn("hkey", md5Window(col("item"), 1))
      .filter(col("hkey") < threshold)
      .groupBy((groupCols.map(col) :+ col("item") :+ col("hkey")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a delta's θ-state into the persisted state — same fixed
    * threshold on both sides, so the union filtered set is the
    * filtered union and counts add exactly.
    */
  def mergeThetaSketches(
      prior: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    prior.unionByName(delta)
      .groupBy((groupCols.map(col) :+ col("item") :+ col("hkey")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Bottom-k sample per rollup grain from θ-state alone: re-sum the
    * range's rows item-wise, keep the k hash-smallest, and flag
    * validity — `complete` is true iff the grain held ≥ k θ-state
    * rows, which proves the result IS the true bottom-k of the
    * underlying distinct set (scaladoc on [[thetaSketches]]); an
    * incomplete grain returns everything under the threshold (a valid
    * uniform θ-sample, just not a guaranteed bottom-k).
    * Output: (rollupCols…, item, hkey, cnt, complete).
    *
    * Scale shape: the rank window plans as `WindowGroupLimit` (map-side
    * bottom-k prune — scaladoc on [[sampleCompress]]), so ≤ k rows per
    * upstream partition ever move, even for the empty-grain global
    * read. Per-grain availability is a grain-sized
    * `groupBy(grain).count()` broadcast-joined back — NOT a count
    * window, which gets no rank-limit pushdown and would move the
    * grain's ENTIRE θ-state (θ·|distinct items|, 25% of the corpus's
    * distinct set at θ=0.25) into one window task for the global read.
    * Same rework [[sampleSketches]]'s `__n` total received.
    */
  def sampleFromTheta(
      state: DataFrame, rollupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val grain = rollupCols.map(col)
    val summed = state
      .groupBy((grain :+ col("item") :+ col("hkey")): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(true)
    val avail = summed.groupBy(grain: _*)
      .agg(count(lit(1)).as("__avail"))
    val out = (grain :+ col("item") :+ col("hkey") :+ col("cnt") :+
      (col("__avail") >= k).as("complete"))
    if (rollupCols.isEmpty) {
      // global read: sort-limit plans as TakeOrderedAndProject — a
      // map-side top-k merge with NO WindowExec, so no empty-spec
      // window node and no "single partition" warning ever fires
      summed.orderBy(col("hkey").asc, col("item").asc).limit(k)
        .crossJoin(broadcast(avail))
        .select(out: _*)
    } else {
      val w = Window.partitionBy(grain: _*)
        .orderBy(col("hkey").asc, col("item").asc)
      joinNullSafe(summed, avail, rollupCols, broadcastRight = true)
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select(out: _*)
    }
  }

  /** Distinct-count estimate per rollup grain from θ-state: every
    * distinct item is kept iff its fixed key lands under θ, so
    * |kept|/θ estimates D with RSE ≈ √((1−θ)/(θ·D)). Deterministic
    * arithmetic (BIGINT count ÷ exact-double θ) — hash-oracles like
    * [[estimateDistinctKmv]]. Output: (rollupCols…, est_distinct,
    * n_kept).
    */
  def estimateDistinctTheta(
      state: DataFrame, rollupCols: Seq[String], theta: Double): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta must be in (0,1], got $theta")
    val grain = rollupCols.map(col)
    state
      .groupBy((grain :+ col("item")): _*).agg(lit(1).as("__one"))
      .groupBy(grain: _*).agg(count(lit(1)).as("n_kept"))
      .withColumn("est_distinct", col("n_kept").cast("double") / theta)
      .select((grain :+ col("est_distinct") :+ col("n_kept")): _*)
  }

  /** The shared bottom-k compress over (groupCols…, item, hkey, cnt,
    * __n) rows: rank keys ascending (ties by item asc), keep rank ≤ k;
    * `__n` passes through as `n_rows`.
    *
    * Scale shape: the grouped row_number ≤ k filter plans as Spark's
    * `WindowGroupLimit` in Partial + Final form (SPARK-37099
    * rank-limit pushdown — verified in the executed plan), i.e. each
    * MAP task keeps only its local bottom-k per group BEFORE the
    * exchange, so at most k·partitions rows of any group ever move or
    * sort; the empty-grain global build takes the sort-limit branch
    * (`TakeOrderedAndProject` — the identical map-side bottom-k merge
    * with no WindowExec node, hence no single-partition window
    * warning), never the corpus's distinct-item set. A hand-rolled
    * two-phase prune (mapPartitions with a per-group counter) was
    * measured strictly slower: it pays a full
    * DeserializeToObject/SerializeFromObject row conversion and blocks
    * whole-stage codegen for work the codegen'd WindowGroupLimit
    * already does.
    */
  private def sampleCompress(
      counts: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val grain = groupCols.map(col)
    val out = (grain :+ col("item") :+ col("hkey") :+ col("cnt") :+
      col("__n").as("n_rows"))
    if (groupCols.isEmpty)
      // global build: sort-limit = TakeOrderedAndProject, the same
      // map-side bottom-k prune with no WindowExec node — an empty-spec
      // window would log Spark's "single partition" warning on every
      // execution even though WindowGroupLimit bounds its input
      counts.orderBy(col("hkey").asc, col("item").asc).limit(k)
        .select(out: _*)
    else
      counts
        .withColumn("__rk", row_number().over(Window.partitionBy(grain: _*)
          .orderBy(col("hkey").asc, col("item").asc)))
        .filter(col("__rk") <= k)
        .select(out: _*)
  }
}
