package graft.operators

import org.apache.spark.sql.DataFrame
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
}
