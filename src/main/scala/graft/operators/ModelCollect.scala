package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** The ONE sanctioned way to materialize a model-sized frame on the
  * driver (centroids, codebooks, vocabularies, per-bucket prefix
  * totals, quota tables). Every such site carries an informal
  * "model-sized by construction" argument; this helper makes the
  * argument ENFORCED: the collect reads at most `maxRows + 1` rows
  * (a `limit`, so a violating plan never ships a corpus to the
  * driver — the failure costs one truncated fetch, not an OOM) and
  * fails loudly when the bound is exceeded, naming the site.
  *
  * Callers pass the TIGHTEST bound their construction guarantees
  * (e.g. `nBuckets`, `quotas.size * 256`, a vocab cap) — a generous
  * default would turn the guard back into a comment.
  */
object ModelCollect {

  /** Hard cap for model artifacts with no tighter structural bound
    * (persisted vocab/merge tables): 2^20 rows ≈ tens of MB of
    * strings — far above any real tokenizer model, far below driver
    * heap.
    */
  val MaxModelRows: Int = 1 << 20

  def bounded(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    require(maxRows > 0, s"$what: maxRows must be positive, got $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: driver-side model collect exceeded its $maxRows-row bound" +
        " — the frame is corpus-sized, not model-sized; fix the grain of" +
        " the aggregation (or raise the bound deliberately)")
    rows
  }
}
