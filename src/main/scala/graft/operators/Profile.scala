package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the validation pass a pipeline runs on every new
  * corpus drop before anything downstream trusts it: per-column row /
  * null / distinct counts and min/max, as one long-format table
  * (column, n_rows, n_nulls, n_distinct, min_value, max_value).
  *
  * Plan shape: ONE aggregation computes every column's stats in a
  * single pass over the scan, then the wide result row is exploded
  * into long format driver-free. Exact multi-column countDistinct
  * plans via Expand — an O(columns) row multiplier feeding a
  * distinct-key shuffle, the documented cost of exactness; at 100 TB
  * profile with `approxDistinct = true` (HLL sketches — no Expand, no
  * corpus-keyed shuffle, partial sketches merge in a single-partition
  * exchange) and keep the exact form for gate-sized checks.
  *
  * min/max compare as strings (cast once, per the oracle's CAST) so
  * one schema covers every column type; numeric-order min/max of a
  * specific column is a one-liner the caller can do directly.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(columns.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }: _*)
    wide.select(explode(entries).as("__p")).select("__p.*")
  }
}
