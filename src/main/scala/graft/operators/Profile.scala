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
  *
  * `typedMinMax` flips the min/max to NATIVE column order, stringified
  * AFTER the aggregate (`min(c) cast string`, not `min(cast c)`).
  * The default lexicographic form is what the long-format report (and
  * its VARCHAR oracle) promises, but it is NOT a sound numeric bound:
  * over {9, 10} the string min is "10", over 1..100 the string max is
  * "99". Anything feeding those values to the optimizer or to a
  * metadata-only aggregate ([[graft.sources.CatalogStore.analyze]],
  * `metaAgg`) must pass `typedMinMax = true` — an optimizer bound
  * that excludes live values is silently unsound, not just loose.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false,
      typedMinMax: Boolean = false,
      lengths: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      // typed min/max needs an ORDERABLE type (a map column has no
      // native order); unorderable columns record no bounds rather
      // than fail the whole profile — a missing bound is loose, a
      // lexicographic one is unsound
      val orderable = org.apache.spark.sql.catalyst.expressions
        .RowOrdering.isOrderable(df.schema(c).dataType)
      val (mn, mx) =
        if (typedMinMax && orderable)
          (min(col(c)).cast("string"), max(col(c)).cast("string"))
        else if (typedMinMax)
          (lit(null).cast("string"), lit(null).cast("string"))
        else (min(col(c).cast("string")), max(col(c).cast("string")))
      // byte lengths only where they VARY (string/binary); fixed-width
      // types get their size from the type itself downstream
      val varWidth = df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BinaryType => true
        case _ => false
      }
      val (al, ml) =
        if (lengths && varWidth)
          (ceil(avg(length(col(c)))).cast("long"),
            max(length(col(c))).cast("long"))
        else (lit(null).cast("long"), lit(null).cast("long"))
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        mn.as(s"__min_$c"),
        mx.as(s"__max_$c")) ++
        (if (lengths) Seq(al.as(s"__al_$c"), ml.as(s"__ml_$c"))
         else Seq.empty)
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(columns.map { c =>
      val basic = Seq(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
      struct(basic ++ (if (lengths)
        Seq(col(s"__al_$c").as("avg_len"),
          col(s"__ml_$c").as("max_len")) else Seq.empty): _*)
    }: _*)
    wide.select(explode(entries).as("__p")).select("__p.*")
  }
}

/** Equi-depth score calibration — turn a continuous quality score
  * into k population-balanced bins (the decile table a curation
  * threshold is read off of: "keep the top 3 deciles" is an exact
  * row-count contract, where a fixed score cutoff drifts with the
  * corpus).
  *
  * Scale shape: one range exchange of the score projection +
  * driver-side partition offsets (model-sized: one count per shuffle
  * partition) + a narrow per-partition walk — never a global
  * single-partition window. The bin rule is rank arithmetic,
  * bin = ((rank−1)·k) div n + 1, identical in SQL, so bins are
  * engine-exact; rank is boundary-independent (any range split of a
  * total order yields the same global positions).
  */
object Calibrate {

  /** (bin, n_docs, lo, hi) over `scoreCol` — bin = ((rank−1)·k) div n
    * + 1 over the score total order.
    *
    * The bin table is TIE-ORDER independent: bin sizes are fixed by
    * (n, k) alone, and when a bin boundary falls inside a run of
    * equal scores both neighboring bins see that score as their
    * min/max either way — so rows need only be score-sorted (no id
    * tie-break) and the result is engine-exact against a SQL
    * row_number replay under ANY tie order.
    *
    * Plan: ONE range exchange of the slim score projection,
    * checkpointed; partition counts collect (model-sized — one long
    * per shuffle partition) into driver-side rank offsets; a narrow
    * mapPartitions walks each sorted partition with its offset
    * (per-partition imperative logic — the sanctioned mapPartitions
    * case, SURVEY §7.1) and the final bin aggregation shuffles k
    * rows per task. No window anywhere — in particular never the
    * empty-partition-spec global window (`ntile` over the whole
    * frame), which is the WindowExec single-partition anti-pattern.
    */
  def equiDepthBins(df: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // the shuffle-partitions conf can be non-numeric ("auto" under
    // some AQE configs) — fall back to cluster default parallelism
    val parts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism).max(1)
    // materialize the range exchange once: the offset count pass and
    // the bin pass must see the SAME partitions. Null scores (or
    // non-castable values) have no position in the score total order
    // and are excluded before the exchange.
    val ranged = df.select(col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .repartitionByRange(parts, col("__s"))
      .sortWithinPartitions("__s")
      .localCheckpoint(true)
    val counts = ModelCollect.bounded(
        ranged.groupBy(spark_partition_id().as("__pid")).count(),
        parts + 1, "profile partition counts")
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offsets = (0 until parts).scanLeft(0L) {
      case (acc, p) => acc + counts.getOrElse(p, 0L)
    }.toArray // index p = global rank offset of partition p
    val kk = k.toLong
    ranged.as[Double].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rank = offsets(pid)
      it.map { s =>
        rank += 1L
        (((rank - 1L) * kk / n).toInt + 1, s)
      }
    }.toDF("bin", "__s")
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("__s")), 4).as("lo"),
        round(max(col("__s")), 4).as("hi"))
  }
}
