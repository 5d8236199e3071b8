package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key event
  * series onto a fixed daily grid and forward-fill the gaps (LOCF —
  * last observation carried forward), the preprocessing step feature
  * pipelines and BI layers both assume ("one row per entity per day,
  * no holes").
  *
  * Three exact stages, each at its natural grain:
  *  1. bucket: observations reduce to one row per (key, day) —
  *     map-side, BEFORE any exchange (daily max: deterministic under
  *     duplicate timestamps, and the right reading for "the day's
  *     value" when the raw feed is noisy);
  *  2. grid: each key's own [first, last] day span explodes through
  *     `sequence()` — keys × span-days rows, the OUTPUT size, so
  *     nothing larger than the answer is ever materialized (no
  *     global calendar cross join — a key active one week costs 7
  *     rows, not the corpus's full span);
  *  3. fill: one `last(ignoreNulls)` running window per key — the
  *     LOCF's irreducible exchange+sort, partitioned on uniform key
  *     ids.
  *
  * Gap rows carry `value` = NULL (observability: a filled cell is
  * distinguishable from an observed one) next to the filled
  * `value_ff`; days render ISO. The leading row of every key is an
  * observation by construction (the grid starts at the key's first
  * event), so `value_ff` is never NULL.
  */
object TimeSeries {

  def resampleDailyFF(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = df.select(col(keyCol).as("__k"),
        to_date(col(tsCol)).as("__d"), col(valueCol).as("__raw"))
      .groupBy(col("__k"), col("__d")).agg(max(col("__raw")).as("__v"))
    val grid = obs.groupBy(col("__k"))
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(col("__k"), explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as("__d"))
    grid.join(obs, Seq("__k", "__d"), "left")
      .select(col("__k").as(keyCol),
        date_format(col("__d"), "yyyy-MM-dd").as("day"),
        col("__v").as("value"),
        last(col("__v"), ignoreNulls = true).over(Window
          .partitionBy(col("__k")).orderBy(col("__d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value_ff"))
  }
}
