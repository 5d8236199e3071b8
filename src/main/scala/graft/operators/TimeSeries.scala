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

  /** Rolling z-score anomaly flags over each key's daily series — the
    * monitoring primitive next to [[resampleDailyFF]]: a day is
    * anomalous when its total deviates from the key's own trailing
    * baseline by more than `k` standard deviations. The baseline is
    * the `n` PRECEDING observed days (`ROWS BETWEEN n PRECEDING AND 1
    * PRECEDING`) — excluding the current point, so an outlier never
    * pollutes its own yardstick, and warm-up days (fewer than `n`
    * prior observations) never flag.
    *
    * Exactness: the z-test is decided in INTEGER algebra. With S and
    * SS the window's sum and sum of squares over cents,
    * |x − S/n| > k·σ rearranges (multiplying through by n²(n−1), all
    * positive) to
    *   (n−1)·(n·x − S)² > k²·n·(n·SS − S²)
    * — no sqrt, no division, every term BIGINT, so the flag is
    * bit-deterministic cross-engine (the events_anomaly oracle
    * replays the same inequality). Overflow envelope: per-key daily
    * cents |x| ≤ ~10^6 with n ≤ 30 keeps every term under 2^63;
    * per-USER grouping keeps magnitudes in that envelope at any
    * corpus scale (growth adds keys, not cents — the same argument
    * as the IVM cents-integerization).
    *
    * Scale shape: one map-side daily reduction, then one running
    * window per key over that key's observed days — the exchange is
    * on uniform key ids and each partition is span-bounded, the
    * resample family's contract.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, n: Int = 7, k: Int = 3): DataFrame = {
    require(n >= 2, "baseline needs at least two points")
    val daily = df.select(col(keyCol).as("__k"),
        to_date(col(tsCol)).as("__d"),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .groupBy(col("__k"), col("__d")).agg(sum(col("__c")).as("cents"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__d"))
      .rowsBetween(-n, -1)
    val nn = lit(n.toLong)
    val stat = daily.select(col("__k"), col("__d"), col("cents"),
      count(col("cents")).over(w).as("__n"),
      sum(col("cents")).over(w).as("__s"),
      sum(col("cents") * col("cents")).over(w).as("__ss"))
    val dev = nn * col("cents") - col("__s")
    val flag = when(col("__n") < n, lit(0))
      .when((nn - 1L) * dev * dev >
        lit(k.toLong * k) * nn * (nn * col("__ss") - col("__s") * col("__s")),
        lit(1))
      .otherwise(lit(0))
    stat.select(col("__k").as(keyCol),
      date_format(col("__d"), "yyyy-MM-dd").as("day"),
      col("cents"), flag.as("is_anomaly"))
  }
}
