package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the standard product-analytics matrix ("of the
  * users who first appeared in week W, how many came back k weeks
  * later"), as two exact aggregations:
  *
  *  1. cohort assignment: each user's cohort is the period of their
  *     FIRST event (one groupBy over (user, period) pre-reduced
  *     rows);
  *  2. the matrix: distinct active users per (cohort, offset), offset
  *     = periods since the cohort period.
  *
  * Scale shape: the event stream reduces map-side to distinct
  * (user, period) pairs BEFORE any exchange (the per-user × per-period
  * grain is the natural ceiling of the computation — nothing larger
  * ever shuffles); cohorts join back on user id — uniform keys, and
  * the cohort frame is |users| rows. Offsets are integer week/day
  * arithmetic on DATE-truncated timestamps — deterministic,
  * hash-oracle-clean (periods render as ISO strings).
  *
  * `retentionRate` divides by cohort size at 4dp for the
  * rate-rendered matrix; counts stay the exact contract.
  */
object Cohorts {

  /** Distinct (user, period) activity, period = weekly Monday (or
    * daily) truncation of `tsCol`.
    */
  private def activity(events: DataFrame, userCol: String, tsCol: String,
      weekly: Boolean): DataFrame =
    events.select(col(userCol).as("__u"),
        date_trunc(if (weekly) "week" else "day", col(tsCol))
          .cast("date").as("__p"))
      .distinct()

  /** The retention matrix: (cohort, week_offset, n_active) with cohort the
    * user's first period (ISO string) and offset in whole periods.
    * Every (cohort, week_offset) pair that has at least one active user
    * appears; offset-0 rows are the cohort sizes.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      weekly: Boolean = true): DataFrame = {
    val act = activity(events, userCol, tsCol, weekly)
    val cohorts = act.groupBy(col("__u")).agg(min(col("__p")).as("__c"))
    val step = if (weekly) 7 else 1
    act.join(cohorts, "__u")
      .groupBy(col("__c"),
        (datediff(col("__p"), col("__c")) / step).cast("int").as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_active"))
      .select(date_format(col("__c"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_active"))
  }

  /** [[retention]] plus the rate against the cohort's own offset-0
    * size, at 4dp (exact integer division inputs — identical
    * cross-engine).
    */
  def retentionRate(events: DataFrame, userCol: String, tsCol: String,
      weekly: Boolean = true): DataFrame = {
    val m = retention(events, userCol, tsCol, weekly)
    val sizes = m.filter(col("week_offset") === 0)
      .select(col("cohort"), col("n_active").as("__size"))
    m.join(sizes, "cohort")
      .select(col("cohort"), col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("__size"), 4)
          .as("rate"))
  }
}
