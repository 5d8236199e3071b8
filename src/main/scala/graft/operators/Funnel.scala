package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel conversion — the events-analytics staple ("of the
  * users who signed up, how many then clicked, then purchased, in
  * order, within N days"): strict event-ORDER semantics, not mere
  * co-occurrence — step i counts only events strictly after the
  * user's step-(i−1) anchor time, so a purchase before the signup
  * does not convert.
  *
  * Plan shape: one pass per step (funnels are 3–5 steps, a fixed
  * small chain) — the step's typed events join the surviving cohort
  * on user id (uniform keys, the cohort only shrinks), then reduce to
  * the EARLIEST qualifying time per user; nothing wider than
  * (user, anchor) ever carries between steps. The optional
  * `withinDays` deadline is measured from the step-1 anchor (the
  * standard attribution-window reading).
  *
  * Output: one row per step — (step_idx, step, n_users, rate), rate
  * against step 1 at 4dp; pure timestamp/int arithmetic, replayed
  * exactly by the SQL oracle (events_funnel).
  */
object Funnel {

  def conversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      withinDays: Option[Int] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    // step 1: each user's first occurrence — the anchor
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
      .withColumn("__t1", col("__t"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      val deadline = withinDays match {
        case Some(d) => col(tsCol) <= col("__t1") +
          expr(s"interval $d days")
        case None => lit(true)
      }
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol))
        .join(prev.select(col("__u"), col("__t"), col("__t1")), "__u")
        .filter(col(tsCol) > col("__t") && deadline)
        .groupBy(col("__u"), col("__t1"))
        .agg(min(col(tsCol)).as("__t"))
        .select(col("__u"), col("__t"), col("__t1"))
    }
    // the per-step counts are |steps| rows — checkpoint once so the
    // base-rate branch below reads them instead of re-running the
    // whole step-join chain
    val counts = frames.zip(steps).zipWithIndex.map {
      case ((f, name), i) =>
        f.agg(coalesce(count(lit(1)), lit(0L)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(name).as("step"),
            col("n_users"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    // rate against step 1 as a one-row broadcast, NOT a global max
    // window — an empty-partition-spec WindowExec logs Spark's
    // single-partition warning on every run even over 4 rows, and the
    // suite's stderr invariant is zero of those
    val base = counts.filter(col("step_idx") === 1)
      .select(col("n_users").as("__base"))
    counts.crossJoin(broadcast(base))
      .withColumn("rate",
        round(col("n_users").cast("double") / col("__base"), 4))
      .drop("__base")
  }
}
