package graft.plans

import org.apache.spark.sql.DataFrame

/** Executed-plan introspection shared by driver gates and specs —
  * one definition, because the AQE stage-walking is subtle enough to
  * drift if copied (a new adaptive node type handled in one copy and
  * not the other would make a gate and its spec measure different
  * things).
  */
object PlanMetrics {

  /** `numFiles` of the first file scan in the frame's EXECUTED plan.
    * Runs the frame once (localCheckpoint — one execution produces
    * both rows and the final adaptive plan, so the metric is
    * populated), then walks the plan through AQE's stage wrappers.
    * Returns -1 when no file scan exists in the plan.
    */
  def scanFiles(df: DataFrame): Long = {
    df.localCheckpoint(true) // one execution: rows AND final plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      direct ++ direct.flatMap {
        case qs: QueryStageExec => expand(qs.plan)
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case _ => Seq.empty
      }
    }
    expand(df.queryExecution.executedPlan)
      .collectFirst { case s: FileSourceScanExec =>
        s.metrics("numFiles").value }
      .getOrElse(-1L)
  }

  /** Root paths of every file scan living UNDER a broadcast exchange
    * in the frame's executed plan — "which side did the planner
    * broadcast", the stats-driven build-side assertion the
    * stats_join_order gate and ScanStatsSpec both make. Runs the
    * frame once (localCheckpoint) so AQE finalizes before the walk.
    */
  def broadcastLeafPaths(df: DataFrame): Seq[String] = {
    df.localCheckpoint(true) // one execution: rows AND final plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      direct ++ direct.flatMap {
        case qs: QueryStageExec => expand(qs.plan)
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case _ => Seq.empty
      }
    }
    expand(df.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b }
      .flatMap(expand)
      .collect { case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString) }.flatten
  }
}
