package graft.plans

import org.apache.spark.sql.execution.{CollectLimitExec, FilterExec,
  GlobalLimitExec, InputAdapter, LocalLimitExec, ProjectExec, SortExec,
  SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Detector for the one window shape that cannot survive a 100× scale-up:
  * a `WindowExec` with an EMPTY partition spec. Such a window moves every
  * input row into ONE task (Spark logs "Moving all data to a single
  * partition") and — unlike a skewed aggregation — is not AQE-splittable,
  * so it chokes no matter how many executors exist.
  *
  * The single legitimate exception is a window whose INPUT is already
  * rank-bounded: a `rank <= k` filter plans the prune below the window —
  * as `WindowGroupLimit` for partitioned windows (SPARK-37099) or as a
  * `TakeOrderedAndProject`/limit for the empty-spec case
  * (LimitPushDownThroughWindow) — so the map side keeps only k rows per
  * upstream partition and the single-partition final stage receives
  * state, not data (measured rationale at
  * [[graft.operators.SketchState.sampleCompress]]). Those are exempted by
  * walking the window's input chain (through sorts/exchanges/projections)
  * to a bounding node.
  *
  * Used two ways: [[graft.PlanAudit]] runs it over EVERY registered query
  * and hard-fails the PLANS.md generation on a violation (the full-sweep
  * gate), and PlanAuditSpec pins the specific families that historically
  * carried the shape (theta bottom-k reads, tfidf/bm25 document
  * frequency).
  */
object WindowAudit {

  /** Every WindowExec with an empty partition spec NOT fed by a
    * WindowGroupLimit prune, anywhere in the tree (AQE wrappers, query
    * stages, and reused exchanges are traversed into).
    */
  def unprunedGlobalWindows(plan: SparkPlan): Seq[WindowExec] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[WindowExec]
    walk(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedInput(w) =>
        hits += w
      case _ =>
    }
    hits.toSeq
  }

  /** EVERY empty-spec WindowExec, bounded or not — Spark logs its
    * "Moving all data to a single partition" warning for all of them,
    * so a warning-free sweep needs this list empty too (a bounded one
    * is merely harmless, not silent). Report-only surface for
    * [[graft.PlanAudit]]'s stderr.
    */
  def allGlobalWindows(plan: SparkPlan): Seq[WindowExec] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[WindowExec]
    walk(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty => hits += w
      case _ =>
    }
    hits.toSeq
  }

  /** True when the window's input chain reaches a row-bounding node
    * through cardinality-preserving wrappers only — anything that could
    * re-inflate or hide the cardinality (joins, generators, aggregates,
    * unions, scans) stops the walk unbounded.
    */
  private def boundedInput(w: WindowExec): Boolean = {
    @annotation.tailrec
    def down(p: SparkPlan): Boolean = p match {
      case _: WindowGroupLimitExec      => true
      case _: TakeOrderedAndProjectExec => true
      case _: GlobalLimitExec           => true
      case _: LocalLimitExec            => true
      case _: CollectLimitExec          => true
      case a: AdaptiveSparkPlanExec     => down(a.executedPlan)
      case q: QueryStageExec            => down(q.plan)
      case r: ReusedExchangeExec        => down(r.child)
      case s: SortExec                  => down(s.child)
      case e: ShuffleExchangeExec       => down(e.child)
      case r: AQEShuffleReadExec        => down(r.child)
      case c: WholeStageCodegenExec     => down(c.child)
      case i: InputAdapter              => down(i.child)
      case pr: ProjectExec              => down(pr.child)
      case f: FilterExec                => down(f.child)
      case _                            => false
    }
    down(w.child)
  }

  /** Pre-order traversal that descends through the wrapper nodes whose
    * real subtree hides behind a method instead of `children`.
    */
  private def walk(p: SparkPlan)(visit: SparkPlan => Unit): Unit = {
    visit(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(visit)
      case q: QueryStageExec        => walk(q.plan)(visit)
      case r: ReusedExchangeExec    => walk(r.child)(visit)
      case _                        =>
    }
    p.children.foreach(walk(_)(visit))
  }
}
