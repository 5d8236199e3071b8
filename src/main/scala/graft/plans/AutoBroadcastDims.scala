package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, HintInfo, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: force a broadcast hint on any join side that scans
  * a known small dimension table (SURVEY §2.3 J1-J3 — "dims are
  * small").
  *
  * Why a Rule and not `broadcast()` at call sites: report SQL (E3) is
  * implementer-authored text — the engine can't edit it, and the
  * statistics-based auto-broadcast threshold compares *byte* sizes
  * which post-join/filter relations routinely overestimate. Declaring
  * "these relations are dimensions" once, engine-side, gives every
  * query — DataFrame or SQL — the broadcast plan the schema implies.
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`); matching
  * is by scanned file path or table/view name against
  * [[dimNames]].
  */
case class AutoBroadcastDims(dimNames: Set[String]) extends Rule[LogicalPlan] {

  /** A join side is "a dim scan" when, under row-preserving-or-
    * narrowing nodes only (Project/Filter/alias/view), it bottoms out
    * at a scan of a declared dim — such a side is never LARGER than
    * the dim itself, so the broadcast stays safe.
    *
    * Deliberately NO matching on alias/view NAME alone: a user frame
    * `.alias("nation")` or a temp view shadowing a dim name can be
    * arbitrarily large, and a forced broadcast of it would OOM the
    * executors. Temp views the engine registers over dim parquet
    * still match — their stored plans bottom out at the dim scan.
    */
  private def isDimScan(plan: LogicalPlan): Boolean = plan match {
    case SubqueryAlias(_, child) => isDimScan(child)
    case v: View => isDimScan(v.child)
    case Project(_, child) => isDimScan(child)
    case Filter(_, child) => isDimScan(child)
    case lr: LogicalRelation => lr.relation match {
      // parquet scans: match .../<name>.parquet (Tables.load layout)
      case fs: HadoopFsRelation => fs.location.rootPaths.exists { p =>
        val s = p.toString.toLowerCase
        dimNames.exists(d => s.endsWith(s"/$d.parquet") || s.contains(s"/$d.parquet/"))
      }
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val lh = if (isDimScan(left)) Some(HintInfo(strategy =
        Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))) else None
      val rh = if (isDimScan(right)) Some(HintInfo(strategy =
        Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))) else None
      if (lh.isDefined || rh.isDefined) j.copy(hint = JoinHint(lh, rh)) else j
  }
}
