package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** One registered materialized aggregate view: the IVM-maintained
  * summary ([[graft.operators.Incremental.aggView]] persisted at
  * `viewPath`) that can answer distributive aggregations over the
  * base table matched by `basePathSuffix`.
  *
  * `measures` maps the base-side aggregate form to the view column
  * that carries its partial: `("count","")` → the view's count
  * column, `("sum", in)` / `("min", in)` / `("max", in)` → the
  * column holding that aggregate of base column `in`.
  */
final case class MaterializedAggView(
    basePathSuffix: String,
    viewPath: String,
    keys: Seq[String],
    measures: Map[(String, String), String])

/** The registry [[AggViewRewrite]] consults — session-global and
  * mutable so views can be declared (and retired) without rebuilding
  * the SparkSession the extension was injected into. Register after
  * publishing the view, clear when it goes stale; the rule is a no-op
  * while the registry is empty.
  */
object AggViewCatalog {
  @volatile private var entries: Seq[MaterializedAggView] = Nil
  /** Re-registering the same base at the same GRAIN replaces (a
    * maintained view supersedes its prior version); different grains
    * of one base coexist — the rollup lattice [[AggViewRewrite]]
    * selects from.
    */
  def register(v: MaterializedAggView): Unit = synchronized {
    entries = entries.filterNot(e =>
      e.basePathSuffix == v.basePathSuffix && e.keys == v.keys) :+ v
  }
  def clear(): Unit = synchronized { entries = Nil }
  def all: Seq[MaterializedAggView] = entries
}

/** Optimizer rule: answer a distributive aggregation over a BASE
  * table from its registered MATERIALIZED VIEW instead — the
  * Spark-native reading of "serve reports from mamba_fact_*, not by
  * re-scanning obs" (SURVEY §2 A4), generalized to the lakehouse
  * materialized-view routing Databricks/BigQuery do: at 100 TB the
  * difference between a report and a table scan is whether the
  * optimizer KNOWS the summary exists.
  *
  * Fires when the plan under an [[Aggregate]] bottoms out (through
  * row-preserving Project/alias nodes and Filters that reference
  * ONLY view key columns) at a scan of a registered base path, the
  * grouping keys are a SUBSET of the view's grain (re-aggregation is
  * exact for the distributive set: counts and sums add, min/max take
  * the extreme), and every aggregate expression is a registered
  * measure. The rewritten Aggregate re-aggregates the view — a
  * |view|-row scan, never the base table — while key-only Filters
  * replay against the view's key columns.
  *
  * Output attributes keep their ORIGINAL exprIds (aliases pin them),
  * so parent operators are untouched. count(*) rewrites to
  * coalesce(sum(cnt), 0) — sum is nullable where count was not, and
  * the coalesce restores the contract. The rule never fires on its
  * own output (the view path is not a registered base). Result
  * equivalence is hash-proven by ivm_rewrite; the-scan-actually-
  * moved is ivm_rewrite_gate's contract.
  */
case class AggViewRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  /** Walk Project/alias/key-only-Filter wrappers down to a scan of
    * `suffix`; returns the collected Filter conditions (outermost
    * first) when the chain matches.
    */
  private def matchBase(plan: LogicalPlan, suffix: String,
      keys: Set[String]): Option[Seq[Expression]] = plan match {
    case SubqueryAlias(_, child) => matchBase(child, suffix, keys)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      matchBase(child, suffix, keys)
    case Filter(cond, child)
        if cond.references.forall(a => keys.contains(a.name)) =>
      matchBase(child, suffix, keys).map(cond +: _)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.exists(_.toString.endsWith(suffix)) =>
        Some(Seq.empty)
      case _ => None
    }
    case _ => None
  }

  /** The (fn, input-column) form of a supported aggregate function,
    * or None when the rule must not fire.
    */
  private def measureOf(fn: Expression): Option[(String, String)] = fn match {
    case Count(Seq(Literal(_, _))) => Some(("count", ""))
    case Count(Seq()) => Some(("count", ""))
    case s: Sum => s.child match {
      case ar: AttributeReference => Some(("sum", ar.name))
      case _ => None
    }
    case m: Min => m.child match {
      case ar: AttributeReference => Some(("min", ar.name))
      case _ => None
    }
    case m: Max => m.child match {
      case ar: AttributeReference => Some(("max", ar.name))
      case _ => None
    }
    case _ => None
  }

  private def rewriteOne(a: Aggregate, v: MaterializedAggView): Option[LogicalPlan] = {
    val keySet = v.keys.toSet
    // grouping must be bare key columns within the view's grain
    val groupKeys = a.groupingExpressions.map {
      case ar: AttributeReference if keySet.contains(ar.name) => Some(ar)
      case _ => None
    }
    if (groupKeys.exists(_.isEmpty)) return None
    val filters = matchBase(a.child, v.basePathSuffix, keySet) match {
      case None => return None
      case Some(fs) => fs
    }
    // every output is a grouped key or a registered measure
    val planned = a.aggregateExpressions.map {
      case ar: AttributeReference if keySet.contains(ar.name) =>
        Left(ar)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        measureOf(ae.aggregateFunction) match {
          case Some(m) if v.measures.contains(m) => Right((al, m))
          case _ => return None
        }
      case _ => return None
    }
    // fresh view relation per rewrite (fresh exprIds, so two rewrites
    // in one plan can't collide)
    val viewPlan = session.read.parquet(v.viewPath).queryExecution.analyzed
    val viewAttr: Map[String, Attribute] =
      viewPlan.output.map(at => at.name -> at).toMap
    if (!v.keys.forall(viewAttr.contains) ||
      !v.measures.values.forall(viewAttr.contains)) return None

    val newChild = filters.foldRight(viewPlan) { (cond, child) =>
      Filter(cond.transform {
        case ar: AttributeReference => viewAttr(ar.name)
      }, child)
    }
    val newGrouping = a.groupingExpressions.map {
      case ar: AttributeReference => viewAttr(ar.name)
    }
    val newAggs: Seq[NamedExpression] = planned.map {
      case Left(ar) =>
        Alias(viewAttr(ar.name), ar.name)(exprId = ar.exprId)
      case Right((al, m @ (fnName, _))) =>
        val vcol = viewAttr(v.measures(m))
        val expr: Expression = fnName match {
          case "count" => Coalesce(Seq(
            Sum(vcol).toAggregateExpression(), Literal(0L)))
          case "sum" => Sum(vcol).toAggregateExpression()
          case "min" => Min(vcol).toAggregateExpression()
          case "max" => Max(vcol).toAggregateExpression()
        }
        Alias(expr, al.name)(exprId = al.exprId)
    }
    Some(a.copy(groupingExpressions = newGrouping,
      aggregateExpressions = newAggs, child = newChild))
  }

  /** Lattice selection: when several registered views can answer the
    * same aggregate (a rollup hierarchy — (user), (user, type), …),
    * prefer the COARSEST adequate grain: fewer keys ⇒ fewer groups ⇒
    * the smallest state to re-aggregate. A coarser view that cannot
    * serve (grouping or filter outside its grain, unregistered
    * measure) simply fails to match and the next-finer one is tried.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = AggViewCatalog.all
    if (views.isEmpty) plan
    else plan.transformUp {
      case a: Aggregate =>
        views.sortBy(_.keys.size).view.flatMap(v => rewriteOne(a, v))
          .headOption.getOrElse(a)
    }
  }
}
