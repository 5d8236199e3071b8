package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, EvalMode, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** One registered materialized aggregate view: the IVM-maintained
  * summary ([[graft.operators.Incremental.aggView]] persisted at
  * `viewPath`) that can answer distributive aggregations over the
  * base table at `basePath`.
  *
  * `basePath` is the base table's FULL path (any Hadoop-qualifiable
  * form — `/tmp/t`, `file:/tmp/t`, `hdfs://nn/t`); [[AggViewRewrite]]
  * matches scans by qualified-URI EQUALITY, never by suffix — a
  * suffix match would silently rewrite aggregates over any OTHER
  * table whose path happens to end the same way (`…/backup/orders`
  * vs `…/orders`), serving them from the wrong view.
  *
  * `measures` maps the base-side aggregate form to the view column
  * that carries its partial: `("count","")` → the view's row-count
  * column, `("sum", in)` / `("min", in)` / `("max", in)` / a
  * non-null `("count", in)` → the column holding that aggregate of
  * base column `in`.
  */
final case class MaterializedAggView(
    basePath: String,
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
      e.basePath == v.basePath && e.keys == v.keys) :+ v
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
  * the extreme), and every aggregate expression is servable. Beyond
  * the plain distributive measures, two derived routes (the
  * reference's own report #3 shape — AVG + COUNT(DISTINCT uuid),
  * reference README.md:321):
  *
  *  - AVG(x) = Sum(view sum of x) / Sum(view count) — algebraic, not
  *    distributive, but derivable from two registered partials. The
  *    denominator must count NON-NULL x: a registered ("count", x)
  *    measure always serves; the plain row count ("count","") serves
  *    only when x is provably non-nullable in the base schema.
  *  - COUNT(DISTINCT x) where x is IN the view grain: the view keeps
  *    (at least) one row per surviving grain combination, so a
  *    distinct-count over the VIEW's x column re-aggregates exactly —
  *    a |view|-row scan replaces a full base shuffle. (x outside the
  *    grain declines: partials cannot recover lost distinctness.)
  *    approx_count_distinct(x) routes under the same grain condition:
  *    HLL is duplicate-insensitive, so the view-side sketch is
  *    bit-identical to the base-side one.
  *
  * The rewritten Aggregate re-aggregates the view — a |view|-row
  * scan, never the base table — while key-only Filters replay
  * against the view's key columns.
  *
  * Output attributes keep their ORIGINAL exprIds (aliases pin them),
  * so parent operators are untouched. count(*) rewrites to
  * coalesce(sum(cnt), 0) — sum is nullable where count was not, and
  * the coalesce restores the contract. The rule never fires on its
  * own output (the view path is not a registered base). Result
  * equivalence is hash-proven by ivm_rewrite / ivm_rewrite_distinct;
  * the-scan-actually-moved is ivm_rewrite_gate's contract.
  */
object AggViewRewrite {
  /** How one output expression of the Aggregate routes to the view. */
  private sealed trait Routed
  private final case class KeyCol(ar: AttributeReference) extends Routed
  private final case class ViaMeasure(al: Alias, fn: String,
      viewCol: String) extends Routed
  private final case class ViaAvg(al: Alias, sumCol: String,
      cntCol: String) extends Routed
  private final case class ViaCountDistinct(al: Alias,
      key: String) extends Routed
  private final case class ViaHll(al: Alias, key: String,
      relativeSD: Double) extends Routed
}

case class AggViewRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  /** Fully-qualified URI form of a path, so `/tmp/t` and
    * `file:/tmp/t` compare equal while `.../backup/t` never matches
    * `.../t` (the suffix foot-gun) — shared with [[ScanStatsRule]]
    * through [[PathEq]].
    */
  private def qualify(p: String): (String, String, String) =
    PathEq.qualify(session, p)

  /** Walk Project/alias/key-only-Filter wrappers down to a scan whose
    * every root path IS `basePath` (qualified equality); returns the
    * collected Filter conditions (outermost first) when the chain
    * matches.
    */
  private def matchBase(plan: LogicalPlan, basePath: String,
      keys: Set[String]): Option[Seq[Expression]] = plan match {
    case SubqueryAlias(_, child) => matchBase(child, basePath, keys)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      matchBase(child, basePath, keys)
    case Filter(cond, child)
        if cond.references.forall(a => keys.contains(a.name)) =>
      matchBase(child, basePath, keys).map(cond +: _)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.nonEmpty &&
            fs.location.rootPaths.forall(
              rp => qualify(rp.toString) == qualify(basePath)) =>
        Some(Seq.empty)
      case _ => None
    }
    case _ => None
  }

  /** The (fn, input-column) form of a supported plain distributive
    * aggregate, or None when it isn't one.
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

  import AggViewRewrite._

  private def rewriteOne(a: Aggregate, v: MaterializedAggView): Option[LogicalPlan] = {
    val keySet = v.keys.toSet
    // grouping must be bare key columns within the view's grain
    val groupKeys = a.groupingExpressions.map {
      case ar: AttributeReference if keySet.contains(ar.name) => Some(ar)
      case _ => None
    }
    if (groupKeys.exists(_.isEmpty)) return None
    val filters = matchBase(a.child, v.basePath, keySet) match {
      case None => return None
      case Some(fs) => fs
    }
    // every output is a grouped key or a servable aggregate
    val planned: Seq[Routed] = a.aggregateExpressions.map {
      case ar: AttributeReference if keySet.contains(ar.name) =>
        KeyCol(ar)
      case al @ Alias(ae: AggregateExpression, _) if ae.filter.isEmpty =>
        if (ae.isDistinct) ae.aggregateFunction match {
          case Count(Seq(ar: AttributeReference))
              if keySet.contains(ar.name) =>
            ViaCountDistinct(al, ar.name)
          case _ => return None
        } else ae.aggregateFunction match {
          // COUNT(x): a registered non-null count serves directly;
          // the row count serves when x is provably non-nullable
          case Count(Seq(ar: AttributeReference)) =>
            if (v.measures.contains(("count", ar.name)))
              ViaMeasure(al, "count", v.measures(("count", ar.name)))
            else if (!ar.nullable && v.measures.contains(("count", "")))
              ViaMeasure(al, "count", v.measures(("count", "")))
            else return None
          case av: Average => av.child match {
            case ar: AttributeReference if al.dataType == DoubleType =>
              val cntM =
                if (v.measures.contains(("count", ar.name)))
                  Some(("count", ar.name))
                else if (!ar.nullable && v.measures.contains(("count", "")))
                  Some(("count", ""))
                else None
              (v.measures.get(("sum", ar.name)), cntM) match {
                case (Some(s), Some(c)) => ViaAvg(al, s, v.measures(c))
                case _ => return None
              }
            case _ => return None
          }
          // approx_count_distinct(x) with x IN the grain: HLL is
          // duplicate-insensitive, and the view's x column spans the
          // SAME value set per output group as the base's — the
          // sketch (and so the estimate) is bit-identical
          case h: HyperLogLogPlusPlus => h.child match {
            case ar: AttributeReference if keySet.contains(ar.name) =>
              ViaHll(al, ar.name, h.relativeSD)
            case _ => return None
          }
          case fn => measureOf(fn) match {
            case Some(m) if v.measures.contains(m) =>
              ViaMeasure(al, m._1, v.measures(m))
            case _ => return None
          }
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
    def reAgg(fnName: String, vcol: Attribute): Expression = fnName match {
      case "count" => Coalesce(Seq(
        Sum(vcol).toAggregateExpression(), Literal(0L)))
      case "sum" => Sum(vcol).toAggregateExpression()
      case "min" => Min(vcol).toAggregateExpression()
      case "max" => Max(vcol).toAggregateExpression()
    }
    val newAggs: Seq[NamedExpression] = planned.map {
      case KeyCol(ar) =>
        Alias(viewAttr(ar.name), ar.name)(exprId = ar.exprId)
      case ViaMeasure(al, fnName, vcol) =>
        Alias(reAgg(fnName, viewAttr(vcol)), al.name)(exprId = al.exprId)
      case ViaAvg(al, sumCol, cntCol) =>
        // Mirror Average's accumulation: the sum side casts to double
        // BEFORE the outer Sum — for integral base columns the view's
        // partials are LongType, and a long-typed re-Sum could
        // overflow (ANSI: exception; legacy: wraparound → wrong
        // average) where native Average, which accumulates the sum in
        // DoubleType, returns a finite result. The divide is
        // Average's own final step (LEGACY: null on /0, though a
        // group implies count >= 1); non-null-count denominator
        // semantics are guaranteed by the planning guard above.
        val sumE = Sum(Cast(viewAttr(sumCol), DoubleType))
          .toAggregateExpression()
        val cntE = Sum(viewAttr(cntCol)).toAggregateExpression()
        Alias(Divide(sumE, Cast(cntE, DoubleType),
          EvalMode.LEGACY), al.name)(exprId = al.exprId)
      case ViaCountDistinct(al, key) =>
        Alias(Count(Seq(viewAttr(key))).toAggregateExpression(
          isDistinct = true), al.name)(exprId = al.exprId)
      case ViaHll(al, key, rsd) =>
        Alias(HyperLogLogPlusPlus(viewAttr(key), relativeSD = rsd)
          .toAggregateExpression(), al.name)(exprId = al.exprId)
    }
    Some(a.copy(groupingExpressions = newGrouping,
      aggregateExpressions = newAggs, child = newChild))
  }

  /** Lattice selection: when several registered views can answer the
    * same aggregate (a rollup hierarchy — (user), (user, type), …),
    * prefer the COARSEST adequate grain: fewer keys ⇒ fewer groups ⇒
    * the smallest state to re-aggregate. A coarser view that cannot
    * serve (grouping or filter outside its grain, unregistered
    * measure, distinct column outside its grain) simply fails to
    * match and the next-finer one is tried.
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
