package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules — the contract gate a warehouse
  * runs on every load before downstream trusts it (the Deequ-style
  * "unit tests for data" surface): row-level constraints evaluated in
  * ONE aggregation pass, plus the two dataset-level checks that
  * cannot be row predicates (uniqueness, referential integrity), all
  * emitting the same (rule, n_rows, n_violations, pass_rate, passed)
  * report schema so reports union and persist uniformly.
  *
  * [[Profile.profile]] answers "what does this data look like";
  * this module answers "does it satisfy the contract" — the check a
  * scheduler wires in front of [[graft.examples.MambaEtlJob]]-style
  * flattening so a bad drop fails loudly instead of flowing into
  * reports.
  *
  * Scale shape: [[check]] is one narrow pass — every rule folds into
  * the same global aggregate, partial sums combine map-side, and the
  * one exchange carries a single partial row per task. Violation
  * counts are ADDITIVE, so per-partition / per-delta check reports
  * merge exactly ([[mergeReports]]) — the incremental posture: check
  * each ingestion delta as it lands, fold counts into the persisted
  * report, never re-scan history. [[unique]] pays the one exact
  * groupBy its semantics require (the [[Dedup.exact]] shuffle shape;
  * at 100 TB run the [[SketchState]] HLL comparison first and fall
  * back to exact only on suspicion); [[referential]] is an FK-keyed
  * join with the parent side broadcast when dim-sized.
  */
object DataQuality {

  /** One named row-level constraint. A row violates the rule when the
    * predicate is false OR null (SQL three-valued logic would
    * otherwise let `col > 0` silently pass null rows — a null that
    * should fail a constraint must be excluded explicitly via
    * [[notNull]]-style coalesce, which the builders below do).
    */
  final case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", coalesce(col(c).between(lo, hi), lit(false)))

  def inSet(c: String, values: Seq[String]): Rule =
    Rule(s"in_set($c)", coalesce(col(c).isin(values: _*), lit(false)))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", coalesce(col(c).rlike(regex), lit(false)))

  def nonNegative(c: String): Rule =
    Rule(s"non_negative($c)", coalesce(col(c) >= 0, lit(false)))

  /** Evaluate every rule in ONE pass: (rule, n_rows, n_violations,
    * pass_rate, passed). `minPassRate` = 1.0 is the strict contract;
    * lower it for advisory rules ("≤ 0.1% bad rows tolerated").
    */
  def check(df: DataFrame, rules: Seq[Rule],
      minPassRate: Double = 1.0): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val aggs = rules.map { r =>
      // coalesce the sum too: a zero-row input (an empty delta is
      // legal) aggregates sum to null, and the report must still say
      // 0 violations / vacuous pass
      coalesce(sum(when(coalesce(r.predicate, lit(false)), 0L)
        .otherwise(1L)), lit(0L)).as(s"__v_${r.name}")
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(rules.map { r =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"))
    }: _*)
    finish(wide.select(explode(entries).as("__e")).select("__e.*"),
      minPassRate)
  }

  /** Uniqueness of a key tuple: n_violations = rows carrying a
    * duplicated key (so a key seen k>1 times contributes k, matching
    * "rows you could not safely join through"). One exact groupBy —
    * the semantics' irreducible shuffle.
    */
  def unique(df: DataFrame, keyCols: Seq[String],
      minPassRate: Double = 1.0): DataFrame = {
    val dupRows = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__k"))
      .agg(coalesce(sum(when(col("__k") > 1, col("__k"))), lit(0L)).as("__dup"),
        coalesce(sum(col("__k")), lit(0L)).as("__n"))
    finish(dupRows.select(
      lit(s"unique(${keyCols.mkString(",")})").as("rule"),
      col("__n").as("n_rows"), col("__dup").as("n_violations")), minPassRate)
  }

  /** Referential integrity: child rows whose FK value is non-null but
    * absent from the parent key set are orphans (null FKs are
    * legitimately optional — constrain them separately with
    * [[notNull]]). Parent side reduces to its distinct key column
    * before the join and broadcasts when dim-sized.
    */
  def referential(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String,
      minPassRate: Double = 1.0): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    val counts = child.select(col(childKey).as("__fk"))
      .join(pk, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("__orphans"))
    finish(counts.select(
      lit(s"referential($childKey->$parentKey)").as("rule"),
      col("__n").as("n_rows"), col("__orphans").as("n_violations")),
      minPassRate)
  }

  /** k-anonymity / l-diversity audit — the privacy screen a corpus
    * passes before training data ships: every quasi-identifier
    * combination must be shared by ≥ k rows (re-identification
    * resistance) and carry ≥ l distinct values of the sensitive
    * column (attribute-disclosure resistance; Machanavajjhala et al.
    * 2007 — k-anonymity alone fails when a k-group is sensitive-value
    * homogeneous). Output: one row per occupied quasi-tuple with
    * (n_rows, l_distinct, k_anonymous, l_diverse) — the flagged rows
    * ARE the suppression/generalization worklist.
    *
    * Scale shape: one uniform groupBy exchange on the quasi columns
    * with map-side partial (count, distinct-set) aggregation; the
    * result is equivalence-class-sized, not corpus-sized. Exact
    * count_distinct is intentional — a privacy gate must not
    * under-count diversity; at 100 TB the quasi grid is bounded by
    * the generalization hierarchy, not the corpus.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int = 5, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /** Per-group rule evaluation — the same one-pass battery as
    * [[check]] but at (groupCols…) grain: (group…, rule, n_rows,
    * n_violations, pass_rate, passed). The shape of "pass rate per
    * ingestion day / per source" monitoring: one uniform groupBy
    * exchange (partial sums map-side), violations localized to the
    * partition that shipped them instead of diluted corpus-wide.
    */
  def checkByGroup(df: DataFrame, groupCols: Seq[String], rules: Seq[Rule],
      minPassRate: Double = 1.0): DataFrame = {
    require(rules.nonEmpty, "checkByGroup needs at least one rule")
    val aggs = rules.map { r =>
      coalesce(sum(when(coalesce(r.predicate, lit(false)), 0L)
        .otherwise(1L)), lit(0L)).as(s"__v_${r.name}")
    }
    val wide = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(rules.map { r =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"))
    }: _*)
    finish(wide.select(groupCols.map(col) :+ explode(entries).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.*"): _*), minPassRate)
      .select(groupCols.map(col) ++ Seq(col("rule"), col("n_rows"),
        col("n_violations"), col("pass_rate"), col("passed")): _*)
  }

  /** The 100 TB uniqueness posture: HLL distinct estimate vs exact
    * row count, NO key-grain shuffle at all (one global aggregate,
    * sketch registers merge map-side — [[SketchState]]'s machinery as
    * a quality check). n_violations = estimated duplicated rows
    * max(0, n − distinct-estimate); at lgK=12 the estimate carries
    * ~1.6% rsd, so `minPassRate` must budget for it (e.g. 0.95 — a
    * screen, not a proof: run [[unique]] exactly on tables the screen
    * flags). Report schema matches [[unique]] with an `approx_`
    * rule-name prefix so both can coexist in one persisted report.
    */
  def uniqueApprox(df: DataFrame, keyCols: Seq[String],
      minPassRate: Double = 0.95, lgK: Int = 12): DataFrame = {
    // xxhash64 over the tuple: type-aware multi-column key in one
    // codegen'd expression (a string concat would alias ("ab","c")
    // with ("a","bc")). xxhash64 SKIPS null inputs, so keys differing
    // only in which column is null — ('a',null) vs (null,'a') — would
    // collide; the per-column isnull flags (booleans, never null)
    // restore the distinction exact unique() makes. The 2^-64
    // hash-collision mass is noise next to the sketch's own rsd.
    val counts = df.agg(count(lit(1)).as("__n"),
      hll_sketch_estimate(
        hll_sketch_agg(xxhash64(
          (keyCols.map(col) ++ keyCols.map(c => isnull(col(c)))): _*),
          lit(lgK))).as("__nd"))
    finish(counts.select(
      lit(s"approx_unique(${keyCols.mkString(",")})").as("rule"),
      col("__n").as("n_rows"),
      greatest(col("__n") - col("__nd").cast("long"), lit(0L))
        .as("n_violations")), minPassRate)
  }

  /** Fold per-delta (or per-partition) check reports: counts are
    * additive, so merge ≡ rebuild exactly — check each ingestion
    * delta as it lands and fold, never re-scan history. Only valid
    * for reports whose rules are row-local ([[check]]): uniqueness
    * and referential violations are NOT additive across deltas (a
    * dup pair can straddle the boundary) — re-derive those from
    * their persisted indexes instead.
    */
  def mergeReports(prior: DataFrame, delta: DataFrame,
      minPassRate: Double = 1.0): DataFrame =
    finish(prior.select("rule", "n_rows", "n_violations")
      .unionByName(delta.select("rule", "n_rows", "n_violations"))
      .groupBy("rule")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_violations")).as("n_violations")), minPassRate)

  /** Derive pass_rate / passed from raw counts (4dp-rounded so the
    * DuckDB oracle hashes identically; empty input passes vacuously).
    */
  private def finish(counts: DataFrame, minPassRate: Double): DataFrame =
    counts
      .withColumn("pass_rate", when(col("n_rows") === 0, 1.0)
        .otherwise(round((col("n_rows") - col("n_violations"))
          .cast("double") / col("n_rows"), 4)))
      .withColumn("passed", col("pass_rate") >= minPassRate)
}
