package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchState

/** Persisted mergeable HLL distinct-count state: the contract is
  * merge ≡ rebuild EXACTLY (register-max associativity — not just
  * within-error), sparse-mode exactness at low cardinality, bounded
  * relative error in dense mode, and exact n_rows bookkeeping.
  */
class SketchStateSpec extends SparkSpec {
  import spark.implicits._

  private val grain = Seq("g", "part")

  /** (g, part, v): two groups × two sub-parts, known distinct counts. */
  private def planted = Seq(
    ("a", 1, 10L), ("a", 1, 11L), ("a", 1, 10L),
    ("a", 2, 11L), ("a", 2, 12L),
    ("b", 1, 20L), ("b", 2, 20L), ("b", 2, 21L)
  ).toDF("g", "part", "v")

  test("sparse-mode estimates are exact at tiny cardinality") {
    val est = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, grain, "v"), Seq("g"))
      .select(col("g"), col("approx_distinct").cast("long"), col("n_rows"))
    // distinct over a: {10,11,12}=3 of 5 rows; b: {20,21}=2 of 3 rows
    assertSameRows(est, Seq(("a", 3L, 5L), ("b", 2L, 3L)).toDF())
  }

  test("merge equals rebuild exactly, sparse and dense") {
    // 30k distinct values in one group, 100 in the other: the first
    // leaves sparse mode at lgK=12, the second stays in it — both
    // must merge to the rebuilt rollup EXACTLY, not within-error
    val big = spark.range(0, 60000).select(
      when(col("id") % 2 === 0, "dense").otherwise("sparse").as("g"),
      (col("id") % 3).cast("int").as("part"),
      when(col("id") % 2 === 0, col("id"))
        .otherwise(col("id") % 100).as("v"),
      col("id"))
    val rebuilt = SketchState.estimateRollup(
      SketchState.distinctSketches(big, grain, "v"), Seq("g"))
    val merged = SketchState.estimateRollup(
      SketchState.mergeSketches(
        SketchState.distinctSketches(big.filter(col("id") % 5 < 2), grain, "v"),
        SketchState.distinctSketches(big.filter(col("id") % 5 >= 2), grain, "v"),
        grain),
      Seq("g"))
    assertSameRows(merged, rebuilt)
  }

  test("dense-mode estimate within the lgK=12 error envelope") {
    val n = 30000L
    val df = spark.range(0, n).select(lit("g").as("g"), lit(1).as("part"),
      col("id").as("v"))
    val est = SketchState.estimateRollup(
      SketchState.distinctSketches(df, grain, "v"), Seq("g"))
      .select("approx_distinct").as[Double].head()
    val relErr = math.abs(est - n) / n
    // rsd at lgK=12 is ~1.6%; 5% is > 3 sigma
    assert(relErr <= 0.05, s"rel err $relErr > 5% (est=$est exact=$n)")
  }

  test("n_rows bookkeeping is exact through merges") {
    val merged = SketchState.mergeSketches(
      SketchState.distinctSketches(planted.filter(col("v") % 2 === 0), grain, "v"),
      SketchState.distinctSketches(planted.filter(col("v") % 2 =!= 0), grain, "v"),
      grain)
    assert(merged.agg(sum(col("n_rows"))).as[Long].head() == planted.count())
  }

  test("fine-grain state rolls up identically to coarse-grain state") {
    // build at (g, part), roll to (g)  ==  build at (g), roll to (g):
    // both pass through hll_union_agg, and union of the part-partials
    // has the same registers as the direct group sketch
    val fine = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, grain, "v"), Seq("g"))
    val coarse = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, Seq("g"), "v"), Seq("g"))
    assertSameRows(fine, coarse)
  }
}
