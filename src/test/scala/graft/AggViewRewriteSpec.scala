package graft

import java.nio.file.Files


import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.operators.Incremental.AggCol
import graft.plans.{AggViewCatalog, AggViewRewrite, MaterializedAggView}

/** Materialized-view routing: a distributive aggregation over the
  * base table is answered from its IVM-maintained view — scan moved,
  * results identical, and the rule declines every shape it cannot
  * prove.
  */
class AggViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(AggCol("cnt", "count", ""),
    AggCol("s", "sum", "vc"), AggCol("mn", "min", "vc"),
    AggCol("mx", "max", "vc"))
  private val measures = Map(
    ("count", "") -> "cnt", ("sum", "vc") -> "s",
    ("min", "vc") -> "mn", ("max", "vc") -> "mx")

  private def setup(): (String, String) = {
    val root = Files.createTempDirectory("aggvr")
    val basePath = root.resolve("base_tbl").toString
    val viewPath = root.resolve("view_tbl").toString
    val rows = (1 to 400).map(i =>
      ("k" + i % 7, "t" + i % 3, (i % 50).toLong)).toDF("k1", "k2", "vc")
    rows.write.parquet(basePath)
    Incremental.aggView(spark.read.parquet(basePath),
      Seq("k1", "k2"), specs).write.parquet(viewPath)
    (basePath, viewPath)
  }

  // the rewrite is a LOGICAL optimization: read the scanned paths
  // from the optimized plan (the physical plan hides inside
  // AdaptiveSparkPlanExec under AQE)
  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  private def withRule[T](viewEntry: MaterializedAggView)(body: => T): T = {
    spark.experimental.extraOptimizations = Seq(AggViewRewrite(spark))
    AggViewCatalog.register(viewEntry)
    try body finally {
      AggViewCatalog.clear()
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rollup-grain aggregation routes to the view; results identical") {
    val (basePath, viewPath) = setup()
    val entry = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures)
    val got = withRule(entry) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("vc").as("s"),
          min("vc").as("mn"), max("vc").as("mx"))
      val scans = scansOf(q)
      assert(scans.exists(_.contains("view_tbl")), s"view not scanned: $scans")
      assert(!scans.exists(_.contains("base_tbl")),
        s"base still scanned: $scans")
      q.collect()
      q
    }
    val direct = spark.read.parquet(basePath).groupBy("k1")
      .agg(count(lit(1)).as("cnt"), sum("vc").as("s"),
        min("vc").as("mn"), max("vc").as("mx"))
    assertSameRows(got, direct)
  }

  test("exact-grain aggregation with a key-only filter replays the filter on the view") {
    val (basePath, viewPath) = setup()
    val entry = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures)
    val got = withRule(entry) {
      val q = spark.read.parquet(basePath)
        .filter(col("k2") =!= "t0")
        .groupBy("k1", "k2")
        .agg(count(lit(1)).as("cnt"), max("vc").as("mx"))
      assert(scansOf(q).exists(_.contains("view_tbl")))
      q.collect()
      q
    }
    val direct = spark.read.parquet(basePath)
      .filter(col("k2") =!= "t0")
      .groupBy("k1", "k2")
      .agg(count(lit(1)).as("cnt"), max("vc").as("mx"))
    assertSameRows(got, direct)
  }

  test("the rule declines what it cannot prove: non-key filter, " +
      "non-grain distinct, alien table, colliding path suffix") {
    val (basePath, viewPath) = setup()
    val entry = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures)
    withRule(entry) {
      // filter on a NON-key column — the view has no row detail
      val f = spark.read.parquet(basePath).filter(col("vc") > 10)
        .groupBy("k1").agg(count(lit(1)).as("cnt"))
      assert(scansOf(f).exists(_.contains("base_tbl")))
      // count(DISTINCT x) with x OUTSIDE the view grain: partials
      // cannot recover lost distinctness
      val cd = spark.read.parquet(basePath).groupBy("k1")
        .agg(countDistinct("vc").as("d"))
      assert(scansOf(cd).exists(_.contains("base_tbl")))
      // a different table with the same columns stays untouched
      val other = Files.createTempDirectory("aggvr2")
        .resolve("other_tbl").toString
      Seq(("k0", "t0", 1L)).toDF("k1", "k2", "vc").write.parquet(other)
      val o = spark.read.parquet(other).groupBy("k1")
        .agg(count(lit(1)).as("cnt"))
      assert(scansOf(o).exists(_.contains("other_tbl")))
      // the suffix foot-gun: a SECOND table whose path merely ENDS
      // with /base_tbl (a backup copy) must not be served from the
      // registered base's view — matching is full-path equality
      val backup = Files.createTempDirectory("aggvr4")
        .resolve("backup").resolve("base_tbl").toString
      Seq(("k0", "t0", 999L), ("k0", "t1", 1L))
        .toDF("k1", "k2", "vc").write.parquet(backup)
      val b = spark.read.parquet(backup).groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("vc").as("s"))
      assert(scansOf(b).exists(_.contains("backup")),
        s"colliding suffix was rewritten: ${scansOf(b)}")
      assert(b.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq == Seq(("k0", 2L, 1000L)))
    }
  }

  test("avg routes as sum/count; count(DISTINCT key) re-aggregates " +
      "the finer view") {
    val (basePath, viewPath0) = setup()
    // parquet reads force nullability, so avg needs an explicit
    // non-null count measure — the realistic registration posture
    val viewPath = viewPath0 + "_avg"
    Incremental.aggView(spark.read.parquet(basePath), Seq("k1", "k2"),
      specs :+ AggCol("cntv", "count", "vc")).write.parquet(viewPath)
    val entry = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures + (("count", "vc") -> "cntv"))
    val got = withRule(entry) {
      // k2 is in the grain, so distinct-count
      // re-aggregates the view's k2 column exactly
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(avg("vc").as("a"), countDistinct("k2").as("d"),
          sum("vc").as("s"))
      val scans = scansOf(q)
      assert(scans.exists(_.contains("view_tbl")), s"not routed: $scans")
      assert(!scans.exists(_.contains("base_tbl")),
        s"base still scanned: $scans")
      q.collect()
      q
    }
    val direct = spark.read.parquet(basePath).groupBy("k1")
      .agg(avg("vc").as("a"), countDistinct("k2").as("d"),
        sum("vc").as("s"))
    assertSameRows(got, direct)
    // approx_count_distinct routes under the same grain rule (HLL is
    // duplicate-insensitive: the view-side sketch is bit-identical),
    // and declines off-grain
    val entry2 = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures + (("count", "vc") -> "cntv"))
    val gotH = withRule(entry2) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(approx_count_distinct("k2").as("ad"))
      assert(scansOf(q).exists(_.contains("view_tbl")) &&
        !scansOf(q).exists(_.contains("base_tbl")))
      val off = spark.read.parquet(basePath).groupBy("k1")
        .agg(approx_count_distinct("vc").as("ad"))
      assert(scansOf(off).exists(_.contains("base_tbl")),
        "off-grain approx distinct must decline")
      q.collect()
      q
    }
    assertSameRows(gotH, spark.read.parquet(basePath).groupBy("k1")
      .agg(approx_count_distinct("k2").as("ad")))
  }

  test("avg over a NULLABLE column requires a non-null count measure") {
    val root = Files.createTempDirectory("aggvrn")
    val basePath = root.resolve("base_tbl").toString
    val viewPath = root.resolve("view_tbl").toString
    val viewPath2 = root.resolve("view_tbl2").toString
    (1 to 300).map(i => ("k" + i % 5, (i % 40).toLong))
      .toDF("k1", "raw")
      .withColumn("vcn", when(col("raw") > 10, col("raw")))
      .drop("raw")
      .write.parquet(basePath)
    // view WITHOUT a count-of-vcn measure: the plain row count
    // over-counts null inputs, so avg must DECLINE
    Incremental.aggView(spark.read.parquet(basePath), Seq("k1"),
      Seq(AggCol("cnt", "count", ""), AggCol("s", "sum", "vcn")))
      .write.parquet(viewPath)
    val weak = MaterializedAggView(basePath, viewPath, Seq("k1"),
      Map(("count", "") -> "cnt", ("sum", "vcn") -> "s"))
    withRule(weak) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(avg("vcn").as("a"))
      assert(scansOf(q).exists(_.contains("base_tbl")),
        "nullable avg must not route via the row count")
    }
    // view WITH count(vcn): routes, and matches the direct answer
    Incremental.aggView(spark.read.parquet(basePath), Seq("k1"),
      Seq(AggCol("cnt", "count", ""), AggCol("cntv", "count", "vcn"),
        AggCol("s", "sum", "vcn")))
      .write.parquet(viewPath2)
    val strong = MaterializedAggView(basePath, viewPath2, Seq("k1"),
      Map(("count", "") -> "cnt", ("count", "vcn") -> "cntv",
        ("sum", "vcn") -> "s"))
    val got = withRule(strong) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(avg("vcn").as("a"), count(col("vcn")).as("nn"))
      assert(scansOf(q).exists(_.contains("view_tbl2")))
      assert(!scansOf(q).exists(_.contains("base_tbl")))
      q.collect()
      q
    }
    assertSameRows(got, spark.read.parquet(basePath).groupBy("k1")
      .agg(avg("vcn").as("a"), count(col("vcn")).as("nn")))
  }

  test("lattice selection: the coarsest adequate view wins; inadequate coarse view passes over") {
    val (basePath, viewPath) = setup()
    // a second, coarser view of the SAME base at (k1) grain
    val coarsePath = Files.createTempDirectory("aggvrl")
      .resolve("coarse_tbl").toString
    Incremental.aggView(spark.read.parquet(basePath),
      Seq("k1"), specs).write.parquet(coarsePath)
    spark.experimental.extraOptimizations = Seq(AggViewRewrite(spark))
    AggViewCatalog.register(MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures))
    AggViewCatalog.register(MaterializedAggView(basePath, coarsePath,
      Seq("k1"), measures))
    try {
      // both grains coexist in the catalog (register must not evict)
      assert(AggViewCatalog.all.size == 2)
      // per-k1: BOTH views are adequate — the 7-row coarse view must win
      val q1 = spark.read.parquet(basePath).groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("vc").as("s"))
      assert(scansOf(q1).exists(_.contains("coarse_tbl")))
      assertSameRows(q1, spark.read.parquet(basePath).groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("vc").as("s")))
      // per-(k1,k2): the coarse view CANNOT serve — falls to the fine one
      val q2 = spark.read.parquet(basePath).groupBy("k1", "k2")
        .agg(min("vc").as("mn"))
      assert(scansOf(q2).exists(_.contains("view_tbl")) &&
        !scansOf(q2).exists(_.contains("coarse_tbl")))
      // a k2 filter is outside the coarse grain too — fine view serves it
      val q3 = spark.read.parquet(basePath).filter(col("k2") === "t1")
        .groupBy("k1").agg(sum("vc").as("s"))
      assert(scansOf(q3).exists(_.contains("view_tbl")) &&
        !scansOf(q3).exists(_.contains("coarse_tbl")))
      assertSameRows(q3, spark.read.parquet(basePath)
        .filter(col("k2") === "t1")
        .groupBy("k1").agg(sum("vc").as("s")))
    } finally {
      AggViewCatalog.clear()
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("grouping outside the view grain declines; view stays current after maintenance") {
    val (basePath, viewPath) = setup()
    val entry = MaterializedAggView(basePath, viewPath,
      Seq("k1", "k2"), measures)
    withRule(entry) {
      // vc is not a view key: grouping by it cannot be served
      val g = spark.read.parquet(basePath).groupBy("vc")
        .agg(count(lit(1)).as("cnt"))
      assert(scansOf(g).exists(_.contains("base_tbl")))
    }
    // maintenance keeps routing honest: fold a tick into the view,
    // append the tick to the base, re-register — rewrite still ==
    // direct
    val tick = Seq(("k1", "t9", 500L), ("k9", "t0", 7L))
      .toDF("k1", "k2", "vc")
    val maintained = Incremental.maintainAgg(
      spark.read.parquet(viewPath), tick, Seq("k1", "k2"), specs)
    val root = Files.createTempDirectory("aggvr3")
    val v2 = root.resolve("view_tbl2").toString
    maintained.write.parquet(v2)
    tick.write.mode("append").parquet(basePath)
    val entry2 = MaterializedAggView(basePath, v2,
      Seq("k1", "k2"), measures)
    val got = withRule(entry2) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("vc").as("s"))
      assert(scansOf(q).exists(_.contains("view_tbl2")))
      q.collect()
      q
    }
    assertSameRows(got, spark.read.parquet(basePath).groupBy("k1")
      .agg(count(lit(1)).as("cnt"), sum("vc").as("s")))
  }

  test("avg route mirrors Average's DOUBLE accumulation: huge long " +
      "partials re-sum without overflow") {
    val root = Files.createTempDirectory("aggvro")
    val basePath = root.resolve("base_tbl").toString
    val viewPath = root.resolve("view_tbl").toString
    // four grain cells whose long partials are each fine, but whose
    // LONG re-sum would overflow (ANSI: exception; legacy: wraparound
    // → a wrong, negative average) — native Average accumulates the
    // sum as a double and returns a finite result, so the route must
    // cast BEFORE the outer Sum to stay result-equivalent
    val big = Long.MaxValue / 2
    (0 until 4).map(i => ("a", "t" + i, big)).toDF("k1", "k2", "vc")
      .write.parquet(basePath)
    Incremental.aggView(spark.read.parquet(basePath), Seq("k1", "k2"),
      Seq(AggCol("cnt", "count", ""), AggCol("cntv", "count", "vc"),
        AggCol("s", "sum", "vc"))).write.parquet(viewPath)
    val entry = MaterializedAggView(basePath, viewPath, Seq("k1", "k2"),
      Map(("count", "") -> "cnt", ("count", "vc") -> "cntv",
        ("sum", "vc") -> "s"))
    val got = withRule(entry) {
      val q = spark.read.parquet(basePath).groupBy("k1")
        .agg(avg("vc").as("a"))
      assert(scansOf(q).exists(_.contains("view_tbl")) &&
        !scansOf(q).exists(_.contains("base_tbl")), "route must fire")
      q.collect() // a long-typed re-sum of the partials would die here
      q
    }
    assertSameRows(got, spark.read.parquet(basePath).groupBy("k1")
      .agg(avg("vc").as("a")))
  }
}
