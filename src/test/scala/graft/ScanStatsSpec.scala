package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.{ColStats, ScanStatsCatalog, ScanStatsRule, TableStats}
import graft.sources.{CatalogStore, Tables}

/** Publish-time statistics → Catalyst: registered table stats replace
  * the scan's size estimate (steering broadcast/build-side selection)
  * and, under CBO, feed row counts and column stats; CatalogStore
  * ANALYZE persists them as sidecars that reload without re-profiling.
  */
class ScanStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(ScanStatsRule(spark))
    try body finally {
      ScanStatsCatalog.clear()
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("registered stats replace the scan's size estimate; CBO row " +
      "counts engage under spark.sql.cbo.enabled") {
    val path = Files.createTempDirectory("sstats").resolve("t").toString
    orders.write.parquet(path)
    withRule {
      val before = spark.read.parquet(path)
        .queryExecution.optimizedPlan.stats
      ScanStatsCatalog.register(path, TableStats(
        rowCount = 123456L, sizeInBytes = 777777777L,
        cols = Map("o_orderkey" -> ColStats(123456L, 0L,
          Some("1"), Some("123456")))))
      val after = spark.read.parquet(path)
        .queryExecution.optimizedPlan.stats
      assert(after.sizeInBytes == BigInt(777777777L),
        s"stats not injected: before=${before.sizeInBytes} " +
          s"after=${after.sizeInBytes}")
      val saved = spark.conf.getOption("spark.sql.cbo.enabled")
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        val cbo = spark.read.parquet(path)
          .queryExecution.optimizedPlan.stats
        assert(cbo.rowCount.contains(BigInt(123456L)),
          s"rowCount under CBO: ${cbo.rowCount}")
        assert(cbo.attributeStats.nonEmpty, "column stats must attach")
      } finally saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
    }
    // registry empty again: estimates return to file size
    val off = spark.read.parquet(path).queryExecution.optimizedPlan.stats
    assert(off.sizeInBytes != BigInt(777777777L))
  }

  test("join broadcast side flips when the stats flip; rows identical") {
    val root = Files.createTempDirectory("sflip")
    val factP = root.resolve("fact").toString
    val dimP = root.resolve("dim").toString
    orders.select(col("o_orderkey"), (col("o_custkey") % 40).as("k"),
      col("o_totalprice")).write.parquet(factP)
    spark.range(40).select(col("id").as("k"),
      concat(lit("seg"), col("id") % 5).as("segment"))
      .write.parquet(dimP)
    def broadcastLeafPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      graft.plans.PlanMetrics.broadcastLeafPaths(df)
    // cents-integerized sum: the two plans aggregate in different
    // orders, and a double sum's ulps would differ
    def q() = spark.read.parquet(factP)
      .join(spark.read.parquet(dimP), "k")
      .groupBy("segment")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("tp"),
        count(lit(1)).as("n"))
    withRule {
      // truthful: dim is tiny, fact is huge → broadcast the dim
      ScanStatsCatalog.register(factP,
        TableStats(5000000L, 500L << 20, Map.empty))
      ScanStatsCatalog.register(dimP,
        TableStats(40L, 2048L, Map.empty))
      val honest = q()
      val honestSides = broadcastLeafPaths(honest)
      assert(honestSides.exists(_.contains("dim")) &&
        !honestSides.exists(_.contains("fact")),
        s"truthful stats must broadcast the dim: $honestSides")
      val honestRows = honest.collect().toSet
      // flipped: the registry now (wrongly) claims the fact is tiny —
      // the planner must follow the stats and flip the broadcast side
      ScanStatsCatalog.register(factP, TableStats(40L, 2048L, Map.empty))
      ScanStatsCatalog.register(dimP,
        TableStats(5000000L, 500L << 20, Map.empty))
      val flipped = q()
      val flippedSides = broadcastLeafPaths(flipped)
      assert(flippedSides.exists(_.contains("fact")) &&
        !flippedSides.exists(_.contains("dim")),
        s"flipped stats must broadcast the fact: $flippedSides")
      assert(flipped.collect().toSet == honestRows,
        "stats steer scheduling, never results")
    }
  }

  test("column stats drive CBO selectivity: a range filter's row " +
      "estimate scales with the min/max band instead of defaulting") {
    val path = Files.createTempDirectory("ssel").resolve("t").toString
    // uniform 1..10000 — FilterEstimation's interpolation on a
    // (min, max, ndv) column is exact for a range predicate
    spark.range(1, 10001).select(col("id").as("k"),
      (col("id") % 97).as("v")).write.parquet(path)
    val savedCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    withRule {
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        ScanStatsCatalog.register(path, TableStats(
          rowCount = 10000L, sizeInBytes = 1L << 20,
          cols = Map("k" -> ColStats(10000L, 0L,
            Some("1"), Some("10000")))))
        def estimate(upper: Long): BigInt =
          spark.read.parquet(path).filter(col("k") <= upper)
            .queryExecution.optimizedPlan.stats.rowCount
            .getOrElse(BigInt(-1))
        val tenth = estimate(1000L)
        val half = estimate(5000L)
        assert(tenth > 0 && half > 0, s"estimates absent: $tenth, $half")
        // the estimator must track the band, not emit a constant
        // default: ~10% and ~50% of the registered row count
        assert(tenth >= 500 && tenth <= 1500, s"10% band estimated $tenth")
        assert(half >= 4000 && half <= 6000, s"50% band estimated $half")
        assert(half > tenth * 3, s"selectivity not tracking: $tenth vs $half")
      } finally savedCbo.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
    }
  }

  test("equi-height histograms sharpen SKEWED-column selectivity: " +
      "analyze persists them, reload round-trips, the estimate " +
      "tracks tail mass instead of the uniform interpolation") {
    val root = Files.createTempDirectory("shist").toString
    // 90% of rows hold k = 0; the 10% tail is uniform over 1..1000.
    // True selectivity of k >= 500 is ~5%; min/max + uniformity
    // estimates ~50% — off by 10x, exactly the skew failure mode
    val skew = spark.range(10000).select(
      when(col("id") % 10 =!= 0, lit(0L))
        .otherwise((col("id") / 10) % 1000 + 1).as("k"),
      col("id").as("payload"))
    CatalogStore.commit(spark, root, Map("s" -> skew))
    val snap = CatalogStore.snapshot(spark, root)
    val ts = CatalogStore.analyze(spark, root, snap,
      histCols = Map("s" -> Seq("k")), histBins = 32)
    val h = ts("s").cols("k").hist
    assert(h.isDefined && h.get.bins.size == 32 &&
      math.abs(h.get.height - 10000.0 / 32) < 1.0)
    // most boundaries crowd at the hot value: equi-height, not width
    assert(h.get.bins.count(b => b.lo == 0.0 && b.hi == 0.0) >= 20,
      s"hot-value bins missing: ${h.get.bins.take(5)}")
    // sidecar round-trip: histogram included, nothing recomputed
    ScanStatsCatalog.clear()
    assert(CatalogStore.registerStats(spark, root, snap) == ts)
    // idempotent: a second analyze with the same request re-reads
    assert(CatalogStore.analyze(spark, root, snap,
      histCols = Map("s" -> Seq("k"))) == ts)
    val path = CatalogStore.tablePath(root, "s", snap)
    val savedCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    withRule {
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        def est(): BigInt = CatalogStore.read(spark, root, "s", snap)
          .filter(col("k") >= 500L)
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(BigInt(-1))
        ScanStatsCatalog.register(path, ts("s"))
        val withHist = est()
        // same stats, histogram stripped → uniform interpolation
        ScanStatsCatalog.register(path, ts("s").copy(
          cols = ts("s").cols.map { case (c, cs) =>
            c -> cs.copy(hist = None) }))
        val uniform = est()
        assert(uniform >= 3500 && uniform <= 6500,
          s"uniform baseline should estimate ~50%: $uniform")
        assert(withHist >= 100 && withHist <= 1800,
          s"histogram estimate should be near the ~500-row truth: " +
            s"$withHist")
        assert(withHist * 3 <= uniform,
          s"histogram must sharpen the skew estimate: " +
            s"$withHist vs $uniform")
      } finally savedCbo.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
    }
  }

  test("CatalogStore.analyze persists sidecars; registerStats reloads " +
      "them without re-profiling; injected stats ride CatalogStore.read") {
    val root = Files.createTempDirectory("scat").toString
    CatalogStore.commit(spark, root, Map(
      "f" -> orders.limit(400), "d" -> orders.limit(20)))
    val snap = CatalogStore.snapshot(spark, root)
    val ts = CatalogStore.analyze(spark, root, snap)
    assert(ts("f").rowCount == 400L && ts("d").rowCount == 20L)
    assert(ts("f").sizeInBytes > 0L)
    val okey = ts("f").cols("o_orderkey")
    assert(okey.nulls == 0L && okey.ndv > 0L && okey.min.isDefined)
    // reload from sidecars only — identical values, nothing recomputed
    ScanStatsCatalog.clear()
    val re = CatalogStore.registerStats(spark, root, snap)
    assert(re == ts)
    // the registered path is the immutable version dir, so a catalog
    // read picks the stats up through the rule
    spark.experimental.extraOptimizations = Seq(ScanStatsRule(spark))
    try {
      val st = CatalogStore.read(spark, root, "f", snap)
        .queryExecution.optimizedPlan.stats
      assert(st.sizeInBytes == BigInt(ts("f").sizeInBytes))
    } finally {
      ScanStatsCatalog.clear()
      spark.experimental.extraOptimizations = Nil
    }
    // analyze is idempotent on immutable versions: second call reads
    // the sidecar (values identical)
    assert(CatalogStore.analyze(spark, root, snap) == ts)
  }

  test("var-width byte lengths ride analyze into CatalogColumnStat " +
      "(CBO's row-width feed); fixed-width columns default from type") {
    val root = Files.createTempDirectory("slen").toString
    val df = Seq((1L, "aa"), (2L, "bbbb")).toDF("k", "s")
    CatalogStore.commit(spark, root, Map("t" -> df))
    val snap = CatalogStore.snapshot(spark, root)
    val ts = CatalogStore.analyze(spark, root, snap)
    assert(ts("t").cols("s").avgLen.contains(3L) && // ceil((2+4)/2)
      ts("t").cols("s").maxLen.contains(4L))
    assert(ts("t").cols("k").avgLen.isEmpty &&
      ts("t").cols("k").maxLen.isEmpty)
    // sidecar round-trips the lengths
    ScanStatsCatalog.clear()
    assert(CatalogStore.registerStats(spark, root, snap) == ts)
    // and the rule attaches them to the scan's catalog stats
    withRule {
      val lr = CatalogStore.read(spark, root, "t", snap)
        .queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation => l
        }
      val cst = lr.get.catalogTable.get.stats.get.colStats("s")
      assert(cst.avgLen.contains(3L) && cst.maxLen.contains(4L))
      ScanStatsCatalog.clear()
    }
  }

  test("registerSnapshotViews: reports.json-style SQL replays history " +
      "at a pinned version; suffixed views coexist with current") {
    val root = Files.createTempDirectory("stt").toString
    val v1 = orders.filter(col("o_orderkey") % 2 === 0)
    CatalogStore.commit(spark, root, Map("orders_tt" -> v1))
    CatalogStore.commit(spark, root,
      Map("orders_tt" -> orders.filter(col("o_orderkey") % 4 === 1)))
    try {
      // time travel: the same SQL, the old data
      CatalogStore.registerSnapshotViews(spark, root, Some(1))
      assert(spark.sql("SELECT count(*) AS n FROM orders_tt")
        .head().getLong(0) == v1.count())
      // coexistence: current under the plain name, history suffixed
      CatalogStore.registerSnapshotViews(spark, root)
      CatalogStore.registerSnapshotViews(spark, root, Some(1),
        suffix = "_at_v1")
      val both = spark.sql("""
        SELECT (SELECT count(*) FROM orders_tt) AS cur,
               (SELECT count(*) FROM orders_tt_at_v1) AS old""").head()
      assert(both.getLong(1) == v1.count())
      assert(both.getLong(0) ==
        orders.filter(col("o_orderkey") % 4 === 1).count())
    } finally {
      spark.catalog.dropTempView("orders_tt")
      spark.catalog.dropTempView("orders_tt_at_v1")
    }
  }
}
