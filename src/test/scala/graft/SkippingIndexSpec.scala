package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{CatalogStore, Tables}

/** SQL-transparent data skipping through the registered FileIndex
  * (org.apache.spark.sql.graft.GraftSkippingIndex): plain text SQL
  * over a registered snapshot view must return exactly the plain
  * scan's rows while its scan node opens strictly fewer files — and
  * must NEVER prune on predicates it cannot soundly bound (file-level
  * listing is not re-checked downstream; a wrongly dropped file is
  * silent row loss, the one failure mode this layer cannot have).
  */
class SkippingIndexSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def scanFiles(df: DataFrame): Long =
    graft.plans.PlanMetrics.scanFiles(df)

  test("registered view: SQL WHERE skips files, rows identical, " +
      "unextractable predicates never prune") {
    val root = Files.createTempDirectory("sqlskip").toString
    CatalogStore.commit(spark, root, Map("t" ->
      orders.repartitionByRange(8, col("o_orderkey"))))
    val snap = CatalogStore.snapshot(spark, root)
    // loud without an index — a silently-plain view would read as
    // "skipping works" in any benchmark that never skipped
    intercept[IllegalArgumentException] {
      CatalogStore.registerSkippingView(spark, root, "t", snap, "t_sql")
    }
    CatalogStore.indexTable(spark, root, snap, "t", Seq("o_orderkey"))
    CatalogStore.registerSkippingView(spark, root, "t", snap, "t_sql")
    val hi = orders.agg(percentile_approx(col("o_orderkey"),
      lit(0.12), lit(1000))).head().getLong(0)
    val plain = CatalogStore.read(spark, root, "t", snap)

    // band predicate: pruned listing, identical rows
    val sql = spark.sql(
      s"SELECT * FROM t_sql WHERE o_orderkey <= $hi")
    val want = plain.filter(col("o_orderkey") <= hi)
    assert(sql.exceptAll(want).count() == 0 &&
      want.exceptAll(sql).count() == 0)
    val pruned = scanFiles(sql)
    val full = scanFiles(plain.filter(col("o_orderkey") <= hi))
    assert(full == 8L, s"fixture: plain scan should open 8 files: $full")
    assert(pruned >= 1L && pruned <= 2L,
      s"SQL scan should open <=2 of 8 files: $pruned")

    // conjunct mix: extractable band prunes, modulo rides along
    val mixed = spark.sql(s"SELECT * FROM t_sql WHERE o_orderkey <= " +
      s"$hi AND o_custkey % 2 = 0")
    val wantMixed = plain.filter(col("o_orderkey") <= hi &&
      col("o_custkey") % 2 === 0)
    assert(mixed.exceptAll(wantMixed).count() == 0 &&
      wantMixed.exceptAll(mixed).count() == 0)
    assert(scanFiles(mixed) <= 2L)

    // unextractable-only predicate (OR tree): NO pruning, all files
    val orq = spark.sql(s"SELECT * FROM t_sql WHERE o_orderkey <= " +
      s"$hi OR o_custkey % 2 = 0")
    val wantOr = plain.filter(col("o_orderkey") <= hi ||
      col("o_custkey") % 2 === 0)
    assert(orq.exceptAll(wantOr).count() == 0 &&
      wantOr.exceptAll(orq).count() == 0)
    assert(scanFiles(orq) == 8L,
      "an OR tree must not prune (sound = keep everything)")

    // non-indexed column: no pruning, identical rows
    val np = spark.sql("SELECT * FROM t_sql WHERE o_totalprice < 1000")
    val wantNp = plain.filter(col("o_totalprice") < 1000)
    assert(np.exceptAll(wantNp).count() == 0 &&
      wantNp.exceptAll(np).count() == 0)
    assert(scanFiles(np) == 8L)

    // full-view scan (no WHERE): everything readable
    assert(spark.sql("SELECT count(*) AS n FROM t_sql").head()
      .getLong(0) == plain.count())
    spark.catalog.dropTempView("t_sql")
  }

  test("registered view: LIKE 'prefix%' prunes via the optimizer's " +
      "StartsWith rewrite, rows identical") {
    val root = Files.createTempDirectory("sqllike").toString
    val t = Tables.load(spark, sfDir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_orderkey"))
      .repartitionByRange(8, col("d"))
    CatalogStore.commit(spark, root, Map("t" -> t))
    val snap = CatalogStore.snapshot(spark, root)
    CatalogStore.indexTable(spark, root, snap, "t", Seq("d"))
    CatalogStore.registerSkippingView(spark, root, "t", snap, "t_like")
    val plain = CatalogStore.read(spark, root, "t", snap)
    val sql = spark.sql("SELECT * FROM t_like WHERE d LIKE '1997-03%'")
    val want = plain.filter(col("d").like("1997-03%"))
    assert(sql.exceptAll(want).count() == 0 &&
      want.exceptAll(sql).count() == 0)
    // one month of a ~7-year range over 8 date-partitioned files:
    // the prefix bound must open at most 2 (boundary-straddling)
    assert(scanFiles(spark.sql(
      "SELECT * FROM t_like WHERE d LIKE '1997-03%'")) <= 2L)
    assert(scanFiles(plain.filter(col("d").like("1997-03%"))) == 8L)
    spark.catalog.dropTempView("t_like")
  }

  test("registered view over a HIVE-PARTITIONED layout: partition " +
      "columns survive, partition pruning composes with box skipping") {
    val dir = Files.createTempDirectory("sqlpart").resolve("t").toString
    import org.apache.spark.sql.graft.GraftSkippingIndex
    import graft.operators.Layout
    // 3 partitions x 4 range files each on the data column
    spark.range(1200).select(
      (col("id") % 3).as("p"), col("id").as("k"),
      (col("id") * 2).as("v"))
      .repartitionByRange(4, col("k"))
      .write.partitionBy("p").parquet(dir)
    val idx = Layout.fileIndex(spark, dir, Seq("k"))
      .localCheckpoint(true)
    GraftSkippingIndex.registerView(spark, dir, idx, "t_part")
    val plain = spark.read.parquet(dir)
    // partition column is readable and correct through the view
    val all = spark.sql("SELECT p, k, v FROM t_part")
    assert(all.exceptAll(plain.select("p", "k", "v")).count() == 0 &&
      plain.select("p", "k", "v").exceptAll(all).count() == 0)
    // box skipping on the data column still prunes under partitioning
    val band = spark.sql("SELECT p, k FROM t_part WHERE k < 100")
    val wantBand = plain.filter(col("k") < 100).select("p", "k")
    assert(band.exceptAll(wantBand).count() == 0 &&
      wantBand.exceptAll(band).count() == 0)
    assert(scanFiles(spark.sql(
      "SELECT p, k FROM t_part WHERE k < 100")) <= 4L)
    // partition predicate composes: native partition pruning + boxes
    val both = spark.sql(
      "SELECT p, k FROM t_part WHERE p = 1 AND k < 100")
    val wantBoth = plain.filter(col("p") === 1 && col("k") < 100)
      .select("p", "k")
    assert(both.exceptAll(wantBoth).count() == 0 &&
      wantBoth.exceptAll(both).count() == 0)
    spark.catalog.dropTempView("t_part")
  }

  test("registerSnapshotViews(skipping = true): indexed tables " +
      "upgrade to skipping views, unindexed stay plain, rows exact") {
    val root = Files.createTempDirectory("svskip").toString
    CatalogStore.commit(spark, root, Map(
      "big" -> orders.repartitionByRange(8, col("o_orderkey")),
      "dim" -> orders.limit(50)))
    val snap = CatalogStore.snapshot(spark, root)
    CatalogStore.indexTable(spark, root, snap, "big",
      Seq("o_orderkey"))
    CatalogStore.registerSnapshotViews(spark, root, suffix = "_sv",
      skipping = true)
    val hi = orders.agg(percentile_approx(col("o_orderkey"),
      lit(0.12), lit(1000))).head().getLong(0)
    val sql = spark.sql(s"SELECT * FROM big_sv WHERE o_orderkey <= $hi")
    val want = CatalogStore.read(spark, root, "big", snap)
      .filter(col("o_orderkey") <= hi)
    assert(sql.exceptAll(want).count() == 0 &&
      want.exceptAll(sql).count() == 0)
    assert(scanFiles(spark.sql(
      s"SELECT * FROM big_sv WHERE o_orderkey <= $hi")) <= 2L)
    // the unindexed dim registered plain and reads exactly
    assert(spark.sql("SELECT count(*) AS n FROM dim_sv").head()
      .getLong(0) == 50L)
    spark.catalog.dropTempView("big_sv")
    spark.catalog.dropTempView("dim_sv")
  }
}
