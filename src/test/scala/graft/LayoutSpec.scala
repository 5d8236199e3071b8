package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  test("zValue interleaves bits: dim i's bit b lands at b*n + i") {
    // col0 = 3 (011): bits at z-positions 0, 2 -> 1 + 4 = 5
    // col1 = 5 (101): bits at z-positions 1, 5 -> 2 + 32 = 34
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), bits = 3).as("z"))
      .as[Long].head()
    assert(z == 39L)
  }

  test("quantize clamps, maps max into the top cell, zero-span degenerates") {
    val d = Layout.Dim("v", 0.0, 10.0)
    val got = Seq(-1.0, 0.0, 5.0, 10.0, 11.0).toDF("v")
      .select(Layout.quantize(col("v"), d, bits = 2).as("q"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 2L, 3L, 3L))
    val flat = Seq(7.0).toDF("v")
      .select(Layout.quantize(col("v"), Layout.Dim("v", 7.0, 7.0), 2).as("q"))
      .as[Long].head()
    assert(flat == 0L)
  }

  test("NULL values stay NULL through quantize and zValue; degenerate stats survive") {
    // greatest/least SKIP nulls — without the explicit gate a NULL
    // would land in bucket 0 and z-cluster with real minimum rows
    val d = Layout.Dim("v", 0.0, 10.0)
    val q = Seq(Some(5.0), None).toDF("v")
      .select(Layout.quantize(col("v"), d, bits = 2).as("q"))
      .as[Option[Long]].collect().toSet
    assert(q == Set(Some(2L), None))
    val z = Seq((Some(3L), 5L), (None, 5L)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), 3).as("z"))
      .as[Option[Long]].collect().toSet
    assert(z.contains(None), "a NULL bucket must give a NULL zval")
    // empty table / all-NULL column: stats degenerates instead of
    // crashing (the maintenance path must survive an emptied store)
    val dims = Layout.stats(
      Seq(Option.empty[Double]).toDF("v"), Seq("v"))
    assert(dims == Seq(Layout.Dim("v", 0.0, 0.0)))
    assert(Layout.stats(orders.limit(0), Seq("o_custkey")) ==
      Seq(Layout.Dim("o_custkey", 0.0, 0.0)))
  }

  test("z-ordered files prune a second-dimension predicate; linear sort cannot") {
    val dir = Files.createTempDirectory("zorder")
    val zPath = dir.resolve("z").toString
    val linPath = dir.resolve("lin").toString
    val numFiles = 16
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"),
      bits = 8, numFiles, zPath)
    // the baseline layout: same file count, sorted on the FIRST dim only
    orders.repartitionByRange(numFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(linPath)

    // per-file bounding boxes of the second dimension — what parquet
    // footer min/max pruning sees for a price-only predicate
    def priceBoxes(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .select("lo", "hi").as[(Double, Double)].collect().toSeq

    val (zBoxes, linBoxes) = (priceBoxes(zPath), priceBoxes(linPath))
    assert(zBoxes.size == numFiles && linBoxes.size == numFiles)
    // a mid-range price band: files whose [lo, hi] intersects it must be read
    val span = orders.agg(min("o_totalprice"), max("o_totalprice"))
      .as[(Double, Double)].head()
    // the band sits inside the first-level z split: a band straddling
    // the midpoint is the curve's degenerate case (every half
    // intersects it) and would prove nothing either way
    val (qLo, qHi) = (span._1 + 0.10 * (span._2 - span._1),
      span._1 + 0.20 * (span._2 - span._1))
    def touched(boxes: Seq[(Double, Double)]): Int =
      boxes.count { case (lo, hi) => hi >= qLo && lo <= qHi }
    // linear layout: price is uncorrelated with the sort key, so every
    // file's price box spans ~the full range — nothing prunes
    assert(touched(linBoxes) >= numFiles - 1,
      s"fixture: linear layout must not prune, touched ${touched(linBoxes)}")
    // z-order: contiguous z-ranges have tight price boxes
    assert(touched(zBoxes) <= numFiles / 2,
      s"z-order must skip at least half the files, touched ${touched(zBoxes)}")
    // and the data itself round-trips
    assert(spark.read.parquet(zPath).count() == orders.count())
  }

  test("fileIndex is sound and complete: one row per file, exact boxes, n_rows totals") {
    val path = Files.createTempDirectory("zidx").resolve("t").toString
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"),
      bits = 8, numFiles = 8, path = path)
    val idx = Layout.fileIndex(spark, path, Seq("o_custkey", "o_totalprice"))
      .cache()
    // completeness: every written file indexed, all rows accounted for
    // input_file_name() and _metadata.file_path render the scheme
    // differently (file:/ vs file:///) — normalize before comparing
    def norm(f: String): String = f.replaceFirst("^file:/+", "/")
    val truth = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => (norm(r._1), (r._2, r._3, r._4))).toMap
    val rows = idx.select("file", "n_rows", "min_o_totalprice",
        "max_o_totalprice")
      .as[(String, Long, Double, Double)].collect()
      .map(r => (norm(r._1), r._2, r._3, r._4))
    assert(rows.length == truth.size && rows.length == 8)
    rows.foreach { case (f, n, lo, hi) =>
      val (tn, tlo, thi) = truth(f)
      assert(n == tn && lo == tlo && hi == thi, s"box mismatch for $f")
    }
    assert(rows.map(_._2).sum == orders.count())
  }

  test("prunedRead: lossless vs full scan, empty-band edge, multi-range AND") {
    val path = Files.createTempDirectory("zread").resolve("t").toString
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"),
      bits = 8, numFiles = 8, path = path)
    val idx = Layout.fileIndex(spark, path, Seq("o_custkey", "o_totalprice"))
      .cache()
    def full(rs: Seq[Layout.Range]) = orders.filter(
      rs.map(r => col(r.column) >= r.lo && col(r.column) <= r.hi)
        .reduce(_ && _))
    for (rs <- Seq(
        Seq(Layout.Range("o_totalprice", 50000.0, 120000.0)),
        Seq(Layout.Range("o_custkey", 10.0, 60.0),
          Layout.Range("o_totalprice", 0.0, 200000.0)))) {
      val got = Layout.prunedRead(spark, path, idx, rs)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      assert(got.exceptAll(full(rs)).count() == 0 &&
        full(rs).exceptAll(got).count() == 0, s"lossy for $rs")
    }
    // a band beyond the data: zero files survive, schema intact, no crash
    val none = Layout.prunedRead(spark, path, idx,
      Seq(Layout.Range("o_totalprice", 1e12, 2e12)))
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("o_orderkey", "o_custkey", "o_totalprice"))
  }

  test("prunedRead skips all-NULL files correctly; maxFiles trips loudly") {
    val path = Files.createTempDirectory("znull").resolve("t").toString
    // file 0: real values; file 1: all-NULL metric — min/max index as
    // (NULL, NULL) there, and a range predicate must skip it (NULL
    // never matches a range), with no rows lost
    val df = Seq((1L, Some(10.0)), (2L, Some(20.0)))
      .toDF("id", "v").repartition(1)
    val nulls = Seq((3L, Option.empty[Double]), (4L, Option.empty[Double]))
      .toDF("id", "v").repartition(1)
    df.write.parquet(path)
    nulls.write.mode("append").parquet(path)
    val idx = Layout.fileIndex(spark, path, Seq("v"))
    assert(idx.count() == 2)
    val got = Layout.prunedRead(spark, path, idx,
      Seq(Layout.Range("v", 0.0, 100.0))).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
    val err = intercept[IllegalArgumentException] {
      Layout.prunedRead(spark, path, idx,
        Seq(Layout.Range("v", 0.0, 100.0)), maxFiles = 0)
    }
    assert(err.getMessage.contains("maxRows must be positive"))
    // maxFiles = 1 with a 2-file predicate... only one real file here,
    // so widen: both files survive only if the index kept the null
    // file — it must not, so maxFiles = 1 passes; force the trip with
    // an index that keeps both
    val err2 = intercept[IllegalArgumentException] {
      Layout.prunedRead(spark, path,
        idx.withColumn("min_v", lit(0.0)).withColumn("max_v", lit(50.0)),
        Seq(Layout.Range("v", 0.0, 100.0)), maxFiles = 1)
    }
    assert(err2.getMessage.contains("fall back to the plain filtered scan"))
  }

  test("prunedRead keeps partition columns alive on a partitioned z-ordered table") {
    val path = Files.createTempDirectory("zpart").resolve("t").toString
    val df = orders.withColumn("p", (col("o_orderkey") % 2).cast("int"))
    Layout.zorderWrite(df, Seq("o_custkey", "o_totalprice"), bits = 8,
      numFiles = 8, path = path, partitionBy = Seq("p"))
    val idx = Layout.fileIndex(spark, path, Seq("o_totalprice"))
    val got = Layout.prunedRead(spark, path, idx,
      Seq(Layout.Range("o_totalprice", 50000.0, 120000.0)))
    assert(got.columns.contains("p"), "partition column lost in pruned read")
    val full = df.filter(
      col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 120000.0)
    assert(got.select(df.columns.map(col): _*).exceptAll(full).count() == 0 &&
      full.exceptAll(got.select(df.columns.map(col): _*)).count() == 0)
  }

  test("withHilbert: bijection on the grid and unit-step adjacency (the Hilbert property)") {
    val bits = 3
    val n = 1 << bits
    val grid = spark.range(n.toLong).select(col("id").as("x"))
      .crossJoin(spark.range(n.toLong).select(col("id").as("y")))
    val h = Layout.withHilbert(grid, "x", "y", bits, "d")
      .select("d", "x", "y").as[(Long, Long, Long)].collect().sortBy(_._1)
    // bijection: every index 0..n²-1 hit exactly once
    assert(h.map(_._1).toSeq == (0L until (n.toLong * n)).toSeq)
    // adjacency: consecutive indexes are grid neighbors (|Δ| = 1 in
    // exactly one coordinate) — false for Morton, the entire point
    h.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbertWrite files prune a second-dimension band at least as well as z-order") {
    val dir = Files.createTempDirectory("hilbert")
    val (hPath, zPath) = (dir.resolve("h").toString, dir.resolve("z").toString)
    val numFiles = 16
    Layout.hilbertWrite(orders, "o_custkey", "o_totalprice",
      bits = 8, numFiles, hPath)
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"),
      bits = 8, numFiles, zPath)
    def touched(path: String, qLo: Double, qHi: Double): Int =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .filter(col("hi") >= qLo && col("lo") <= qHi).count().toInt
    val span = orders.agg(min("o_totalprice"), max("o_totalprice"))
      .as[(Double, Double)].head()
    val (qLo, qHi) = (span._1 + 0.10 * (span._2 - span._1),
      span._1 + 0.20 * (span._2 - span._1))
    assert(touched(hPath, qLo, qHi) <= numFiles / 2,
      "hilbert layout must prune the second dimension")
    assert(spark.read.parquet(hPath).count() == orders.count())
  }

  test("compactTo: keeps big files byte-identical, packs small ones, preserves rows") {
    val root = Files.createTempDirectory("compact")
    val (src, dst) = (root.resolve("s").toString, root.resolve("d").toString)
    // 6 tiny fragments + 1 big file (the full table again)
    orders.repartition(6).write.parquet(src)
    orders.repartition(1).write.mode("append").parquet(src)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(p)).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val big = files(src).maxBy(_.getLen)
    val st = Layout.compactTo(spark, src, dst, targetBytes = big.getLen)
    // per-file encoding overhead makes 6 fragments of the table sum
    // to slightly MORE than the single-file encoding of it → 1-2 bins
    assert(st.nIn == 7 && st.kept == 1 && st.packed == 6 &&
      st.bins >= 1 && st.bins <= 2, s"unexpected $st")
    val out = files(dst)
    assert(out.size == 1 + st.bins)
    val kept = out.find(_.getPath.getName == big.getPath.getName)
    assert(kept.exists(_.getLen == big.getLen), "big file must be byte-copied")
    // row multiset preserved (two copies of orders in, two out)
    val read = spark.read.parquet(dst)
    assert(read.count() == 2 * orders.count())
    assert(read.exceptAll(orders.unionAll(orders)).count() == 0)
  }

  test("fileIndexDelta: only new files, union == rebuild, empty delta, cap trips") {
    val path = Files.createTempDirectory("idxd").resolve("t").toString
    orders.limit(500).repartition(3).write.parquet(path)
    val before = Layout.fileIndex(spark, path, Seq("o_custkey"))
      .localCheckpoint(true)
    orders.limit(200).repartition(2).write.mode("append").parquet(path)
    val delta = Layout.fileIndexDelta(spark, path, Seq("o_custkey"), before)
      .localCheckpoint(true)
    assert(delta.count() == 2)
    assert(delta.join(before, Seq("file"), "left_semi").count() == 0)
    val merged = before.unionByName(delta)
    val full = Layout.fileIndex(spark, path, Seq("o_custkey"))
    assert(merged.exceptAll(full).count() == 0 &&
      full.exceptAll(merged).count() == 0)
    assert(Layout.fileIndexDelta(spark, path, Seq("o_custkey"), merged)
      .count() == 0)
    val err = intercept[IllegalArgumentException] {
      Layout.fileIndexDelta(spark, path, Seq("o_custkey"),
        before.limit(0), maxFiles = 3)
    }
    assert(err.getMessage.contains("exceed"))
  }

  test("compactTo refuses a partitioned layout loudly instead of no-opping") {
    val root = Files.createTempDirectory("compactp")
    val src = root.resolve("s").toString
    orders.withColumn("p", (col("o_orderkey") % 2).cast("int"))
      .write.partitionBy("p").parquet(src)
    val err = intercept[IllegalArgumentException] {
      Layout.compactTo(spark, src, root.resolve("d").toString, 1L << 20)
    }
    assert(err.getMessage.contains("partition directories"))
  }

  test("compactTo refuses a MIXED layout (top-level files AND subdirs) — no silent row loss") {
    val root = Files.createTempDirectory("compactm")
    val src = root.resolve("s")
    // top-level files …
    orders.limit(10).coalesce(1).write.parquet(src.toString)
    // … plus a data subdirectory whose rows a flat compact would drop
    orders.limit(5).coalesce(1).write.parquet(src.resolve("p=1").toString)
    val err = intercept[IllegalArgumentException] {
      Layout.compactTo(spark, src.toString, root.resolve("d").toString,
        1L << 20)
    }
    assert(err.getMessage.contains("partition directories"))
  }

  test("fileIndexDelta sees files nested under partition dirs") {
    val path = Files.createTempDirectory("idxp").resolve("t").toString
    val df = orders.withColumn("p", (col("o_orderkey") % 2).cast("int"))
    df.filter(col("o_orderkey") % 3 =!= 0)
      .write.partitionBy("p").parquet(path)
    val before = Layout.fileIndex(spark, path, Seq("o_totalprice"))
      .localCheckpoint(true)
    assert(before.count() > 0)
    df.filter(col("o_orderkey") % 3 === 0)
      .write.mode("append").partitionBy("p").parquet(path)
    val delta = Layout.fileIndexDelta(spark, path, Seq("o_totalprice"), before)
      .localCheckpoint(true)
    assert(delta.count() > 0, "delta must find the appended partitioned files")
    val merged = before.unionByName(delta)
    val full = Layout.fileIndex(spark, path, Seq("o_totalprice"))
    assert(merged.exceptAll(full).count() == 0 &&
      full.exceptAll(merged).count() == 0)
  }

  test("zorder refuses a colliding z-column name; zorderWrite survives user 'zval'") {
    intercept[IllegalArgumentException] {
      Layout.zorder(orders.withColumn("zval", lit(1L)),
        Seq("o_custkey"), 4)
    }
    // the write path's internal name cannot collide with user data —
    // a pre-existing zval column comes back intact
    val dir = Files.createTempDirectory("zcol").resolve("t").toString
    val withZval = orders.withColumn("zval", col("o_orderkey") * 2)
    Layout.zorderWrite(withZval, Seq("o_custkey", "o_totalprice"),
      bits = 4, numFiles = 2, dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("zval"))
    assert(back.filter(col("zval") =!= col("o_orderkey") * 2).count() == 0)
  }

  test("zorder is deterministic") {
    val a = Layout.zorder(orders, Seq("o_custkey", "o_totalprice"), 8)
      .select("o_orderkey", "zval").as[(Long, Long)].collect().toSet
    val b = Layout.zorder(orders, Seq("o_custkey", "o_totalprice"), 8)
      .select("o_orderkey", "zval").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("deletion vector: readWithDv == predicate-filtered table; empty vector reads all") {
    val src = Files.createTempDirectory("dv").resolve("t").toString
    orders.repartition(4).write.parquet(src)
    val pred = col("o_custkey") % 10 === 3
    val dv = Layout.deletionVector(spark, src, pred).localCheckpoint(true)
    assert(dv.count() > 0 &&
      dv.count() == orders.filter(pred).count())
    val read = Layout.readWithDv(spark, src, dv)
    val want = orders.filter(!pred)
    assert(read.exceptAll(want).count() == 0 &&
      want.exceptAll(read).count() == 0)
    assert(read.columns.toSeq == orders.columns.toSeq,
      "address columns must not leak")
    val empty = dv.filter(lit(false))
    assert(Layout.readWithDv(spark, src, empty).count() == orders.count())
  }

  test("mergeDv accumulates; re-deleting an already-vectored row is a no-op") {
    val src = Files.createTempDirectory("dvm").resolve("t").toString
    orders.repartition(3).write.parquet(src)
    val dv1 = Layout.deletionVector(spark, src, col("o_orderkey") % 7 === 0)
    val dv2 = Layout.deletionVector(spark, src, col("o_orderkey") % 7 === 1)
    val merged = Layout.mergeDv(dv1, dv2)
    assert(merged.count() == dv1.count() + dv2.count())
    // overlap: dv1 re-merged changes nothing
    assert(Layout.mergeDv(merged, dv1).count() == merged.count())
    val read = Layout.readWithDv(spark, src, merged)
    val want = orders.filter(col("o_orderkey") % 7 > 1)
    assert(read.exceptAll(want).count() == 0 &&
      want.exceptAll(read).count() == 0)
  }

  test("materializeDv: clean files byte-identical, dst == readWithDv, counts honest") {
    val root = Files.createTempDirectory("dvmat")
    val (src, dst) = (root.resolve("s").toString, root.resolve("d").toString)
    // isolate the vectored rows in SOME files: write key-partitioned
    // ranges so a key-range predicate dirties only its files
    orders.repartitionByRange(4, col("o_orderkey")).write.parquet(src)
    val lo = orders.agg(min("o_orderkey")).head().getLong(0)
    val pred = col("o_orderkey") <= lo + 50
    val dv = Layout.deletionVector(spark, src, pred).localCheckpoint(true)
    val st = Layout.materializeDv(spark, src, dv, dst)
    assert(st.nIn == 4 && st.rewritten >= 1 && st.kept >= 1 &&
      st.kept + st.rewritten == 4, s"unexpected $st")
    assert(st.dropped == dv.count())
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(p)).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> f.getLen).toMap
    val srcFiles = files(src)
    val kept = files(dst).filter { case (n, _) => srcFiles.contains(n) }
    assert(kept.size == st.kept)
    kept.foreach { case (n, len) =>
      assert(len == srcFiles(n), s"clean file $n must be byte-copied") }
    val out = spark.read.parquet(dst)
    val want = Layout.readWithDv(spark, src, dv)
    assert(out.exceptAll(want).count() == 0 &&
      want.exceptAll(out).count() == 0)
  }

  test("keyIndex + pointLookup: row-identical to the full filtered scan") {
    val root = Files.createTempDirectory("pidx")
    val tmp = root.resolve("t").toString
    // hash-scatter on the OTHER key so every file spans the probe key
    orders.repartition(4, col("o_custkey")).write.parquet(tmp)
    val idx = Layout.keyIndex(spark, tmp, "o_orderkey")
    // index is a TABLE keyed by o_orderkey with a sorted file array
    assert(idx.columns.toSeq == Seq("o_orderkey", "files"))
    assert(idx.count() == orders.select("o_orderkey").distinct().count())
    val probes = orders.filter(col("o_orderkey") % 101 === 0)
      .select("o_orderkey").distinct().collect().map(_.getLong(0)).toSeq
    val got = Layout.pointLookup(spark, tmp, idx, "o_orderkey", probes)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val want = orders.filter(col("o_orderkey").isin(probes: _*))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    // a probe no row carries returns empty, not an error
    assert(Layout.pointLookup(spark, tmp, idx, "o_orderkey",
      Seq(-1L)).count() == 0)
    // empty probe set is a contract violation, loudly
    intercept[IllegalArgumentException] {
      Layout.pointLookup(spark, tmp, idx, "o_orderkey", Seq.empty)
    }
  }

  test("compactPartitioned: per-dir bins, cold-dir byte copy, multi-level " +
      "recursion, loud mixed/non-hive rejection") {
    val root = Files.createTempDirectory("cpart")
    val (src, dst) = (root.resolve("s").toString, root.resolve("d").toString)
    // two-level partitioning: a=0/b=0, a=0/b=1, a=1/b=0 fragmented;
    // a=1/b=1 written once (cold)
    val base = orders.withColumn("a", (col("o_orderkey") % 2).cast("int"))
      .withColumn("b", (col("o_custkey") % 2).cast("int"))
    base.filter(col("a") === 0 || col("b") === 0)
      .repartition(6).write.partitionBy("a", "b").parquet(src)
    base.filter(col("a") === 1 && col("b") === 1)
      .repartition(1).write.mode("append").partitionBy("a", "b")
      .parquet(src)
    val st = Layout.compactPartitioned(spark, src, dst,
      targetBytes = 1L << 21, minSmallFiles = 2)
    assert(st.partitions == 4 && st.compacted == 3 &&
      st.skippedDirs == 1, s"unexpected $st")
    assert(st.files.nIn == st.files.kept + st.files.packed)
    // cold leaf byte-copied: same name, same length
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(p)).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> f.getLen).toMap
    assert(files(s"$dst/a=1/b=1") == files(s"$src/a=1/b=1"))
    // row-identical read, partition values intact
    val (sr, dr) = (spark.read.parquet(src), spark.read.parquet(dst))
    assert(dr.exceptAll(sr).count() == 0 && sr.exceptAll(dr).count() == 0)
    // hot dirs shrank
    assert(files(s"$dst/a=0/b=0").size < files(s"$src/a=0/b=0").size)
    // non-hive subdir rejected
    val bad = root.resolve("bad").toString
    orders.limit(5).repartition(1).write.parquet(s"$bad/notapartition")
    val e = intercept[IllegalArgumentException] {
      Layout.compactPartitioned(spark, bad, root.resolve("bd").toString,
        1L << 21)
    }
    assert(e.getMessage.contains("non-hive"))
  }

  test("keyIndexDelta folds through mergeKeyIndex to exactly a rebuild") {
    val root = Files.createTempDirectory("pidxd")
    val tmp = root.resolve("t").toString
    orders.filter(col("o_orderkey") % 2 === 0)
      .repartition(3, col("o_custkey")).write.parquet(tmp)
    val idx0 = Layout.keyIndex(spark, tmp, "o_orderkey")
      .localCheckpoint(true)
    // nothing new → empty delta with the index schema
    val none = Layout.keyIndexDelta(spark, tmp, "o_orderkey", idx0)
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("o_orderkey", "files"))
    // append files carrying BOTH fresh keys and keys the index knows
    // (odd keys are new; re-appended even keys must union file sets)
    orders.filter(col("o_orderkey") % 3 === 0)
      .repartition(2).write.mode("append").parquet(tmp)
    val delta = Layout.keyIndexDelta(spark, tmp, "o_orderkey", idx0)
    val merged = Layout.mergeKeyIndex(idx0, delta)
    val rebuilt = Layout.keyIndex(spark, tmp, "o_orderkey")
    assert(merged.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(merged).count() == 0)
    // idempotent: folding the same delta twice changes nothing
    val again = Layout.mergeKeyIndex(merged, delta)
    assert(again.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(again).count() == 0)
  }

  test("bloomIndex + bloomLookup: exact results, append delta unions to " +
      "a rebuild, loud empty-probe") {
    val root = Files.createTempDirectory("bidx")
    val tmp = root.resolve("t").toString
    orders.filter(col("o_orderkey") % 2 === 0)
      .repartition(4, col("o_custkey")).write.parquet(tmp)
    val nPerFile = math.max(1024L, orders.count() / 4)
    val idx = Layout.bloomIndex(spark, tmp, "o_orderkey", nPerFile)
      .localCheckpoint(true)
    assert(idx.columns.toSeq == Seq("file", "bloom") && idx.count() == 4)
    val probes = orders.filter(col("o_orderkey") % 101 === 0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val got = Layout.bloomLookup(spark, tmp, idx, "o_orderkey", probes)
    val want = orders.filter(col("o_orderkey") % 2 === 0 &&
      col("o_orderkey").isin(probes: _*))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    // absent key: residual filter guarantees zero ROWS regardless of
    // which files a false positive opens
    assert(Layout.bloomLookup(spark, tmp, idx, "o_orderkey",
      Seq(-1L)).count() == 0)
    intercept[IllegalArgumentException] {
      Layout.bloomLookup(spark, tmp, idx, "o_orderkey", Seq.empty)
    }
    // append maintenance: delta covers ONLY new files; deterministic
    // sketches make union ≡ rebuild BIT-exact
    val none = Layout.bloomIndexDelta(spark, tmp, "o_orderkey", idx,
      nPerFile)
    assert(none.count() == 0)
    orders.filter(col("o_orderkey") % 2 === 1)
      .repartition(2).write.mode("append").parquet(tmp)
    val delta = Layout.bloomIndexDelta(spark, tmp, "o_orderkey", idx,
      nPerFile)
    assert(delta.count() == 2)
    val merged = idx.unionByName(delta)
    val rebuilt = Layout.bloomIndex(spark, tmp, "o_orderkey", nPerFile)
    assert(merged.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(merged).count() == 0)
  }

  test("repairKeyIndex after an in-place rewrite: drop vanished, keep " +
      "survivors, scan only new — equals a rebuild") {
    val root = Files.createTempDirectory("kidxrep")
    val tmp = root.resolve("t").toString
    // 40 fragments + one well-sized file; compaction keeps the big
    // one under its own name and re-packs the rest
    orders.repartition(40).write.parquet(tmp)
    orders.repartition(1).write.mode("append").parquet(tmp)
    val idx0 = Layout.keyIndex(spark, tmp, "o_orderkey")
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val big = fs.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .maxBy(_.getLen)
    graft.sources.AnalysisStore.stageAndSwap(spark, tmp) { staging =>
      Layout.compactTo(spark, tmp, staging, targetBytes = big.getLen)
    }
    val repaired = Layout.repairKeyIndex(spark, tmp, "o_orderkey", idx0)
    val rebuilt = Layout.keyIndex(spark, tmp, "o_orderkey")
    assert(repaired.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(repaired).count() == 0)
    // the kept file's entries really survived the repair verbatim
    val keptName = big.getPath.getName
    assert(repaired.filter(array_contains(col("files"),
      Layout.normFile(big.getPath.toString))).count() > 0,
      s"kept file $keptName must still be indexed")
  }

  test("repairBloomIndex after a rewrite equals a rebuild bit-exactly") {
    val root = Files.createTempDirectory("bidxrep")
    val tmp = root.resolve("t").toString
    orders.repartition(6).write.parquet(tmp)
    orders.limit(2000).repartition(1).write.mode("append").parquet(tmp)
    val nPerFile = math.max(1024L, orders.count() / 4)
    val idx0 = Layout.bloomIndex(spark, tmp, "o_orderkey", nPerFile)
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val big = fs.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .maxBy(_.getLen)
    graft.sources.AnalysisStore.stageAndSwap(spark, tmp) { staging =>
      Layout.compactTo(spark, tmp, staging, targetBytes = big.getLen)
    }
    val repaired = Layout.repairBloomIndex(spark, tmp, "o_orderkey",
      idx0, nPerFile)
    val rebuilt = Layout.bloomIndex(spark, tmp, "o_orderkey", nPerFile)
    assert(repaired.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(repaired).count() == 0)
  }

  test("fileIndex on STRING columns: native lexicographic boxes, " +
      "pruned read lossless and non-vacuous, delta == rebuild") {
    val root = Files.createTempDirectory("strskip")
    val src = root.resolve("t").toString
    val days = orders.select(
      concat(lit("199"), (col("o_orderkey") % 5).cast("string"),
        lit("-06-15")).as("d"),
      col("o_orderkey"), col("o_totalprice"))
    days.repartitionByRange(5, col("d")).write.parquet(src)
    val idx = Layout.fileIndex(spark, src, Seq("d"))
      .localCheckpoint(true)
    // the string column indexes natively — a double cast would null it
    assert(idx.schema("min_d").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(idx.filter(col("min_d").isNull).count() == 0)
    val band = Seq(Layout.StrRange("d", "1991-01-01", "1992-12-31"))
    val got = Layout.prunedRead(spark, src, idx, band)
    val want = days.filter(col("d") >= "1991-01-01" &&
      col("d") <= "1992-12-31")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    // non-vacuous: the two-year band keeps fewer than all files
    val survivors = idx.filter(col("max_d") >= "1991-01-01" &&
      col("min_d") <= "1992-12-31").count()
    assert(survivors < 5 && survivors >= 1, s"survivors=$survivors")
    // append maintenance agrees with a rebuild on the string box
    days.filter(col("o_orderkey") % 7 === 0).repartition(1)
      .write.mode("append").parquet(src)
    val merged = idx.unionByName(
      Layout.fileIndexDelta(spark, src, Seq("d"), idx))
    val rebuilt = Layout.fileIndex(spark, src, Seq("d"))
    assert(merged.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(merged).count() == 0)
  }

  test("bloomIndex on STRING keys: xxhash64 canonicalization both " +
      "sides, lookup == full scan, delta == rebuild") {
    val root = Files.createTempDirectory("bstr")
    val src = root.resolve("t").toString
    orders.select(concat(lit("u-"), col("o_orderkey").cast("string"))
        .as("k"), col("o_custkey"))
      .repartition(6, col("o_custkey")).write.parquet(src)
    val idx = Layout.bloomIndex(spark, src, "k", 4096).localCheckpoint(true)
    val probeKeys = orders.limit(5).collect() // collect-bound: 5 rows
      .map(r => "u-" + r.getLong(0)).toSeq
    val got = Layout.bloomLookup(spark, src, idx, "k", probeKeys)
    val want = spark.read.parquet(src).filter(col("k").isin(probeKeys: _*))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    assert(got.count() == 5)
    // a single probe opens far fewer than all 6 files
    assert(Layout.bloomProbeFiles(spark, src, idx, "k",
      Seq(probeKeys.head)).size <= 2)
    // absent probe: sketch may false-positive files, residual filter
    // still returns zero rows
    assert(Layout.bloomLookup(spark, src, idx, "k",
      Seq("u-no-such-key")).count() == 0)
    // append delta folds to exactly a rebuild (deterministic hash)
    orders.select(concat(lit("v-"), col("o_orderkey").cast("string"))
        .as("k"), col("o_custkey"))
      .limit(100).repartition(1).write.mode("append").parquet(src)
    val merged = idx.unionByName(
      Layout.bloomIndexDelta(spark, src, "k", idx, 4096))
    val rebuilt = Layout.bloomIndex(spark, src, "k", 4096)
    assert(merged.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(merged).count() == 0)
  }

  test("materializeDvPartitioned: cold partitions byte-copy whole, " +
      "dirty ones rewrite selectively, dst == readWithDv") {
    val root = Files.createTempDirectory("dvpart")
    val (src, dst) = (root.resolve("s").toString, root.resolve("d").toString)
    // hive-partitioned on a derived bucket; 2 files per partition so
    // selectivity is visible WITHIN a dirty partition too
    orders.withColumn("b", col("o_custkey") % 4)
      .repartitionByRange(2, col("o_orderkey"))
      .write.partitionBy("b").parquet(src)
    val target = orders.agg(min("o_custkey")).head().getLong(0)
    val dv = Layout.deletionVector(spark, src,
      col("o_custkey") === target).localCheckpoint(true)
    assert(dv.count() > 0)
    val st = Layout.materializeDvPartitioned(spark, src, dv, dst)
    assert(st.partitions == 4, s"unexpected $st")
    assert(st.touched == 1, s"one customer lives in one bucket: $st")
    assert(st.files.dropped == dv.count())
    assert(st.files.kept + st.files.rewritten == st.files.nIn)
    // cold partitions are byte-identical copies
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> f.getLen).toMap
    val coldBuckets = (0L until 4L)
      .filterNot(_ == target % 4)
    coldBuckets.foreach { b =>
      assert(files(s"$src/b=$b") == files(s"$dst/b=$b"),
        s"cold partition b=$b must byte-copy")
    }
    // result == the vector-subtracted read, partition column included
    val out = spark.read.parquet(dst)
    val want = Layout.readWithDv(spark, src, dv)
    assert(out.columns.sorted.toSeq == want.columns.sorted.toSeq)
    val o = out.select(want.columns.map(col): _*)
    assert(o.exceptAll(want).count() == 0 &&
      want.exceptAll(o).count() == 0)
    assert(out.filter(col("o_custkey") === target).count() == 0)
    // a flat layout delegates instead of refusing
    val flatSrc = root.resolve("f").toString
    val flatDst = root.resolve("fd").toString
    orders.repartition(2).write.parquet(flatSrc)
    val fdv = Layout.deletionVector(spark, flatSrc,
      col("o_custkey") === target).localCheckpoint(true)
    val fst = Layout.materializeDvPartitioned(spark, flatSrc, fdv, flatDst)
    assert(fst.partitions == 1 && fst.touched == 1)
    assert(spark.read.parquet(flatDst)
      .filter(col("o_custkey") === target).count() == 0)
    // stale vectors refuse loudly here too
    val alien = Seq(("/nowhere/else.parquet", 0L)).toDF("file", "pos")
    val e = intercept[IllegalArgumentException] {
      Layout.materializeDvPartitioned(spark, src, alien,
        root.resolve("d2").toString)
    }
    assert(e.getMessage.contains("stale vector"))
  }

  test("materializeDv refuses stale vectors and partitioned layouts loudly") {
    val root = Files.createTempDirectory("dvbad")
    val src = root.resolve("s").toString
    orders.repartition(2).write.parquet(src)
    val alien = Seq(("/nowhere/else.parquet", 0L)).toDF("file", "pos")
    val e1 = intercept[IllegalArgumentException] {
      Layout.materializeDv(spark, src, alien, root.resolve("d1").toString)
    }
    assert(e1.getMessage.contains("stale vector"))
    val part = root.resolve("p").toString
    orders.withColumn("b", col("o_orderkey") % 2)
      .write.partitionBy("b").parquet(part)
    val e2 = intercept[IllegalArgumentException] {
      Layout.materializeDv(spark, part,
        alien.filter(lit(false)), root.resolve("d2").toString)
    }
    assert(e2.getMessage.contains("partition"))
  }

  test("readWithDv refuses a stale vector after the table was rewritten " +
      "— no silent resurrection of erased rows") {
    val src = Files.createTempDirectory("dvstale").resolve("t").toString
    orders.repartition(3).write.parquet(src)
    val pred = col("o_custkey") % 10 === 3
    val dv = Layout.deletionVector(spark, src, pred).localCheckpoint(true)
    assert(dv.count() > 0)
    // rewrite the table in place: same rows, NEW file names — the
    // vector's (file, pos) addresses now bind to nothing
    graft.sources.AnalysisStore.stageAndSwap(spark, src) { staging =>
      spark.read.parquet(src).repartition(2).write.parquet(staging)
    }
    val e = intercept[IllegalArgumentException] {
      Layout.readWithDv(spark, src, dv)
    }
    assert(e.getMessage.contains("stale vector"))
    // a FRESH vector over the rewritten table reads correctly
    val fresh = Layout.deletionVector(spark, src, pred)
    assert(Layout.readWithDv(spark, src, fresh).count() ==
      orders.filter(!pred).count())
  }

  test("bloom probes cast to the key's type: a mismatched literal type " +
      "cannot false-negative; unrepresentable probes fail loudly") {
    val root = Files.createTempDirectory("bidxt")
    val tmp = root.resolve("t").toString
    orders.limit(2000)
      .withColumn("ks", col("o_orderkey").cast("string"))
      .repartition(3).write.parquet(tmp)
    val idx = Layout.bloomIndex(spark, tmp, "ks", 4096)
      .localCheckpoint(true)
    val keys = spark.read.parquet(tmp).select("o_orderkey")
      .limit(5).collect().map(_.getLong(0)).toSeq
    // LONG probes against the STRING key: the build hashed "5", a raw
    // lit(5L) hashes different bytes — the cast makes them identical,
    // so every matching row must come back
    val got = Layout.bloomLookup(spark, tmp, idx, "ks", keys)
    assert(got.count() == keys.size.toLong,
      s"typed probes must not skip matching files (got ${got.count()})")
    // a probe the key's type cannot represent fails loudly (ANSI cast
    // error or the explicit representability check) instead of
    // silently probing garbage bytes
    val idxL = Layout.bloomIndex(spark, tmp, "o_orderkey", 4096)
    intercept[Exception] {
      Layout.bloomProbeFiles(spark, tmp, idxL, "o_orderkey", Seq("abc"))
    }
  }

  test("autoPrunedRead: extraction is conservative and residual-correct " +
      "(mixed/one-sided/string/flipped/no-extraction predicates)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("autoskip").resolve("t").toString
    val df = spark.range(1000).select(
      col("id").as("k"),
      (col("id") % 97).cast("double").as("v"),
      date_format(
        date_add(lit("2024-01-01").cast("date"),
          (col("id") % 365).cast("int")), "yyyy-MM-dd").as("d"))
    df.repartitionByRange(10, col("k")).write.parquet(tmp)
    val idx = Layout.fileIndex(spark, tmp, Seq("k", "d"))
      .localCheckpoint(true)
    def plain(p: org.apache.spark.sql.Column) =
      spark.read.parquet(tmp).filter(p)
    def same(p: org.apache.spark.sql.Column): Unit = {
      val a = Layout.autoPrunedRead(spark, tmp, idx, p)
      assert(a.exceptAll(plain(p)).count() == 0 &&
        plain(p).exceptAll(a).count() == 0, s"row drift for $p")
    }
    // two-sided numeric band on the range-partitioned key: prunes hard
    val band = col("k") >= 100 && col("k") <= 199
    assert(Layout.autoPruneFiles(spark, tmp, idx, band).exists(_.size <= 2))
    same(band)
    // flipped operand order (lit < col) extracts the same lo-bound
    val flipped = lit(900L) < col("k")
    assert(Layout.autoPruneFiles(spark, tmp, idx, flipped).exists(_.size <= 2))
    same(flipped)
    // string bounds compare natively (date strings order like dates)
    val str = col("d") >= "2024-12-01" && col("d") <= "2024-12-31"
    assert(Layout.autoPruneFiles(spark, tmp, idx, str).isDefined)
    same(str)
    // unextractable conjunct rides along: pruning from `k` only,
    // modulo re-applied on survivors
    same(col("k") >= 100 && col("k") <= 199 && col("k") % 7 === 0)
    // equality
    same(col("k") === 500L)
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("k") === 500L).exists(_.size == 1))
    // IN-list: the [min, max] envelope prunes; rows exact either way
    same(col("k").isin(5L, 900L, 907L))
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("k").isin(905L, 907L)).exists(_.size == 1))
    // IN-list with an unconvertible element contributes nothing
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("k").isin(905L, "x")).isEmpty)
    // nothing extractable: None (NOT empty-file-list), plain scan
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("v") > 50.0 || col("k") < 10).isEmpty) // top-level OR
    same(col("v") > 50.0 || col("k") < 10)
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("k") % 2 === 0).isEmpty)
    // unindexed column contributes nothing; indexed one still prunes
    val mixedCols = col("v") <= 10.0 && col("k") >= 900
    assert(Layout.autoPruneFiles(spark, tmp, idx, mixedCols)
      .exists(_.size <= 2))
    same(mixedCols)
    // coercion wrapping the ATTRIBUTE side (string column compared
    // as numeric) yields no bound — the conservative direction
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("d") >= 5).isEmpty)
    // prefix LIKE on the string dimension: [prefix, successor) bound,
    // rows exact (the successor is exclusive-used-inclusively)
    same(col("d").like("2024-07%"))
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("d").like("2024-07%")).isDefined)
    // non-prefix patterns (leading %, inner _ wildcard) contribute
    // nothing — a guessed bound on those would be UNsound
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("d").like("%07-01")).isEmpty)
    assert(Layout.autoPruneFiles(spark, tmp, idx,
      col("d").like("2024_07%")).isEmpty)
    // disjoint band: zero survivors, empty result (k is never null)
    assert(Layout.autoPrunedRead(spark, tmp, idx,
      col("k") > 5000L).count() == 0)
  }

  test("pruning soundness edges: NaN boxes, float-literal widening, " +
      "custom LIKE escape, non-BMP string order") {
    val root = Files.createTempDirectory("soundskip")
    val tmp = root.resolve("t").toString
    // file A: plain doubles; file B: holds NaN, so its max box is NaN
    Seq((1L, 2.0f, 5.0), (2L, 1.1f, 8.0)).toDF("id", "f", "v")
      .repartition(1).write.parquet(tmp)
    Seq((3L, 9.5f, Double.NaN), (4L, 3.3f, 7.0)).toDF("id", "f", "v")
      .repartition(1).write.mode("append").parquet(tmp)
    val idx = Layout.fileIndex(spark, tmp, Seq("f", "v"))
      .localCheckpoint(true)
    def plain(p: org.apache.spark.sql.Column) =
      spark.read.parquet(tmp).filter(p)
    def same(p: org.apache.spark.sql.Column): Unit = {
      val a = Layout.autoPrunedRead(spark, tmp, idx, p)
      assert(a.exceptAll(plain(p)).count() == 0 &&
        plain(p).exceptAll(a).count() == 0, s"row drift for $p")
    }
    // a NaN-max box must not fail lo-bounds (NaN is GREATEST in
    // Spark's order): v >= 6 matches rows in BOTH files — before the
    // fix, Java NaN >= 6.0 = false dropped file B and lost row 4
    same(col("v") >= 6.0)
    assert(Layout.autoPruneFiles(spark, tmp, idx, col("v") >= 6.0)
      .exists(_.size == 2))
    // NaN literal equality matches exactly the NaN rows
    same(col("v") === lit(Double.NaN))
    // float literal widens like the cast (1.1f -> 1.100000023841858),
    // NOT via decimal string parsing (1.1000000000000001) — the
    // string-parsed bound excluded the file holding exactly 1.1f
    same(col("f") === 1.1f)
    assert(Layout.autoPruneFiles(spark, tmp, idx, col("f") === 1.1f)
      .exists(_.size == 1))

    val tmp2 = root.resolve("s").toString
    Seq((1L, "ab#cdX"), (2L, "ab#cdY")).toDF("id", "s")
      .repartition(1).write.parquet(tmp2)
    Seq((3L, "zz"), (4L, "😀hi")).toDF("id", "s")
      .repartition(1).write.mode("append").parquet(tmp2)
    val idx2 = Layout.fileIndex(spark, tmp2, Seq("s"))
      .localCheckpoint(true)
    def plain2(p: org.apache.spark.sql.Column) =
      spark.read.parquet(tmp2).filter(p)
    def same2(p: org.apache.spark.sql.Column): Unit = {
      val a = Layout.autoPrunedRead(spark, tmp2, idx2, p)
      assert(a.exceptAll(plain2(p)).count() == 0 &&
        plain2(p).exceptAll(a).count() == 0, s"row drift for $p")
    }
    // a custom ESCAPE char changes the pattern's meaning: the raw
    // body is NOT a prefix ('ab##cd%' ESCAPE '#' matches 'ab#cd…'),
    // so extraction must yield nothing and rows stay exact
    val esc = expr("s LIKE 'ab##cd%' ESCAPE '#'")
    assert(Layout.autoPruneFiles(spark, tmp2, idx2, esc).isEmpty)
    same2(esc)
    // non-BMP: supplementary chars sort ABOVE U+FFFD in UTF-8 (the
    // executor's order) but BELOW it in UTF-16 — the Java-order
    // driver compare dropped the emoji file on s >= '�'
    same2(col("s") >= "�")
    assert(Layout.autoPruneFiles(spark, tmp2, idx2,
      col("s") >= "�").exists(_.nonEmpty))
    // a prefix ending in surrogates keeps only the lo side — and
    // stays row-exact
    same2(col("s").like("😀%"))
  }
}
