package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CatalogStore
import graft.sources.CatalogStore.Constraint

/** Column rename via version-stamped catalog mapping — the Iceberg
  * "rename without rewrite" answer over immutable version dirs: a
  * metadata-only commit records (atVersion, table, from, to); reads
  * project OLDER versions' physical names to the logical name,
  * versions written after the rename carry it in their bytes, and
  * time travel to a pre-rename catalog serves the old name.
  */
class CatalogRenameSpec extends SparkSpec {

  import spark.implicits._

  test("rename is metadata-only; reads map old bytes; time travel " +
      "serves the old name; SQL surface follows") {
    val root = Files.createTempDirectory("ren").toString
    val base = Seq((1, 10L), (2, 20L)).toDF("k", "cents")
    CatalogStore.commit(spark, root, Map("t" -> base))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytesBefore = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "t/v=1"))
      .filter(_.isFile).map(s => s.getPath.getName -> s.getLen).toMap
    val tx = CatalogStore.renameColumn(spark, root, "t",
      "cents", "amount_cents")
    assert(tx.version.contains(2))
    // METADATA-ONLY: no new table version, v=1's files byte-untouched
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "t/v=2")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, "t/v=1"))
      .filter(_.isFile).map(s => s.getPath.getName -> s.getLen).toMap
      == bytesBefore)
    // current read serves the NEW name over the OLD bytes
    val snap = CatalogStore.snapshot(spark, root)
    assert(snap.tables == Map("t" -> 1))
    assertSameRows(CatalogStore.read(spark, root, "t", snap),
      Seq((1, 10L), (2, 20L)).toDF("k", "amount_cents"))
    // time travel: the pre-rename catalog serves the old name
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root, Some(1))), base)
    // the SQL surface follows with zero query rewrite
    try {
      CatalogStore.registerSnapshotViews(spark, root, suffix = "_r")
      assert(spark.sql("SELECT sum(amount_cents) AS s FROM t_r")
        .collect()(0).getLong(0) == 30L)
    } finally spark.catalog.dropTempView("t_r")
  }

  test("rename chains across physical generations; commits after the " +
      "rename carry the new name; schema contract speaks logical") {
    val root = Files.createTempDirectory("reng").toString
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, 10L)).toDF("k", "a")))
    CatalogStore.renameColumn(spark, root, "t", "a", "b")
    // a commit AFTER the rename must carry the new name (the staged
    // bytes are a new physical generation)
    intercept[CatalogStore.SchemaEvolutionException] {
      CatalogStore.commit(spark, root,
        Map("t" -> Seq((2, 20L)).toDF("k", "a")))
    }
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((2, 20L)).toDF("k", "b")))
    // second rename applies across BOTH physical generations
    CatalogStore.renameColumn(spark, root, "t", "b", "c")
    assertSameRows(
      CatalogStore.read(spark, root, "t",
        CatalogStore.snapshot(spark, root)),
      Seq((2, 20L)).toDF("k", "c"))
    // generation 1 (physical `a`) through the full chain a->b->c
    val mid = CatalogStore.snapshot(spark, root, Some(2))
    assertSameRows(CatalogStore.read(spark, root, "t", mid),
      Seq((1, 10L)).toDF("k", "b"))
    // DML after renames reads and writes the logical name
    CatalogStore.upsertTable(spark, root, "t",
      Seq((1, 11L), (3, 30L)).toDF("k", "c"), Seq("k"))
    assertSameRows(
      CatalogStore.read(spark, root, "t",
        CatalogStore.snapshot(spark, root)),
      Seq((1, 11L), (2, 20L), (3, 30L)).toDF("k", "c"))
  }

  test("guards: unknown/colliding names, constraint references, " +
      "unknown table") {
    val root = Files.createTempDirectory("renx").toString
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, 10L)).toDF("k", "cents")))
    intercept[IllegalArgumentException] {
      CatalogStore.renameColumn(spark, root, "t", "nope", "x")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.renameColumn(spark, root, "t", "cents", "k")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.renameColumn(spark, root, "nope", "a", "b")
    }
    // a constraint-referenced column cannot silently un-bind its expr
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "cents_pos", "cents >= 0"),
      Constraint.unique("t", Seq("k"))))
    val e = intercept[IllegalArgumentException] {
      CatalogStore.renameColumn(spark, root, "t", "cents", "amount")
    }
    assert(e.getMessage.contains("cents_pos"))
    intercept[IllegalArgumentException] { // unique col list too
      CatalogStore.renameColumn(spark, root, "t", "k", "id")
    }
    // drop the constraint -> rename lands -> re-add under the new name
    CatalogStore.dropConstraint(spark, root, "t", "cents_pos")
    CatalogStore.renameColumn(spark, root, "t", "cents", "amount")
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "amount_pos", "amount >= 0")))
    intercept[CatalogStore.ConstraintViolationException] {
      CatalogStore.upsertTable(spark, root, "t",
        Seq((9, -1L)).toDF("k", "amount"), Seq("k"))
    }
  }

  test("sidecar surfaces: metaAgg translates to physical names; " +
      "readWhere and skipping views fall back row-identically") {
    val root = Files.createTempDirectory("rens").toString
    val base = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).as("cents"))
    CatalogStore.commit(spark, root, Map("t" -> base.repartition(4)),
      indexCols = Map("t" -> Seq("k")), analyzeStats = true)
    CatalogStore.renameColumn(spark, root, "t", "cents", "amount")
    CatalogStore.renameColumn(spark, root, "t", "k", "id2")
    val snap = CatalogStore.snapshot(spark, root)
    // metaAgg: asked in logical names, served from the physical
    // sidecar, aliased back to logical
    val m = CatalogStore.metaAgg(spark, root, snap, "t",
      Seq("id2", "amount")).collect()(0)
    assert(m.getAs[Long]("row_count") == 100L)
    assert(m.getAs[Long]("min_id2") == 0L &&
      m.getAs[Long]("max_id2") == 99L)
    assert(m.getAs[Long]("max_amount") == 198L)
    // readWhere: logical predicate, plain-fallback, row-identical
    assertSameRows(
      CatalogStore.readWhere(spark, root, "t", snap,
        col("id2") >= 98),
      Seq((98L, 196L), (99L, 198L)).toDF("id2", "amount"))
    // the physical-name skipping view refuses loudly on renamed
    // tables; the snapshot-views surface silently degrades to plain
    intercept[IllegalArgumentException] {
      CatalogStore.registerSkippingView(spark, root, "t", snap, "t_skip")
    }
    try {
      CatalogStore.registerSnapshotViews(spark, root, suffix = "_v",
        skipping = true)
      assert(spark.sql("SELECT sum(amount) AS s FROM t_v WHERE id2 < 10")
        .collect()(0).getLong(0) == (0 until 10).map(_ * 2).sum)
    } finally spark.catalog.dropTempView("t_v")
  }

  test("merge guard: a branch that renamed out-of-band cannot " +
      "silently fork main's schema; renames are per-ref metadata") {
    val root = Files.createTempDirectory("renm").toString
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, 10L)).toDF("k", "a")))
    CatalogStore.createBranch(spark, root, "wip")
    // the branch renames a->z and commits a new generation with z:
    // the merge refuses UP FRONT with the fix named (renames are
    // per-ref; silence would lose the rename or fork the schema)
    CatalogStore.renameColumn(spark, root, "t", "a", "z", ref = "wip")
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((2, 20L)).toDF("k", "z")), ref = "wip")
    val e = intercept[IllegalArgumentException] {
      CatalogStore.mergeBranch(spark, root, "wip", force = true)
    }
    assert(e.getMessage.contains("BEFORE merging"))
    // main is untouched and still serves `a`
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root)),
      Seq((1, 10L)).toDF("k", "a"))
    // the branch itself reads consistently under ITS metadata
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshotRef(spark, root, "wip")),
      Seq((2, 20L)).toDF("k", "z"))
    // the documented fix WORKS: apply the same rename on main, then
    // the merge lands and main serves the branch's bytes under the
    // shared logical name
    CatalogStore.renameColumn(spark, root, "t", "a", "z")
    val m = CatalogStore.mergeBranch(spark, root, "wip")
    assert(m.tables == Seq("t"))
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root)),
      Seq((2, 20L)).toDF("k", "z"))
    // schema drift WITHOUT a rename (both sides independently create
    // the same table with different schemas) still hits the schema
    // guard even under force
    val root2 = Files.createTempDirectory("renm2").toString
    CatalogStore.commit(spark, root2,
      Map("base" -> Seq((1, 1L)).toDF("k", "v")))
    CatalogStore.createBranch(spark, root2, "wip3")
    CatalogStore.commit(spark, root2,
      Map("w" -> Seq((2, 2L)).toDF("k", "v")), ref = "wip3")
    CatalogStore.commit(spark, root2,
      Map("w" -> Seq(("x", 3L)).toDF("name", "v")))
    intercept[CatalogStore.SchemaEvolutionException] {
      CatalogStore.mergeBranch(spark, root2, "wip3", force = true)
    }
  }
}
