package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CatalogStore
import graft.sources.CatalogStore.{Constraint, ConstraintViolationException}
import graft.sources.Tables

/** Declarative, catalog-persisted constraints (CHECK / NOT NULL /
  * UNIQUE): added as metadata commits, validated against existing
  * data, enforced on every later commit and merge — the Delta
  * ADD CONSTRAINT tier over [[CatalogStoreSpec]]'s protocol.
  */
class CatalogConstraintSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  test("check constraint: added, enforced on later commits, carried " +
      "forward, dropped") {
    val root = Files.createTempDirectory("cons").toString
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(50)))
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "price_pos", "o_totalprice >= 0")))
    val snap = CatalogStore.snapshot(spark, root)
    assert(CatalogStore.constraintsOf(spark, root, snap) ==
      Seq(Constraint("t", "price_pos", "check", "o_totalprice >= 0")))
    // the metadata commit carried the table map forward untouched
    assert(snap.tables == Map("t" -> 1))
    // a violating commit is rejected BEFORE any metadata moves
    val bad = orders.limit(20)
      .withColumn("o_totalprice", lit(-1.0))
    val e = intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root, Map("t" -> bad))
    }
    assert(e.table == "t" && e.constraint == "price_pos" &&
      e.getMessage.contains("CHECK"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(CatalogStore.snapshot(spark, root) == snap)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "t/v=3")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_cat/claim=3")))
    // a clean commit lands — and the constraint RIDES FORWARD: the
    // same bad data is still rejected two transactions later
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(30)))
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root, Map("t" -> bad))
    }
    // other tables are untouched by t's contract
    CatalogStore.commit(spark, root, Map("u" -> bad))
    // drop ends enforcement, loudly if missing
    intercept[IllegalArgumentException] {
      CatalogStore.dropConstraint(spark, root, "t", "nope")
    }
    CatalogStore.dropConstraint(spark, root, "t", "price_pos")
    assert(CatalogStore.commit(spark, root, Map("t" -> bad)).committed)
    assert(CatalogStore.constraintsOf(spark, root,
      CatalogStore.snapshot(spark, root)).isEmpty)
  }

  test("addConstraints validates EXISTING data; validate=false is " +
      "the explicit escape; duplicates rejected") {
    val root = Files.createTempDirectory("consv").toString
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(50)
      .withColumn("flag", (col("o_orderkey") % 2).cast("int"))))
    // existing data violates flag = 0 → the ADD itself is rejected
    intercept[ConstraintViolationException] {
      CatalogStore.addConstraints(spark, root, Seq(
        Constraint.check("t", "flag_zero", "flag = 0")))
    }
    assert(CatalogStore.constraintsOf(spark, root,
      CatalogStore.snapshot(spark, root)).isEmpty)
    // the escape hatch records it anyway (Delta's NOVALIDATE posture)
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "flag_zero", "flag = 0")),
      validate = false)
    // ...and enforcement applies to NEW commits regardless
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root, Map("t" -> orders.limit(10)
        .withColumn("flag", lit(1))))
    }
    // duplicate (table, name) rejected
    intercept[IllegalArgumentException] {
      CatalogStore.addConstraints(spark, root, Seq(
        Constraint.check("t", "flag_zero", "flag = 0")))
    }
    // a constraint on a NOT-YET-EXISTING table is accepted and bites
    // when the table first appears
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("future", "pos", "v > 0")))
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root,
        Map("future" -> Seq(-1, 2).toDF("v")))
    }
    assert(CatalogStore.commit(spark, root,
      Map("future" -> Seq(1, 2).toDF("v"))).committed)
  }

  test("CHECK is ANSI: NULL passes; notNull closes it explicitly") {
    val root = Files.createTempDirectory("consn").toString
    val withNull = Seq((1, Some(5.0)), (2, None: Option[Double]))
      .toDF("k", "price")
    CatalogStore.commit(spark, root, Map("t" -> withNull))
    // price >= 0 over a NULL row: not FALSE → passes (ANSI CHECK)
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "price_pos", "price >= 0")))
    // notNull is the explicit closure — existing NULL rejects the add
    intercept[ConstraintViolationException] {
      CatalogStore.addConstraints(spark, root, Seq(
        Constraint.notNull("t", "price")))
    }
  }

  test("unique constraint: duplicate keys rejected with the key " +
      "named; deduped data lands; composite keys") {
    val root = Files.createTempDirectory("consu").toString
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, "a"), (2, "b")).toDF("k", "s")))
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.unique("t", Seq("k"))))
    val e = intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root,
        Map("t" -> Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "s")))
    }
    assert(e.getMessage.contains("UNIQUE") && e.getMessage.contains("[1,"))
    assert(CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")))
      .committed)
    // ANSI UNIQUE: NULL keys are mutually DISTINCT — a sparse key
    // column with many NULLs is legal (notNull closes them)
    CatalogStore.commit(spark, root, Map("sparse" ->
      Seq((Some(1), "a"), (None: Option[Int], "b"),
        (None: Option[Int], "c")).toDF("k", "s")))
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.unique("sparse", Seq("k"))))
    assert(CatalogStore.commit(spark, root, Map("sparse" ->
      Seq((Some(1), "a"), (None: Option[Int], "b"),
        (None: Option[Int], "c")).toDF("k", "s"))).committed)
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root, Map("sparse" ->
        Seq((Some(1), "a"), (Some(1), "b")).toDF("k", "s")))
    }
    // composite: (k, s) unique allows repeated k with distinct s
    CatalogStore.dropConstraint(spark, root, "t", "unique_k")
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.unique("t", Seq("k", "s"))))
    assert(CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, "a"), (1, "b")).toDF("k", "s"))).committed)
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root,
        Map("t" -> Seq((1, "a"), (1, "a")).toDF("k", "s")))
    }
  }

  test("merge enforces MAIN's constraints on the merged tables; " +
      "branch-side constraint adds stay per-ref") {
    val root = Files.createTempDirectory("consm").toString
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(10)))
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("t", "price_pos", "o_totalprice >= 0")))
    CatalogStore.createBranch(spark, root, "wip")
    // the BRANCH inherits main's set at fork... its own commits are
    // checked against the branch parent's constraints
    intercept[ConstraintViolationException] {
      CatalogStore.commit(spark, root, Map("t" -> orders.limit(5)
        .withColumn("o_totalprice", lit(-2.0))), ref = "wip")
    }
    // a branch created BEFORE the constraint existed can still stage
    // violating data — the merge is the gate that protects main
    CatalogStore.createBranch(spark, root, "old", at = Some(1))
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(5)
      .withColumn("o_totalprice", lit(-2.0))), ref = "old")
    intercept[ConstraintViolationException] {
      CatalogStore.mergeBranch(spark, root, "old", force = true)
    }
    // branch-side ADD does not leak to main via merge
    CatalogStore.commit(spark, root, Map("u" -> orders.limit(3)),
      ref = "wip")
    CatalogStore.addConstraints(spark, root, Seq(
      Constraint.check("u", "k_nonneg", "o_orderkey >= 0")), ref = "wip")
    CatalogStore.mergeBranch(spark, root, "wip")
    val mainCs = CatalogStore.constraintsOf(spark, root,
      CatalogStore.snapshot(spark, root))
    assert(mainCs.map(_.name) == Seq("price_pos"))
    // ...but the merged DATA satisfied main's set and landed
    assert(CatalogStore.snapshot(spark, root).tables.contains("u"))
  }
}
