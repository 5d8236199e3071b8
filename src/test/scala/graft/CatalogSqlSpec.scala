package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CatalogSql, CatalogStore}

/** The catalog's text command surface: every statement maps 1:1 onto
  * a CatalogStore API, so these tests pin the PARSING and routing —
  * the semantics are the underlying suites' contracts.
  */
class CatalogSqlSpec extends SparkSpec {

  import spark.implicits._

  private def exec(root: String, s: String, ref: String = "main") =
    CatalogSql.exec(spark, root, s, ref)

  test("full lifecycle through text: refs, DML, constraints, rename, " +
      "optimize, merge, vacuum, show") {
    val root = Files.createTempDirectory("csql").toString
    CatalogStore.commit(spark, root, Map("t" ->
      Seq((1, 5L), (2, -5L), (3, 30L)).toDF("k", "v")))
    exec(root, "CREATE TAG rel-1 AT 1")
    exec(root, "CREATE BRANCH wip")
    // DELETE (SQL semantics ride the Scala API)
    exec(root, "DELETE FROM t WHERE v < 0;")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 5L), (3, 30L)).toDF("k", "v"))
    // constraints through text, enforced on later commits
    exec(root, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    exec(root, "ALTER TABLE t ADD CONSTRAINT uniq_k UNIQUE (k)")
    intercept[CatalogStore.ConstraintViolationException] {
      CatalogStore.commit(spark, root,
        Map("t" -> Seq((4, -1L)).toDF("k", "v")))
    }
    val consRows = exec(root, "SHOW CONSTRAINTS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(consRows == Set(("t", "v_pos"), ("t", "uniq_k")))
    // rename: guarded by the constraint, then the drop-rename flow
    intercept[IllegalArgumentException] {
      exec(root, "ALTER TABLE t RENAME COLUMN v TO amount")
    }
    exec(root, "ALTER TABLE t DROP CONSTRAINT v_pos")
    exec(root, "ALTER TABLE t RENAME COLUMN v TO amount")
    assert(CatalogStore.readCurrent(spark, root, "t")
      .columns.toSeq == Seq("k", "amount"))
    // optimize, both modes
    exec(root, "OPTIMIZE t TARGET 64 MB")
    exec(root, "OPTIMIZE t ZORDER BY (k)")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 5L), (3, 30L)).toDF("k", "amount"))
    // branch commit + text merge (the branch forked pre-rename and
    // pre-constraint; publish a DISJOINT table so the merge is clean)
    CatalogStore.commit(spark, root,
      Map("side" -> Seq((9, 9L)).toDF("k", "amount")), ref = "wip")
    val m = exec(root, "MERGE BRANCH wip").collect()(0).getString(1)
    assert(m.contains("tables=side"))
    assert(CatalogStore.snapshot(spark, root).tables.contains("side"))
    // SHOW REFS lists main + branch + tag; tag still time-travels
    val refs = exec(root, "SHOW REFS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs.contains(("wip", "branch")) &&
      refs.contains(("rel-1", "tag")) &&
      refs.contains(("main", "branch")))
    assert(CatalogStore.snapshotRef(spark, root, "rel-1").version == 1)
    assert(exec(root, "SHOW HISTORY").count() > 0)
    // vacuum through text (tag + branch pins hold)
    exec(root, "DROP BRANCH wip")
    val vac = exec(root, "VACUUM KEEP 1").collect()(0).getString(1)
    assert(vac.startsWith("catalogs="))
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshotRef(spark, root, "rel-1")),
      Seq((1, 5L), (2, -5L), (3, 30L)).toDF("k", "v"))
    exec(root, "DROP TAG rel-1")
    // text restore: republish the pre-merge world, data-free
    val pre = CatalogStore.snapshot(spark, root)
    exec(root, "RESTORE TO 1")
    assert(!CatalogStore.snapshot(spark, root).tables.contains("side"))
    assert(CatalogStore.readCurrent(spark, root, "t")
      .columns.toSeq == Seq("k", "v")) // pre-rename logical schema
    exec(root, s"RESTORE TO ${pre.version}")
    assert(CatalogStore.snapshot(spark, root).tables == pre.tables)
    // unknown statements are loud with the grammar named
    val e = intercept[IllegalArgumentException] {
      exec(root, "TRUNCATE TABLE t")
    }
    assert(e.getMessage.contains("supported:"))
    intercept[IllegalArgumentException] {
      exec(root, "DROP BRANCH never_existed")
    }
  }

  test("ref scoping: commands land on the named branch, main untouched") {
    val root = Files.createTempDirectory("csqlr").toString
    CatalogStore.commit(spark, root,
      Map("t" -> Seq((1, 5L), (2, -5L)).toDF("k", "v")))
    exec(root, "CREATE BRANCH b")
    exec(root, "DELETE FROM t WHERE v < 0", ref = "b")
    exec(root, "ALTER TABLE t RENAME COLUMN v TO w", ref = "b")
    // branch world changed...
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshotRef(spark, root, "b")),
      Seq((1, 5L)).toDF("k", "w"))
    // ...main is byte-identical
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 5L), (2, -5L)).toDF("k", "v"))
    // comments strip; semicolons optional
    exec(root, "SHOW REFS -- trailing comment")
    // ...but QUOTE-AWARE: '--' inside a string literal of a payload
    // expression passes through verbatim
    CatalogStore.commit(spark, root, Map("s" ->
      Seq((1, "a--b"), (2, "keep")).toDF("k", "txt")))
    exec(root, "DELETE FROM s WHERE txt = 'a--b' -- real comment")
    assertSameRows(CatalogStore.readCurrent(spark, root, "s"),
      Seq((2, "keep")).toDF("k", "txt"))
    // SHOW CONSTRAINTS on a typo'd ref fails loudly instead of
    // silently serving MAIN's list as the branch's
    intercept[IllegalArgumentException] {
      exec(root, "SHOW CONSTRAINTS", ref = "staginng")
    }
  }

  test("SQL DML: INSERT OVERWRITE/INTO and MERGE INTO map onto " +
      "commit/appendTable/upsertTable; constraints bite pre-claim") {
    val root = Files.createTempDirectory("csqld").toString
    Seq((1, 10L), (2, 20L)).toDF("k", "v")
      .createOrReplaceTempView("dml_base")
    // INSERT OVERWRITE on a fresh store = first publish
    exec(root, "INSERT OVERWRITE t SELECT * FROM dml_base")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 10L), (2, 20L)).toDF("k", "v"))
    // INSERT INTO appends (and coexists with existing rows)
    exec(root, "INSERT INTO t VALUES (3, CAST(30 AS BIGINT))")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 10L), (2, 20L), (3, 30L)).toDF("k", "v"))
    // MERGE INTO from a registered view: matched keys replace, new
    // keys append — and the result equals the Scala upsertTable on a
    // mirror store (the 1:1 parser contract)
    Seq((2, 99L), (4, 40L)).toDF("k", "v")
      .createOrReplaceTempView("dml_upd")
    exec(root, "MERGE INTO t USING dml_upd ON (k)")
    val mirror = Files.createTempDirectory("csqldm").toString
    CatalogStore.commit(spark, mirror,
      Map("t" -> Seq((1, 10L), (2, 20L), (3, 30L)).toDF("k", "v")))
    CatalogStore.upsertTable(spark, mirror, "t",
      Seq((2, 99L), (4, 40L)).toDF("k", "v"), Seq("k"))
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      CatalogStore.readCurrent(spark, mirror, "t"))
    // MERGE INTO with a parenthesized subquery source
    exec(root,
      "MERGE INTO t USING (SELECT k, v + 1 AS v FROM dml_upd " +
        "WHERE k = 4) ON (k)")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 10L), (2, 99L), (3, 30L), (4, 41L)).toDF("k", "v"))
    // constraint enforcement fires PRE-CLAIM through the text path:
    // the violating INSERT publishes nothing
    exec(root, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val vBefore = CatalogStore.snapshot(spark, root).version
    intercept[CatalogStore.ConstraintViolationException] {
      exec(root, "INSERT INTO t VALUES (9, CAST(-1 AS BIGINT))")
    }
    intercept[CatalogStore.ConstraintViolationException] {
      exec(root,
        "MERGE INTO t USING (SELECT 2 AS k, CAST(-5 AS BIGINT) AS v) " +
          "ON (k)")
    }
    assert(CatalogStore.snapshot(spark, root).version == vBefore)
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 10L), (2, 99L), (3, 30L), (4, 41L)).toDF("k", "v"))
    // INSERT INTO a missing table = first publish (DML parity with
    // the Scala appendTable contract)
    exec(root, "INSERT INTO fresh SELECT * FROM dml_base")
    assertSameRows(CatalogStore.readCurrent(spark, root, "fresh"),
      Seq((1, 10L), (2, 20L)).toDF("k", "v"))
    // a MERGE INTO without ON is loud with the grammar named
    val e = intercept[IllegalArgumentException] {
      exec(root, "MERGE INTO t USING dml_upd")
    }
    assert(e.getMessage.contains("supported:"))
    // a USING query containing its own JOIN..ON parses: the key
    // clause binds to the LAST ON (…), not the join's
    Seq((2, "x")).toDF("k", "tag").createOrReplaceTempView("dml_tags")
    exec(root,
      "MERGE INTO t USING (SELECT u.k, u.v + 100 AS v FROM dml_upd u " +
        "JOIN dml_tags g ON (u.k = g.k)) ON (k)")
    assert(CatalogStore.readCurrent(spark, root, "t")
      .filter(col("k") === 2).select("v").as[Long].head() == 199L)
    // EVOLVE rides the MERGE: an updates frame with a NEW column
    // widens the schema instead of failing the compat gate
    intercept[Exception] {
      exec(root, "MERGE INTO t USING (SELECT 1 AS k, " +
        "CAST(10 AS BIGINT) AS v, 'new' AS note) ON (k)")
    }
    exec(root, "MERGE INTO t USING (SELECT 1 AS k, " +
      "CAST(10 AS BIGINT) AS v, 'new' AS note) ON (k) EVOLVE")
    val evolved = CatalogStore.readCurrent(spark, root, "t")
    assert(evolved.columns.contains("note"))
    assert(evolved.filter(col("k") === 1).select("note")
      .as[String].head() == "new")
  }

  test("text DML × constraints × active rename chain: enforcement is " +
      "pre-claim and post-rename-mapping; pre-rename constraint refs " +
      "are unrepresentable") {
    val root = Files.createTempDirectory("csqlcr").toString
    CatalogStore.commit(spark, root, Map("t" ->
      Seq((1, 10L, "a"), (2, 20L, "b")).toDF("k", "cents", "note")))
    // an ACTIVE rename chain around the constraints: note→comment
    // before they exist, comment→remark after — constraints always
    // bind CURRENT logical names, and a rename of a column a
    // constraint references is refused at the text surface too, so
    // "constraint expr names a pre-rename column" is unrepresentable
    // by construction (the drop→rename→re-add flow is the escape)
    exec(root, "ALTER TABLE t RENAME COLUMN note TO comment")
    exec(root, "ALTER TABLE t ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    exec(root, "ALTER TABLE t ADD CONSTRAINT uniq_k UNIQUE (k)")
    intercept[IllegalArgumentException] {
      exec(root, "ALTER TABLE t RENAME COLUMN cents TO amount")
    }
    intercept[IllegalArgumentException] { // unique's column list too
      exec(root, "ALTER TABLE t RENAME COLUMN k TO id")
    }
    exec(root, "ALTER TABLE t RENAME COLUMN comment TO remark")
    val v0 = CatalogStore.snapshot(spark, root).version
    // CHECK through MERGE INTO text: the staged frame the constraint
    // sees is POST-rename-mapping (source written in current names)
    intercept[CatalogStore.ConstraintViolationException] {
      exec(root, "MERGE INTO t USING (SELECT 3 AS k, " +
        "CAST(-5 AS BIGINT) AS cents, 'x' AS remark) ON (k)")
    }
    // UNIQUE through INSERT INTO text: duplicate key across
    // existing ∪ appended rows
    intercept[CatalogStore.ConstraintViolationException] {
      exec(root, "INSERT INTO t SELECT 1 AS k, " +
        "CAST(7 AS BIGINT) AS cents, 'dup' AS remark")
    }
    // PRE-CLAIM: both refusals left no claim or version residue —
    // the pointer never moved and the next valid DML lands at v0+1
    assert(CatalogStore.snapshot(spark, root).version == v0)
    exec(root, "MERGE INTO t USING (SELECT 3 AS k, " +
      "CAST(5 AS BIGINT) AS cents, 'c' AS remark) ON (k)")
    assert(CatalogStore.snapshot(spark, root).version == v0 + 1)
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((1, 10L, "a"), (2, 20L, "b"), (3, 5L, "c"))
        .toDF("k", "cents", "remark"))
    // the chain continues past the DML; enforcement follows the name
    exec(root, "ALTER TABLE t RENAME COLUMN remark TO memo")
    intercept[CatalogStore.ConstraintViolationException] {
      exec(root, "INSERT OVERWRITE t " +
        "SELECT 1 AS k, CAST(1 AS BIGINT) AS cents, 'x' AS memo " +
        "UNION ALL SELECT 1 AS k, CAST(2 AS BIGINT) AS cents, 'y' AS memo")
    }
    exec(root, "INSERT OVERWRITE t SELECT 9 AS k, " +
      "CAST(90 AS BIGINT) AS cents, 'z' AS memo")
    assertSameRows(CatalogStore.readCurrent(spark, root, "t"),
      Seq((9, 90L, "z")).toDF("k", "cents", "memo"))
  }
}
