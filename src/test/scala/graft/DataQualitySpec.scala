package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.Rule

/** Declarative data-quality rules: null rows FAIL constraints (no
  * three-valued-logic pass-through), uniqueness counts every row of a
  * duplicated key, null FKs are not orphans, and row-local reports
  * merge exactly across deltas.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // (id, score, tag): one null score, one negative, one bad tag
  private def planted = Seq(
    (1L, Some(0.5), "a"), (2L, Some(0.9), "b"), (3L, None, "a"),
    (4L, Some(-0.1), "zz"), (5L, Some(0.3), "b")
  ).toDF("id", "score", "tag")

  test("check: nulls violate range/set rules; counts and pass_rate exact") {
    val got = DataQuality.check(planted, Seq(
        DataQuality.notNull("score"),
        DataQuality.inRange("score", 0.0, 1.0),
        DataQuality.inSet("tag", Seq("a", "b"))), minPassRate = 0.8)
      .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // null (row 3) + out-of-range (row 4) both violate the range rule
      ("in_range(score)", 5L, 2L, 0.6, false),
      ("in_set(tag)", 5L, 1L, 0.8, true),
      ("not_null(score)", 5L, 1L, 0.8, true)))
  }

  test("check on an empty delta: zero violations, vacuous pass") {
    val got = DataQuality.check(planted.filter(col("id") > 100),
        Seq(DataQuality.notNull("score")))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(got == (("not_null(score)", 0L, 0L, 1.0, true)))
  }

  test("unique counts every row of a duplicated key") {
    val df = Seq((1L, 1), (1L, 1), (1L, 1), (2L, 1), (3L, 2))
      .toDF("k1", "k2")
    val got = DataQuality.unique(df, Seq("k1", "k2"))
      .as[(String, Long, Long, Double, Boolean)].head()
    // key (1,1) appears 3× → 3 violating rows of 5
    assert(got == (("unique(k1,k2)", 5L, 3L, 0.4, false)))
  }

  test("referential: non-null missing FKs are orphans, null FKs are not") {
    val child = Seq(Some(10L), Some(10L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val got = DataQuality.referential(child, parent, "fk", "pk",
        minPassRate = 0.9)
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(got == (("referential(fk->pk)", 4L, 1L, 0.75, false)))
  }

  test("checkByGroup localizes violations to their group") {
    val df = Seq(("d1", Some(0.5)), ("d1", Some(0.6)), ("d2", None),
      ("d2", Some(2.0)), ("d2", Some(0.1))).toDF("day", "score")
    val got = DataQuality.checkByGroup(df, Seq("day"),
        Seq(DataQuality.inRange("score", 0.0, 1.0)), minPassRate = 0.5)
      .as[(String, String, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("d1", "in_range(score)", 2L, 0L, 1.0, true),
      // null + out-of-range both violate, and only d2 pays for them
      ("d2", "in_range(score)", 3L, 2L, 0.3333, false)))
  }

  test("uniqueApprox agrees with exact on clean and duplicated keys") {
    val clean = spark.range(0, 20000).select(col("id").as("k"))
    val dirty = clean.unionByName(clean.limit(10000))
    val ce = DataQuality.unique(clean, Seq("k")).select("passed")
      .as[Boolean].head()
    val ca = DataQuality.uniqueApprox(clean, Seq("k"), minPassRate = 0.95)
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(ce && ca._5, s"clean side must pass both, approx=$ca")
    assert(ca._1 == "approx_unique(k)")
    val de = DataQuality.unique(dirty, Seq("k")).select("passed")
      .as[Boolean].head()
    val da = DataQuality.uniqueApprox(dirty, Seq("k"), minPassRate = 0.9)
      .as[(String, Long, Long, Double, Boolean)].head()
    // 10k of 30k rows are dup pairs → exact pass_rate 1/3; approx
    // estimates ~20k distinct of 30k rows → ~10k violations
    assert(!de && !da._5, s"dirty side must trip both, approx=$da")
    assert(math.abs(da._3 - 10000L) <= 1500, s"approx violations ${da._3}")
  }

  test("uniqueApprox distinguishes keys differing only in null position") {
    // regression: xxhash64 skips null inputs, so ('a',null) and
    // (null,'a') hashed identically and deflated the estimate; the
    // per-column isnull flags restore the distinction exact unique()
    // makes. 4000 rows of each pattern, all distinct pairwise →
    // distinct ≈ 8000, violations ≈ 0 (within sketch rsd).
    val nullish = spark.range(0, 4000)
      .select(concat(lit("v"), col("id")).as("a"), lit(null: String).as("b"))
      .unionByName(spark.range(0, 4000)
        .select(lit(null: String).as("a"), concat(lit("v"), col("id")).as("b")))
    val r = DataQuality.uniqueApprox(nullish, Seq("a", "b"), minPassRate = 0.9)
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(r._5, s"null-position keys must not collide: $r")
    assert(r._3 <= 800, s"violations ${r._3} exceed sketch noise")
  }

  test("mergeReports ≡ one full check across any delta split") {
    val rules = Seq(
      DataQuality.notNull("score"),
      DataQuality.inRange("score", 0.0, 1.0),
      Rule("custom", coalesce(col("id") =!= 4L, lit(false))))
    val full = DataQuality.check(planted, rules, minPassRate = 0.8)
    val merged = DataQuality.mergeReports(
      DataQuality.check(planted.filter(col("id") % 2 === 0), rules, 0.8),
      DataQuality.check(planted.filter(col("id") % 2 =!= 0), rules, 0.8),
      minPassRate = 0.8)
    assertSameRows(merged, full)
  }

  test("kAnonymity flags small classes and sensitive-homogeneous classes") {
    // class (30,"a"): 3 rows, 2 balances → k=3-anonymous, l=2-diverse
    // class (30,"b"): 1 row → fails k; trivially fails l=2
    // class (40,"a"): 3 rows but ONE balance → k ok, fails l
    //                 (the homogeneity attack k-anonymity misses)
    val people = Seq(
      (30, "a", 10.0), (30, "a", 10.0), (30, "a", 20.0),
      (30, "b", 30.0),
      (40, "a", 50.0), (40, "a", 50.0), (40, "a", 50.0))
      .toDF("age_band", "segment", "balance")
    val out = DataQuality.kAnonymity(people, Seq("age_band", "segment"),
      "balance", k = 3, l = 2)
    assertSameRows(out,
      Seq((30, "a", 3L, 2L, true, true),
        (30, "b", 1L, 1L, false, false),
        (40, "a", 3L, 1L, true, false)).toDF())
  }
}
