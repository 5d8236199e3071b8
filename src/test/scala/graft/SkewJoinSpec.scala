package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted join ≡ plain join, including rows that never match. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val large = Seq(
    (1L, "a1"), (1L, "a2"), (1L, "a3"), (2L, "b1"), (3L, "c1"))
    .toDF("k", "lv")
  private val small = Seq((1L, "X"), (2L, "Y"), (4L, "Z")).toDF("k", "sv")

  test("inner salted join equals plain inner join") {
    assertSameRows(
      SkewJoin.saltedJoin(large, small, Seq("k"), factor = 4),
      large.join(small, Seq("k"), "inner"))
  }

  test("left salted join keeps unmatched large rows exactly once") {
    assertSameRows(
      SkewJoin.saltedJoin(large, small, Seq("k"), factor = 4, joinType = "left"),
      large.join(small, Seq("k"), "left"))
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(large, small, Seq("k"), 4, joinType = "full"))
  }

  test("adaptiveSaltedJoin equals plain join (inner + left) and detects " +
      "the planted hot key") {
    val skewed = ((1 to 500).map(i => (7L, s"hot$i")) ++
      (1 to 50).map(i => ((i % 10).toLong, s"cold$i")))
      .toDF("k", "lv")
    val dim = (0L to 10L).map(k => (k, s"d$k")).toDF("k", "sv")
    assertSameRows(
      SkewJoin.adaptiveSaltedJoin(skewed, dim, Seq("k"), factor = 4, k = 4),
      skewed.join(dim, Seq("k"), "inner"))
    // left join keeps unmatched large rows exactly once
    val dimSparse = Seq((7L, "only")).toDF("k", "sv")
    assertSameRows(
      SkewJoin.adaptiveSaltedJoin(skewed, dimSparse, Seq("k"),
        factor = 4, k = 4, joinType = "left"),
      skewed.join(dimSparse, Seq("k"), "left"))
    // MG superset: the 90%-hot key always survives a k=4 sketch
    val hot = SkewJoin.hotKeys(skewed, Seq("k"), k = 4)
    assert(hot.contains("7") && hot.size <= 4)
    // empty input falls through without salting machinery
    assert(SkewJoin.adaptiveSaltedJoin(skewed.limit(0), dim,
      Seq("k"), factor = 4).count() == 0)
    intercept[IllegalArgumentException](
      SkewJoin.adaptiveSaltedJoin(skewed, dim, Seq("k"), 4,
        joinType = "full"))
  }

  test("salt actually scatters a hot key across sub-keys") {
    val hot = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "lv")
    val salts = hot.withColumn("__salt",
      pmod(xxhash64(hot.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key spread over most sub-keys, got $salts")
  }
}
