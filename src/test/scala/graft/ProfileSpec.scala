package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.sources.Tables

/** Data profiling: per-column stats in one pass, exact vs approx
  * distinct, null accounting.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact per-column stats on a known frame") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "v")
    val out = Profile.profile(df, Seq("id", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(out("v") == (("v", 4L, 1L, 2L, "a", "b")))
  }

  test("profile: one aggregation job, long output, approx variant runs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val cols = Seq("doc_id", "lang", "source")
    val exact = Profile.profile(docs, cols).collect()
    assert(exact.length == cols.length)
    val total = docs.count()
    assert(exact.forall(_.getAs[Long]("n_rows") == total))
    // approx variant agrees on everything except (possibly) n_distinct,
    // where it must be within HLL tolerance
    val approx = Profile.profile(docs, cols, approxDistinct = true)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    exact.foreach { r =>
      val a = approx(r.getAs[String]("col_name"))
      assert(a.getAs[Long]("n_rows") == r.getAs[Long]("n_rows"))
      assert(a.getAs[String]("min_value") == r.getAs[String]("min_value"))
      val (ad, ed) = (a.getAs[Long]("n_distinct"), r.getAs[Long]("n_distinct"))
      assert(math.abs(ad - ed) <= math.max(2L, (ed * 0.1).toLong),
        s"${r.getString(0)}: approx $ad vs exact $ed")
    }
    // the approx plan avoids the Expand the exact multi-distinct needs
    val approxPlan = Profile.profile(docs, cols, approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
  }
}
