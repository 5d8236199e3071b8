package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** As-of join semantics: latest right row at-or-before each left row,
  * per key; inclusive equality; no match → null.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches the latest right state at-or-before, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:00")), // == quote ts → inclusive
      (3L, "A", ts("2024-01-01 09:59:00")), // before any quote → null
      (4L, "B", ts("2024-01-01 10:00:10")))
      .toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:04"), 101.0),
      ("B", ts("2024-01-01 10:00:01"), 50.0))
      .toDF("sym", "q_ts", "price")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(101.0)) // latest ≤ 10:00:05
    assert(out(2L).contains(100.0)) // inclusive at equality
    assert(out(3L).isEmpty)         // nothing before
    assert(out(4L).contains(50.0))
  }

  test("same timestamp column name on both sides works") {
    val l = Seq((1L, 7L, ts("2024-01-01 01:00:00"))).toDF("id", "k", "ts")
    val r = Seq((7L, ts("2024-01-01 00:30:00"), "state0")).toDF("k", "ts", "state")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts")
      .select("id", "state").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "state0")))
  }

  test("NULLs in right value columns ride atomically with their row") {
    // the latest right row has price=NULL, note="n2"; an earlier row
    // has price=100.0, note="n1". Per-column fill would stitch
    // (100.0, "n2") — a row that never existed; as-of semantics
    // require ALL columns from the single latest row: (NULL, "n2").
    val l = Seq((1L, "A", ts("2024-01-01 12:00:00"))).toDF("id", "sym", "t_ts")
    val r = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), "n1"),
      ("A", ts("2024-01-01 11:00:00"), None: Option[Double], "n2"))
      .toDF("sym", "q_ts", "price", "note")
    val out = AsOfJoin.asOf(l, r, Seq("sym"), "t_ts", "q_ts")
      .select("price", "note").collect().head
    assert(out.isNullAt(0), s"price must be NULL from the latest row, got $out")
    assert(out.getString(1) == "n2")
  }

  test("NULL keys never match (equi-join semantics), left rows survive") {
    val l = Seq(
      (1L, Some("A"), ts("2024-01-01 12:00:00")),
      (2L, None: Option[String], ts("2024-01-01 12:00:00")))
      .toDF("id", "sym", "t_ts")
    val r = Seq(
      (Some("A"), ts("2024-01-01 10:00:00"), 1.0),
      (None: Option[String], ts("2024-01-01 11:00:00"), 99.0)) // null key
      .toDF("sym", "q_ts", "price")
    val out = AsOfJoin.asOf(l, r, Seq("sym"), "t_ts", "q_ts")
      .select("id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).isEmpty, "null-key left row must not match null-key right row")
  }

  test("empty key list = global as-of over one ordered stream") {
    val l = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 09:00:00"))).toDF("id", "t_ts")
    val r = Seq((ts("2024-01-01 09:30:00"), 7.0)).toDF("q_ts", "price")
    val out = AsOfJoin.asOf(l, r, Seq.empty, "t_ts", "q_ts")
      .select("id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(7.0)) // after the quote
    assert(out(2L).isEmpty)       // before any quote
  }

  test("colliding right value columns are rejected eagerly") {
    val l = Seq((1L, 7L, ts("2024-01-01 01:00:00"), 5.0)).toDF("id", "k", "ts", "v")
    val r = Seq((7L, ts("2024-01-01 00:30:00"), 1.0)).toDF("k", "rts", "v")
    intercept[IllegalArgumentException](
      AsOfJoin.asOf(l, r, Seq("k"), "ts", "rts"))
  }
}
