package graft

import java.sql.Timestamp

import graft.operators.Cohorts

class CohortsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // two cohorts: u1/u2 first seen week of Jan 1 (Monday), u3 the next
  // week; u1 returns weeks +1 and +2, u2 only +2, u3 returns +1
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-03 09:00:00")),
    (1L, ts("2024-01-02 11:00:00")), // same week, must not double-count
    (1L, ts("2024-01-08 10:00:00")), (1L, ts("2024-01-15 10:00:00")),
    (2L, ts("2024-01-16 12:00:00")),
    (3L, ts("2024-01-09 08:00:00")), (3L, ts("2024-01-17 08:00:00")))
    .toDF("user_id", "ts")

  test("retention: cohort by first week, distinct actives per offset") {
    val m = Cohorts.retention(events, "user_id", "ts")
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m == Map(
      ("2024-01-01", 0) -> 2L, // u1, u2
      ("2024-01-01", 1) -> 1L, // u1
      ("2024-01-01", 2) -> 2L, // u1, u2
      ("2024-01-08", 0) -> 1L, // u3
      ("2024-01-08", 1) -> 1L)) // u3
  }

  test("retentionRate divides by the cohort's own size") {
    val r = Cohorts.retentionRate(events, "user_id", "ts")
      .as[(String, Int, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x._4).toMap
    assert(r(("2024-01-01", 0)) == 1.0 && r(("2024-01-01", 1)) == 0.5 &&
      r(("2024-01-01", 2)) == 1.0 && r(("2024-01-08", 1)) == 1.0)
  }

  test("daily granularity cohorts by first day") {
    val m = Cohorts.retention(events, "user_id", "ts", weekly = false)
      .as[(String, Int, Long)].collect()
    // u1's first day 2024-01-01; activity next day → offset 1 present
    assert(m.contains(("2024-01-01", 1, 1L)))
    // offsets count DAYS now: u1 active on the 8th → offset 7
    assert(m.contains(("2024-01-01", 7, 1L)))
  }
}
