package graft

import java.sql.Timestamp

import graft.operators.Sessionize

/** Gap-based sessionization (ext tier): session splits exactly at the
  * gap boundary, per-user independence.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split strictly after gapSeconds; boundaries inclusive") {
    val events = Seq(
      // user 1: 3 events 10min apart, then a 31-min gap, then 1 more
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L),
      (3L, ts("2024-01-01 10:20:00"), 1L),
      (4L, ts("2024-01-01 10:51:00"), 1L), // 31min > 1800s → new session
      // user 2: exactly-1800s gap stays in one session (> is strict)
      (5L, ts("2024-01-01 00:00:00"), 2L),
      (6L, ts("2024-01-01 00:30:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val s = Sessionize.sessions(events, gapSeconds = 1800L)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect()
    assert(s.length == 3)
    assert(s(0) == ((1L, 1L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"))))
    assert(s(1) == ((1L, 2L, 1L, ts("2024-01-01 10:51:00"), ts("2024-01-01 10:51:00"))))
    assert(s(2) == ((2L, 1L, 2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"))))
  }
}
