package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleDailyFF: per-key grid, LOCF fill, NULL marks filled cells") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 18:00:00"), 12.0), // same day → max = 12
      (1L, ts("2024-01-04 09:00:00"), 40.0), // 2-day gap before
      (2L, ts("2024-01-03 08:00:00"), 7.0))  // single-day key
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleDailyFF(events, "user_id", "ts", "value")
      .as[(Long, String, Option[Double], Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", Some(12.0), 12.0),
      (1L, "2024-01-02", None, 12.0),
      (1L, "2024-01-03", None, 12.0),
      (1L, "2024-01-04", Some(40.0), 40.0),
      (2L, "2024-01-03", Some(7.0), 7.0)))
    // grids are PER KEY: user 2 contributes one row, not user 1's span
    assert(out.count(_._1 == 2L) == 1)
  }
}
