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

  test("rollingAnomalies: warm-up never flags, spike flags, spike never " +
      "pollutes its own yardstick, constant series never flags") {
    // user 1: seven 10.00 days, a 100.00 spike on day 8, 10.00 on day 9
    // user 2: nine constant days (zero variance, zero deviation)
    val rows =
      (1 to 7).map(d => (1L, ts(f"2024-01-0$d 10:00:00"), 10.0)) ++
      Seq((1L, ts("2024-01-08 10:00:00"), 100.0),
          (1L, ts("2024-01-09 10:00:00"), 10.0)) ++
      (1 to 9).map(d => (2L, ts(f"2024-01-0$d 10:00:00"), 10.0))
    val out = TimeSeries.rollingAnomalies(
        rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value",
        n = 7, k = 3)
      .as[(Long, String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // warm-up: fewer than 7 PRIOR observations → never flags
    (1 to 7).foreach { d =>
      assert(out((1L, f"2024-01-0$d")) == (1000L, 0), s"warm-up day $d") }
    // day 8: 100.00 vs a zero-variance 10.00 baseline → anomaly
    assert(out((1L, "2024-01-08")) == (10000L, 1))
    // day 9: baseline now CONTAINS the spike (inflated σ) but the
    // spike itself is excluded from its own test — 10.00 stays quiet
    assert(out((1L, "2024-01-09")) == (1000L, 0))
    // constant series: dev = 0 is never > k·σ = 0 (strict inequality)
    assert(out.filter(_._1._1 == 2L).values.forall(_._2 == 0))
    // two intra-day events sum to the day's cents before the window
    val multi = Seq((3L, ts("2024-01-01 08:00:00"), 1.25),
        (3L, ts("2024-01-01 19:00:00"), 2.50))
      .toDF("user_id", "ts", "value")
    val day = TimeSeries.rollingAnomalies(multi, "user_id", "ts", "value")
      .as[(Long, String, Long, Int)].head()
    assert(day == ((3L, "2024-01-01", 375L, 0)))
  }
}
