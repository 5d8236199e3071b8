package graft

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // u1 converts fully, in order
    (1L, ts("2024-01-01 10:00:00"), "signup"),
    (1L, ts("2024-01-02 10:00:00"), "click"),
    (1L, ts("2024-01-03 10:00:00"), "purchase"),
    // u2: purchase BEFORE the click — order violation, stops at click
    (2L, ts("2024-01-01 10:00:00"), "signup"),
    (2L, ts("2024-01-02 09:00:00"), "purchase"),
    (2L, ts("2024-01-02 10:00:00"), "click"),
    // u3: click only after the 14-day window — stops at signup
    (3L, ts("2024-01-01 10:00:00"), "signup"),
    (3L, ts("2024-01-20 10:00:00"), "click"),
    // u4: never signed up — contributes nothing
    (4L, ts("2024-01-01 10:00:00"), "click"),
    (4L, ts("2024-01-02 10:00:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("strict order, attribution window, and rates") {
    val out = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), withinDays = Some(14))
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, "signup", 3L, 1.0),     // u1, u2, u3
      (2, "click", 2L, 0.6667),   // u1, u2 (u3 outside window)
      (3, "purchase", 1L, 0.3333))) // u1 only (u2's purchase preceded)
  }

  test("no-deadline funnel admits late conversions; empty steps count zero") {
    val out = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._3) == Seq(3L, 3L, 1L)) // u3's late click now counts
    val none = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("signup", "error", "purchase"))
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(none.map(_._3) == Seq(3L, 0L, 0L))
    assert(none.last._4 == 0.0)
  }
}
