package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

/** Bucketized range join ≡ naive containment join, including
  * intervals spanning many buckets and boundary inclusivity.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("equals the naive BETWEEN join; bounds inclusive; no dup pairs") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == interval start (inclusive)
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 11:00:00")), // == interval end (inclusive)
      (4L, ts("2024-01-01 12:00:01"))) // outside everything
      .toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // spans 13 buckets at 300s
      (200L, ts("2024-01-01 10:29:00"), ts("2024-01-01 10:31:00")))
      .toDF("iid", "ws", "we")
    val bucketized = RangeJoin.pointInInterval(points, intervals,
      "ts", "ws", "we", bucketSeconds = 300L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val naive = points.join(intervals,
      $"ts" >= $"ws" && $"ts" <= $"we")
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(bucketized.toSeq == naive.toSeq)
    assert(bucketized.toSeq == Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 100L)))
  }

  test("bucket width larger than every interval still matches") {
    val points = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("pid", "ts")
    val intervals = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00")))
      .toDF("iid", "ws", "we")
    val out = RangeJoin.pointInInterval(points, intervals,
      "ts", "ws", "we", bucketSeconds = 86400L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 9L)))
  }
}
