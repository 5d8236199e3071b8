package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{BookmarkStore, Incremental}

/** Incremental-mode semantics (SURVEY §2.1 S3, §2.7 T3, §5d): merge
  * upsert rule, the tick-equivalence contract, change detection, and
  * the persisted bookmark.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("merge: incoming replaces same-key rows, others survive") {
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val incoming = Seq((2L, "B2"), (4L, "d")).toDF("k", "v")
    val merged = Incremental.merge(existing, incoming, Seq("k"))
      .orderBy("k").as[(Long, String)].collect()
    assert(merged.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("merge tolerates schema evolution: a tick's new column nulls out old rows") {
    // the reference auto-generates flat configs from metadata — a tick
    // after a new concept first appears carries a column the stored
    // table predates (reference README.md:246-247)
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val incoming = Seq((2L, "B2", 7.5)).toDF("k", "v", "w")
    val merged = Incremental.merge(existing, incoming, Seq("k"))
      .orderBy("k").as[(Long, String, Option[Double])].collect()
    assert(merged.toSeq == Seq((1L, "a", None), (2L, "B2", Some(7.5))))
  }

  test("N incremental ticks ≡ one full refresh (SURVEY §5d)") {
    // source versions over three ticks: key → (value, changed-at)
    val v1 = Seq((1L, "a1", ts("2024-01-01 00:00:00")),
      (2L, "b1", ts("2024-01-01 00:00:00")))
    val v2 = v1.map { case (k, _, _) if k == 2 => (2L, "b2", ts("2024-01-02 00:00:00"))
      case r => r } :+ ((3L, "c2", ts("2024-01-02 00:00:00")))
    val v3 = v2.map { case (k, _, _) if k == 1 => (1L, "a3", ts("2024-01-03 00:00:00"))
      case r => r }
    val cols = Seq("k", "v", "date_changed")

    var store = spark.emptyDataset[(Long, String, Timestamp)].toDF(cols: _*)
    var bookmark: Option[Timestamp] = None
    for (src <- Seq(v1, v2, v3)) {
      val srcDf = src.toDF(cols: _*)
      val delta = Incremental.changedSince(srcDf, bookmark, Seq("date_changed"))
      store = Incremental.merge(store, delta, Seq("k"))
      bookmark = Incremental.nextBookmark(srcDf, Seq("date_changed"))
    }
    assertSameRows(store, v3.toDF(cols: _*)) // ≡ full refresh of v3
  }

  test("changedSince with no bookmark returns everything") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "date_changed")
    assert(Incremental.changedSince(df, None, Seq("date_changed")).count() == 1)
  }

  test("changedSince pushes the predicate into the parquet scan") {
    val tmp = Files.createTempDirectory("graft-inc").toString
    Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-06-01 00:00:00")))
      .toDF("k", "date_changed").write.mode("overwrite").parquet(tmp)
    val scan = Incremental.changedSince(
      spark.read.parquet(tmp), Some(ts("2024-03-01 00:00:00")), Seq("date_changed"))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(date_changed), GreaterThan(date_changed"))
    assert(scan.as[(Long, Timestamp)].collect().toSeq == Seq((2L, ts("2024-06-01 00:00:00"))))
  }

  test("BookmarkStore round-trips a timestamp through disk") {
    val path = Files.createTempDirectory("graft-bm").resolve("bm.txt").toString
    val store = new BookmarkStore(path)
    assert(store.read().isEmpty)
    store.write(ts("2024-05-05 12:34:56"))
    assert(store.read().contains(ts("2024-05-05 12:34:56")))
    store.write(ts("2024-06-06 01:02:03")) // overwrite
    assert(store.read().contains(ts("2024-06-06 01:02:03")))
  }

  test("snapshotDiff classifies every id exactly once, all four ways") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val cur = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("id", "text")
    val got = Incremental.snapshotDiff(old, cur, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
    // self-diff: everything unchanged
    val self = Incremental.snapshotDiff(cur, cur, "id", "text")
      .as[(Long, String)].collect()
    assert(self.forall(_._2 == "unchanged") && self.length == 3)
  }
}
