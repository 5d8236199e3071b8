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
    // bare relative filename: getParent is null — write must not NPE
    val bare = new BookmarkStore("graft-bm-bare.txt")
    try {
      bare.write(ts("2024-07-07 00:00:00"))
      assert(bare.read().contains(ts("2024-07-07 00:00:00")))
    } finally Files.deleteIfExists(java.nio.file.Paths.get("graft-bm-bare.txt"))
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

  test("scd2History: runs collapse, intervals chain half-open, last is current") {
    val ev = Seq(
      // user 1: A,A → B → A  (three versions; first counts 2 events)
      (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "A"),
      (1L, ts("2024-01-03 00:00:00"), 12L, "B"),
      (1L, ts("2024-01-04 00:00:00"), 13L, "A"),
      // user 2: a single event — one open version
      (2L, ts("2024-02-01 00:00:00"), 20L, "X")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Incremental.scd2History(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(got.toSeq == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false, 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false, 1L),
      (1L, "A", ts("2024-01-04 00:00:00"), None, true, 1L),
      (2L, "X", ts("2024-02-01 00:00:00"), None, true, 1L)))
    // intervals chain with no gaps: each valid_to == next valid_from
    // (asserted by the literal rows above); exactly one current per key
    assert(got.count(_._5) == 2)
  }

  test("scd2Merge ≡ full rerun: extend, change, untouched and new keys") {
    val early = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"), // open version A, n=2
      (2L, ts("2024-01-03 00:00:00"), 3L, "X"), // untouched by delta
      (3L, ts("2024-01-04 00:00:00"), 4L, "P"),
      (3L, ts("2024-01-05 00:00:00"), 5L, "Q")  // closed P + open Q
    ).toDF("user_id", "ts", "event_id", "event_type")
    val late = Seq(
      (1L, ts("2024-02-01 00:00:00"), 6L, "A"), // extends 1's open A
      (1L, ts("2024-02-02 00:00:00"), 7L, "B"), // then changes it
      (3L, ts("2024-02-03 00:00:00"), 8L, "Q"), // extends 3's open Q
      (4L, ts("2024-02-04 00:00:00"), 9L, "N")  // brand-new key
    ).toDF("user_id", "ts", "event_id", "event_type")
    val history = Incremental.scd2History(early,
      "user_id", "ts", "event_id", "event_type")
    val merged = Incremental.scd2Merge(history, late,
      "user_id", "ts", "event_id", "event_type")
    val full = Incremental.scd2History(early.unionByName(late),
      "user_id", "ts", "event_id", "event_type")
    assertSameRows(merged, full)
  }

  test("scd2At: snapshot picks exactly one version per key; edges half-open") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-03 00:00:00"), 2L, "B"),
      (2L, ts("2024-01-05 00:00:00"), 3L, "X")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val hist = Incremental.scd2History(ev, "user_id", "ts", "event_id",
      "event_type")
    def stateAt(s: String) = Incremental.scd2At(hist, ts(s))
      .select("user_id", "event_type").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(stateAt("2024-01-02 00:00:00") == Seq((1L, "A")))
    // boundary instant: the NEW version owns it (half-open intervals)
    assert(stateAt("2024-01-03 00:00:00") == Seq((1L, "B")))
    assert(stateAt("2024-01-06 00:00:00") == Seq((1L, "B"), (2L, "X")))
    // before any event: empty state
    assert(stateAt("2023-12-31 00:00:00").isEmpty)
  }

  test("scd2History: nullable attribute — consecutive nulls are ONE version") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("A")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),
      (1L, ts("2024-01-03 00:00:00"), 3L, None), // extends the null run
      (1L, ts("2024-01-04 00:00:00"), 4L, Some("A")),
      (2L, ts("2024-01-05 00:00:00"), 5L, None)  // null-first key
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Incremental.scd2History(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(Long, Option[String], Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(got.toSeq == Seq(
      (1L, Some("A"), ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), false, 1L),
      (1L, None, ts("2024-01-02 00:00:00"), Some(ts("2024-01-04 00:00:00")), false, 2L),
      (1L, Some("A"), ts("2024-01-04 00:00:00"), None, true, 1L),
      (2L, None, ts("2024-01-05 00:00:00"), None, true, 1L)))
  }

  test("scd2History breaks same-timestamp ties by the order column") {
    val t0 = ts("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, t0, 2L, "B"), (1L, t0, 1L, "A"), // event 1 (A) precedes 2 (B)
      (1L, ts("2024-01-02 00:00:00"), 3L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Incremental.scd2History(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().sortBy(r => (r._3.getTime, r._2))
    // A opens at t0; B starts at t0 too (same-ts change) and, with the
    // 01-02 event extending the same value, runs open with 2 events
    assert(got.toSeq == Seq(
      (1L, "A", t0, Some(t0), false, 1L),
      (1L, "B", t0, None, true, 2L)))
  }
  test("mergeAggViews: disjoint keys pass through, shared keys combine per fn") {
    import graft.operators.Incremental.AggCol
    val specs = Seq(AggCol("cnt", "count", ""), AggCol("s", "sum", "v"),
      AggCol("mn", "min", "v"), AggCol("mx", "max", "v"))
    val a = Incremental.aggView(
      Seq(("x", 1L), ("x", 5L), ("y", 7L)).toDF("k", "v"), Seq("k"), specs)
    val b = Incremental.aggView(
      Seq(("x", -2L), ("z", 9L)).toDF("k", "v"), Seq("k"), specs)
    val m = Incremental.mergeAggViews(a, b, Seq("k"), specs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(m("x") == ((3L, 4L, -2L, 5L)))   // combined
    assert(m("y") == ((1L, 7L, 7L, 7L)))    // a-only passes through
    assert(m("z") == ((1L, 9L, 9L, 9L)))    // b-only passes through
    // associativity/commutativity: (a+b) == (b+a)
    val m2 = Incremental.mergeAggViews(b, a, Seq("k"), specs)
    assert(m2.exceptAll(Incremental.mergeAggViews(a, b, Seq("k"), specs))
      .count() == 0)
  }

  test("maintainAgg over ticks == one rebuild; recomputeKeys handles vanish and min-shift") {
    import graft.operators.Incremental.AggCol
    val specs = Seq(AggCol("cnt", "count", ""), AggCol("mn", "min", "v"))
    val base = Seq(("x", 3L), ("x", 8L), ("y", 1L), ("y", 2L), ("z", 5L))
      .toDF("k", "v")
    val t1 = Seq(("x", 1L), ("w", 4L)).toDF("k", "v")
    val all = base.unionAll(t1)
    val maintained = Incremental.maintainAgg(
      Incremental.aggView(base, Seq("k"), specs), t1, Seq("k"), specs)
    val rebuilt = Incremental.aggView(all, Seq("k"), specs)
    assert(maintained.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(maintained).count() == 0)
    // delete x's minimum (1) and ALL of z: min must shift back to 3,
    // z must vanish -- neither is expressible by retraction algebra
    val deletes = Seq(("x", 1L), ("z", 5L)).toDF("k", "v")
    val after = all.exceptAll(deletes)
    val fixed = Incremental.recomputeKeys(rebuilt, after, deletes,
      Seq("k"), specs)
    val fm = fixed.as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fm("x") == ((2L, 3L)) && !fm.contains("z") &&
      fm("y") == ((2L, 1L)) && fm("w") == ((1L, 4L)))
    val fullAfter = Incremental.aggView(after, Seq("k"), specs)
    assert(fixed.exceptAll(fullAfter).count() == 0 &&
      fullAfter.exceptAll(fixed).count() == 0)
  }

  test("AggCol rejects non-distributive aggregates") {
    import graft.operators.Incremental.AggCol
    val err = intercept[IllegalArgumentException] {
      AggCol("a", "avg", "v")
    }
    assert(err.getMessage.contains("distributive only"))
  }

  test("maintainJoinView: all three delta families land exactly once; == rebuild") {
    val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val dA = Seq((3L, "a3")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (3L, "b3e")).toDF("k", "bv") // 3: early line of a LATE order
    val dB = Seq((2L, "b2"), (3L, "b3l"), (9L, "b9")).toDF("k", "bv")
    val view = aOld.join(bOld, Seq("k"))
    val maintained = Incremental.maintainJoinView(
      view, aOld, dA, bOld, dB, Seq("k"))
    val rebuilt = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
    // covers: dA x bOld (3,a3,b3e), aOld x dB (2,a2,b2),
    // dA x dB (3,a3,b3l) — each exactly once; unmatched dB key 9 drops
    assert(maintained.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(maintained).count() == 0)
    assert(maintained.count() == 4)
  }

  test("tick-sized broadcast contract: an oversized delta fails with " +
      "the contract message, not an executor OOM") {
    val base = (1L to 40L).map(k => (k, s"a$k")).toDF("k", "av")
    val bSide = (1L to 40L).map(k => (k, s"b$k")).toDF("k", "bv")
    val bigDelta = (1L to 30L).map(k => (k, s"d$k")).toDF("k", "av")
    val view = base.join(bSide, Seq("k"))
    val e1 = intercept[IllegalArgumentException] {
      Incremental.maintainJoinView(view, base, bigDelta,
        bSide, bSide.limit(0), Seq("k"), maxTickKeys = 10L)
    }
    assert(e1.getMessage.contains("tick-sized broadcast contract"))
    assert(e1.getMessage.contains("30 distinct keys"))
    val e2 = intercept[IllegalArgumentException] {
      Incremental.recomputeJoinKeys(view, base, bSide, bigDelta,
        Seq("k"), maxTickKeys = 10L)
    }
    assert(e2.getMessage.contains("recomputeJoinKeys"))
    val e3 = intercept[IllegalArgumentException] {
      Incremental.recomputeKeys(view.select("k", "av"), base, bigDelta,
        Seq("k"), Seq(Incremental.AggCol("cnt", "count", "")),
        maxTickKeys = 10L)
    }
    assert(e3.getMessage.contains("recomputeKeys"))
    // within the cap everything still flows
    val ok = Incremental.recomputeJoinKeys(view, base, bSide,
      bigDelta.limit(5).select(col("k"), col("av")), Seq("k"),
      maxTickKeys = 10L)
    assert(ok.count() > 0)
  }

  test("recomputeJoinKeys: row-granular delete keeps the key's surviving pairs") {
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b = Seq((1L, "b1"), (1L, "b1x"), (2L, "b2")).toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    // delete ONE of key 1's two b-rows: an anti-join-only fix would
    // lose (1, a1, b1x); the recompute must keep it
    val doomed = Seq((1L, "b1")).toDF("k", "bv")
    val bNew = b.exceptAll(doomed)
    val fixed = Incremental.recomputeJoinKeys(view, a, bNew, doomed, Seq("k"))
    val rebuilt = a.join(bNew, Seq("k"))
    assert(fixed.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(fixed).count() == 0)
    assert(fixed.filter($"k" === 1L).count() == 1)
  }

  test("applyChanges: upsert/delete/out-of-order in one tick; untouched rows never shuffle in") {
    val existing = Seq((1L, "a", 10L), (2L, "b", 11L), (3L, "c", 12L))
      .toDF("k", "v", "seq")
    val changes = Seq(
      (2L, "B-new", "u", 21L), (2L, "B-mid", "u", 20L), // out of order: 21 wins
      (3L, "dead", "d", 22L),                           // hard delete
      (4L, "d4", "c", 23L),                             // insert
      (5L, "ghost", "d", 24L)                           // delete of absent key: no-op
    ).toDF("k", "v", "op", "seq")
    val out = Incremental.applyChanges(existing, changes, Seq("k"))
      .orderBy("k").select("k", "v", "seq").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "a", 10L), (2L, "B-new", 21L), (4L, "d4", 23L)))
  }

  test("applyChanges: stale change loses to the stored row; delete-then-reinsert by seq") {
    val existing = Seq((1L, "fresh", 50L)).toDF("k", "v", "seq")
    // a replayed old update (seq 40 < stored 50) must not regress
    val stale = Seq((1L, "old", "u", 40L)).toDF("k", "v", "op", "seq")
    val kept = Incremental.applyChanges(existing, stale, Seq("k"))
      .as[(Long, String, Long)].collect()
    assert(kept.toSeq == Seq((1L, "fresh", 50L)))
    // delete at 60 then re-insert at 61: the key survives with the new image
    val dr = Seq((1L, null.asInstanceOf[String], "d", 60L), (1L, "re", "c", 61L))
      .toDF("k", "v", "op", "seq")
    val re = Incremental.applyChanges(existing, dr, Seq("k"))
      .as[(Long, String, Long)].collect()
    assert(re.toSeq == Seq((1L, "re", 61L)))
    // ... and with the delete winning (re-insert replayed stale) the key is gone
    val dw = Seq((1L, "re", "c", 55L), (1L, null.asInstanceOf[String], "d", 60L))
      .toDF("k", "v", "op", "seq")
    assert(Incremental.applyChanges(existing, dw, Seq("k")).count() == 0)
  }

  test("applyChanges: N tick splits == one-shot fold; redelivery idempotent") {
    val existing = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "seq")
    val log = Seq(
      (1L, "a2", "u", 10L), (2L, "x", "d", 11L), (3L, "c", "c", 12L),
      (1L, "a3", "u", 13L), (3L, "y", "d", 14L), (4L, "d4", "c", 15L))
      .toDF("k", "v", "op", "seq")
    val oneShot = Incremental.applyChanges(existing, log, Seq("k"))
    // split mid-key-history (key 1's and 3's changes straddle ticks)
    val t1 = log.filter($"seq" <= 12L)
    val t2 = log.filter($"seq" > 12L)
    val folded = Incremental.applyChanges(
      Incremental.applyChanges(existing, t1, Seq("k")), t2, Seq("k"))
    assert(folded.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(folded).count() == 0)
    // at-least-once: re-applying the last tick is a no-op
    val again = Incremental.applyChanges(folded, t2, Seq("k"))
    assert(again.exceptAll(folded).count() == 0 &&
      folded.exceptAll(again).count() == 0)
  }

  test("applyChanges: schema evolution both ways — stored-only column survives a stored win") {
    // table carries `x` the feed stopped carrying; feed carries `w`
    // the table predates
    val existing = Seq((1L, "a", "keepme", 50L), (2L, "b", "x2", 2L))
      .toDF("k", "v", "x", "seq")
    val changes = Seq(
      (1L, "stale", "late-w", "u", 40L),  // loses: stored x must survive
      (2L, "b2", "w2", "u", 60L))         // wins: x nulls, w lands
      .toDF("k", "v", "w", "op", "seq")
    val out = Incremental.applyChanges(existing, changes, Seq("k"))
      .orderBy("k").select("k", "v", "x", "w", "seq")
      .as[(Long, String, Option[String], Option[String], Long)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", Some("keepme"), None, 50L),
      (2L, "b2", None, Some("w2"), 60L)))
  }

  test("foldAggViews == iterated pairwise mergeAggViews") {
    import graft.operators.Incremental.AggCol
    val specs = Seq(AggCol("cnt", "count", ""), AggCol("s", "sum", "v"),
      AggCol("mn", "min", "v"), AggCol("mx", "max", "v"))
    val days = Seq(
      Seq(("x", 3L), ("y", 1L)), Seq(("x", -4L), ("z", 2L)),
      Seq(("y", 9L), ("y", 0L)))
      .map(rows => Incremental.aggView(rows.toDF("k", "v"), Seq("k"), specs)
        .withColumn("d", lit(1)))
    val stacked = days.reduce(_ unionByName _)
    val folded = Incremental.foldAggViews(stacked.drop("d"), Seq("k"), specs)
    val pairwise = days.map(_.drop("d"))
      .reduce(Incremental.mergeAggViews(_, _, Seq("k"), specs))
    assert(folded.exceptAll(pairwise).count() == 0 &&
      pairwise.exceptAll(folded).count() == 0)
  }

}
