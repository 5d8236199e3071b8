package graft

import java.nio.file.Files

import graft.sources.VersionedStore

class VersionedStoreSpec extends SparkSpec {

  import spark.implicits._

  test("publish/read/time-travel/rollback/vacuum lifecycle") {
    val path = Files.createTempDirectory("vstore").resolve("t").toString
    assert(VersionedStore.current(spark, path).isEmpty)
    intercept[IllegalStateException] { VersionedStore.read(spark, path) }

    val v1 = VersionedStore.publish(spark, path, Seq(1L, 2L).toDF("x"))
    val v2 = VersionedStore.publish(spark, path, Seq(3L).toDF("x"))
    assert(v1 == 1 && v2 == 2)
    assert(VersionedStore.current(spark, path).contains(2))
    assert(VersionedStore.read(spark, path).as[Long].collect().toSeq == Seq(3L))
    // time travel: v1 still byte-intact
    assert(VersionedStore.read(spark, path, Some(1)).as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L))

    VersionedStore.rollback(spark, path, 1)
    assert(VersionedStore.current(spark, path).contains(1))
    assert(VersionedStore.read(spark, path).as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      VersionedStore.rollback(spark, path, 99)
    }

    // publish after rollback continues from the highest EXISTING
    // version, never reusing a live number
    val v3 = VersionedStore.publish(spark, path, Seq(4L).toDF("x"))
    assert(v3 == 3 && VersionedStore.versions(spark, path) == Seq(1, 2, 3))

    // vacuum keeps the newest `keep` but never deletes the current
    VersionedStore.rollback(spark, path, 1)
    val gone = VersionedStore.vacuum(spark, path, keep = 1)
    assert(gone == Seq(2), s"vacuum removed $gone")
    assert(VersionedStore.versions(spark, path) == Seq(1, 3))
    assert(VersionedStore.read(spark, path).as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      VersionedStore.read(spark, path, Some(2))
    }
  }

  test("publish is readable mid-history and pointer flip is all-or-nothing") {
    val path = Files.createTempDirectory("vstore2").resolve("t").toString
    (1 to 4).foreach(i =>
      VersionedStore.publish(spark, path, Seq(i.toLong).toDF("x")))
    assert(VersionedStore.versions(spark, path) == Seq(1, 2, 3, 4))
    (1 to 4).foreach(i =>
      assert(VersionedStore.read(spark, path, Some(i)).as[Long].head() == i))
    // pointer file contains exactly the current version
    assert(VersionedStore.current(spark, path).contains(4))
  }
  test("history reports every physical version and flags the current one") {
    val path = Files.createTempDirectory("vstore3").resolve("t").toString
    VersionedStore.publish(spark, path, Seq(1L).toDF("x"))
    VersionedStore.publish(spark, path, Seq(2L, 3L).toDF("x"))
    VersionedStore.rollback(spark, path, 1)
    val h = VersionedStore.history(spark, path)
      .select("version", "is_current")
      .as[(Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(h == Seq((1, true), (2, false)))
    val bytes = VersionedStore.history(spark, path)
      .select("bytes").as[Long].collect()
    assert(bytes.forall(_ > 0))
  }

  test("pointer flip survives a stale tmp file; flip is overwrite-atomic") {
    val path = Files.createTempDirectory("vstore4").resolve("t").toString
    VersionedStore.publish(spark, path, Seq(1L).toDF("x"))
    // plant a stale tmp (a crash BEFORE the rename): next flip must
    // overwrite it and land correctly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path, "_current.tmp")
    val out = fs.create(tmp, true)
    out.write("999".getBytes("UTF-8")); out.close()
    VersionedStore.publish(spark, path, Seq(2L).toDF("x"))
    assert(VersionedStore.current(spark, path).contains(2))
    // the pointer always exists between flips (no delete window)
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_current")))
  }

  test("concurrent publish of the same version number fails loudly on the claim") {
    val path = Files.createTempDirectory("vstore5").resolve("t").toString
    VersionedStore.publish(spark, path, Seq(1L).toDF("x"))
    // two racers that both computed next=2: the first claims and
    // publishes; the second collides on the exclusive claim create
    VersionedStore.publishAs(spark, path, Seq(2L).toDF("x"), 2)
    val e = intercept[IllegalStateException] {
      VersionedStore.publishAs(spark, path, Seq(99L).toDF("x"), 2)
    }
    assert(e.getMessage.contains("concurrent publish"))
    // the loser never wrote data or flipped the pointer — the winner's
    // v=2 is intact and current
    assert(VersionedStore.current(spark, path).contains(2))
    assert(VersionedStore.read(spark, path).as[Long].collect().toSeq == Seq(2L))
  }

  test("concurrent publishers through publish(): loser retries, both " +
      "versions land, pointer names a complete one") {
    val path = Files.createTempDirectory("vstore7").resolve("t").toString
    VersionedStore.publish(spark, path, Seq(1L).toDF("x"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = Seq(Seq(10L, 11L), Seq(20L, 21L)).map { xs =>
      new Thread(() =>
        try VersionedStore.publish(spark, path, xs.toDF("x"))
        catch { case t: Throwable => errs.add(t) })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"a publisher failed: $errs")
    assert(VersionedStore.versions(spark, path) == Seq(1, 2, 3))
    // last flip wins; whichever it is, it reads complete
    val cur = VersionedStore.current(spark, path).get
    assert(cur == 2 || cur == 3)
    val rows = VersionedStore.read(spark, path).as[Long].collect().toSet
    assert(rows == Set(10L, 11L) || rows == Set(20L, 21L))
    // and BOTH publishes time-travel completely
    val all = Set(2, 3).map(v =>
      VersionedStore.read(spark, path, Some(v)).as[Long].collect().toSet)
    assert(all == Set(Set(10L, 11L), Set(20L, 21L)))
  }

  test("crashed-publish leftover dir is skipped by numbering, not reclaimed") {
    val path = Files.createTempDirectory("vstore6").resolve("t").toString
    VersionedStore.publish(spark, path, Seq(1L).toDF("x"))
    // a claim with no pointer flip = crash mid-publish of v=2
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(path, "v=2/_claim"), false).close()
    val v = VersionedStore.publish(spark, path, Seq(3L).toDF("x"))
    assert(v == 3) // never overwrites the leftover
    assert(VersionedStore.read(spark, path).as[Long].collect().toSeq == Seq(3L))
  }

  test("changesBetween classifies by id+content; backward feed flips added/removed") {
    val path = Files.createTempDirectory("vcdf").resolve("t").toString
    val v1 = VersionedStore.publish(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "content"))
    val v2 = VersionedStore.publish(spark, path,
      Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "content"))
    val fwd = VersionedStore.changesBetween(spark, path, v1, v2,
      "id", "content")
      .as[(Long, String)].collect().toMap
    assert(fwd == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
    // backward: the rollback-audit read — adds and removes swap roles
    val bwd = VersionedStore.changesBetween(spark, path, v2, v1,
      "id", "content")
      .as[(Long, String)].collect().toMap
    assert(bwd == Map(1L -> "added", 2L -> "unchanged",
      3L -> "modified", 4L -> "removed"))
    // the feed reads version DIRS, not the pointer: rolling back
    // changes nothing about an already-computed pair
    VersionedStore.rollback(spark, path, v1)
    assert(VersionedStore.changesBetween(spark, path, v1, v2,
      "id", "content").as[(Long, String)].collect().toMap == fwd)
  }

}
