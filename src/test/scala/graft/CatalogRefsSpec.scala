package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CatalogStore
import graft.sources.Tables

/** Named refs over the transactional catalog: branches (movable,
  * CAS-advanced), tags (immutable), and the zero-copy merge commit —
  * the Nessie/Iceberg-refs tier on top of [[CatalogStoreSpec]]'s
  * single-line-of-history guarantees.
  */
class CatalogRefsSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  test("branch lifecycle: isolated commits, ref reads, parent chain") {
    val root = Files.createTempDirectory("refs").toString
    val a1 = orders.limit(100)
    CatalogStore.commit(spark, root, Map("a" -> a1)) // main v1
    assert(CatalogStore.createBranch(spark, root, "audit") == 1)
    // duplicate / bad names are loud
    intercept[IllegalArgumentException] {
      CatalogStore.createBranch(spark, root, "audit")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.createBranch(spark, root, "main")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.commit(spark, root, Map("a" -> a1), ref = "nope")
    }
    // two branch commits: b rides only on the branch
    val b1 = orders.limit(30)
    val b2 = orders.limit(40)
    val t1 = CatalogStore.commit(spark, root, Map("b" -> b1),
      ref = "audit")
    val t2 = CatalogStore.commit(spark, root, Map("b" -> b2),
      ref = "audit")
    assert(t1.committed && t2.committed)
    // main is untouched: pointer, map, and reads
    assert(CatalogStore.currentVersion(spark, root).contains(1))
    val mainSnap = CatalogStore.snapshot(spark, root)
    assert(mainSnap.tables == Map("a" -> 1))
    // the branch world: its own b, main's a carried forward
    val bSnap = CatalogStore.snapshotRef(spark, root, "audit")
    assert(bSnap.tables == Map("a" -> 1, "b" -> t2.version.get))
    assertSameRows(CatalogStore.read(spark, root, "b", bSnap), b2.toDF())
    assertSameRows(CatalogStore.read(spark, root, "a", bSnap), a1.toDF())
    // parent chain: t2 -> t1 -> fork(1); refs are recorded
    val m2 = CatalogStore.catMeta(spark, root, t2.version.get)
    val m1 = CatalogStore.catMeta(spark, root, t1.version.get)
    assert(m2.ref == "audit" && m2.parent == t1.version.get)
    assert(m1.ref == "audit" && m1.parent == 1)
    // refs() lists main + the branch head
    val rows = CatalogStore.refs(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("main", "branch", 1),
      ("audit", "branch", t2.version.get)))
    // the SQL surface names the branch world with zero query rewrite
    try {
      CatalogStore.registerSnapshotViews(spark, root,
        ref = Some("audit"), suffix = "_br")
      assert(spark.sql("SELECT count(*) AS n FROM b_br")
        .collect()(0).getLong(0) == 40)
      intercept[IllegalArgumentException] {
        CatalogStore.registerSnapshotViews(spark, root,
          version = Some(1), ref = Some("audit"))
      }
    } finally Seq("a_br", "b_br")
      .foreach(spark.catalog.dropTempView)
  }

  test("main's frontier never adopts a branch catalog; numbers shared") {
    val root = Files.createTempDirectory("refsf").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    CatalogStore.createBranch(spark, root, "wip")
    val bt = CatalogStore.commit(spark, root,
      Map("secret" -> orders.limit(5)), ref = "wip")
    // the branch consumed version number 2; main's next commit must
    // skip it, adopt nothing from it, and land above
    val mt = CatalogStore.commit(spark, root, Map("a" -> orders.limit(20)))
    assert(bt.version.contains(2) && mt.version.contains(3))
    val snap = CatalogStore.snapshot(spark, root)
    assert(snap.tables == Map("a" -> 3))
    assert(!snap.tables.contains("secret"))
    assert(CatalogStore.catMeta(spark, root, 3).parent == 1)
  }

  test("tags: immutable names, time travel, vacuum pin until drop") {
    val root = Files.createTempDirectory("refst").toString
    val a1 = orders.limit(50)
    CatalogStore.commit(spark, root, Map("a" -> a1)) // v1
    assert(CatalogStore.createTag(spark, root, "rel-1") == 1)
    intercept[IllegalArgumentException] {
      CatalogStore.createTag(spark, root, "rel-1")
    }
    intercept[IllegalArgumentException] { // tags are not writable
      CatalogStore.commit(spark, root, Map("a" -> a1), ref = "rel-1")
    }
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(60)))
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(70)))
    // vacuum(keep=1) would normally drop catalog 1 — the tag pins it
    // AND its table version
    val vac = CatalogStore.vacuum(spark, root, keep = 1, claimAgeMs = 0L)
    assert(vac.catalogs == Seq(2))
    assert(vac.tableVersions == Map("a" -> Seq(2)))
    val tagged = CatalogStore.snapshotRef(spark, root, "rel-1")
    assert(tagged.version == 1)
    assertSameRows(CatalogStore.read(spark, root, "a", tagged), a1.toDF())
    // drop the tag: the pin ends, the next vacuum reclaims
    assert(CatalogStore.dropTag(spark, root, "rel-1"))
    val vac2 = CatalogStore.vacuum(spark, root, keep = 1,
      claimAgeMs = 0L)
    assert(vac2.catalogs == Seq(1) &&
      vac2.tableVersions == Map("a" -> Seq(1)))
    intercept[Exception] { CatalogStore.snapshot(spark, root, Some(1)) }
  }

  test("merge: fast-forward shape is a zero-copy main commit") {
    val root = Files.createTempDirectory("refsm").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    CatalogStore.createBranch(spark, root, "etl")
    val b = orders.limit(25)
    CatalogStore.commit(spark, root, Map("b" -> b), ref = "etl")
    val bHead = CatalogStore.refVersion(spark, root, "etl").get
    val m = CatalogStore.mergeBranch(spark, root, "etl")
    assert(m.fastForward && m.tables == Seq("b"))
    val snap = CatalogStore.snapshot(spark, root)
    // zero-copy: the merge map POINTS at the branch's version dir
    assert(snap.version == m.version &&
      snap.tables == Map("a" -> 1, "b" -> bHead))
    assertSameRows(CatalogStore.read(spark, root, "b", snap), b.toDF())
    // the merge commit is main-chain: a later commit builds on it
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(30)))
    assert(CatalogStore.snapshot(spark, root).tables("b") == bHead)
  }

  test("merge: divergent histories combine; conflicts are loud; " +
      "force = branch wins") {
    val root = Files.createTempDirectory("refsc").toString
    CatalogStore.commit(spark, root,
      Map("a" -> orders.limit(10), "b" -> orders.limit(10)))
    CatalogStore.createBranch(spark, root, "wip")
    // branch changes b; main changes a — disjoint, merge combines
    val bBranch = orders.limit(44)
    CatalogStore.commit(spark, root, Map("b" -> bBranch), ref = "wip")
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(22)))
    val m = CatalogStore.mergeBranch(spark, root, "wip")
    assert(!m.fastForward && m.tables == Seq("b"))
    val snap = CatalogStore.snapshot(spark, root)
    assert(CatalogStore.read(spark, root, "a", snap).count() == 22)
    assertSameRows(CatalogStore.read(spark, root, "b", snap),
      bBranch.toDF())
    // now BOTH sides change b since the (new) fork: conflict
    CatalogStore.createBranch(spark, root, "wip2")
    CatalogStore.commit(spark, root, Map("b" -> orders.limit(7)),
      ref = "wip2")
    CatalogStore.commit(spark, root, Map("b" -> orders.limit(9)))
    val e = intercept[CatalogStore.MergeConflictException] {
      CatalogStore.mergeBranch(spark, root, "wip2")
    }
    assert(e.tables == Seq("b"))
    // main unchanged by the refused merge
    assert(CatalogStore.read(spark, root, "b",
      CatalogStore.snapshot(spark, root)).count() == 9)
    // force: branch wins, table-level last-writer-wins
    val fm = CatalogStore.mergeBranch(spark, root, "wip2", force = true)
    assert(!fm.fastForward)
    assert(CatalogStore.read(spark, root, "b",
      CatalogStore.snapshot(spark, root)).count() == 7)
  }

  test("re-merging a long-lived branch is clean: main's 'change' was " +
      "the branch's own earlier merge; real conflicts still detected") {
    val root = Files.createTempDirectory("refsrm").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    CatalogStore.createBranch(spark, root, "live")
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(20)),
      ref = "live")
    val m1 = CatalogStore.mergeBranch(spark, root, "live")
    assert(m1.tables == Seq("t"))
    // keep committing on the SAME branch, then merge again — main's
    // t version came from this branch's merge, so no conflict
    val t2 = orders.limit(30)
    CatalogStore.commit(spark, root, Map("t" -> t2), ref = "live")
    val m2 = CatalogStore.mergeBranch(spark, root, "live")
    assert(m2.tables == Seq("t"))
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root)), t2.toDF())
    // a GENUINE both-sides change still conflicts
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(5)),
      ref = "live")
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(7)))
    intercept[CatalogStore.MergeConflictException] {
      CatalogStore.mergeBranch(spark, root, "live")
    }
    // a branch with no map differences no-ops instead of publishing
    // an empty transaction
    CatalogStore.createBranch(spark, root, "idle")
    val preV = CatalogStore.snapshot(spark, root).version
    val m0 = CatalogStore.mergeBranch(spark, root, "idle")
    assert(m0.tables.isEmpty &&
      CatalogStore.snapshot(spark, root).version == preV)
  }

  test("branch RESTORE merges as the change it is; a branch-removed " +
      "table refuses loudly (no tombstones)") {
    val root = Files.createTempDirectory("refsbr").toString
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(10)))
    val t2 = orders.limit(20)
    CatalogStore.commit(spark, root, Map("t" -> t2)) // main v2
    CatalogStore.createBranch(spark, root, "roll")
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(30)),
      ref = "roll")
    // the branch decides its new load was bad: restore ON THE BRANCH
    // back to its fork — head now maps t to v2's dir again; after a
    // further branch commit, the merge must see the LATEST world
    CatalogStore.restore(spark, root, 2, ref = "roll")
    val t4 = orders.limit(40)
    CatalogStore.commit(spark, root, Map("t" -> t4), ref = "roll")
    val m = CatalogStore.mergeBranch(spark, root, "roll")
    assert(m.tables == Seq("t"))
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root)), t4.toDF())
    // and a branch restore that ROLLS BACK to the fork version merges
    // as a no-op for that table (head == fork ⇒ not a change)
    CatalogStore.createBranch(spark, root, "undo")
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(50)),
      ref = "undo")
    val fork2 = CatalogStore.snapshot(spark, root).version
    CatalogStore.restore(spark, root, fork2, ref = "undo")
    assert(CatalogStore.mergeBranch(spark, root, "undo")
      .tables.isEmpty)
    // removal: a branch restored past a FORK table's creation leaves
    // that table absent at its head — the map has no tombstones, so
    // the merge refuses with advice instead of silently deciding
    // resurrect-or-drop
    val root2 = Files.createTempDirectory("refsbr2").toString
    CatalogStore.commit(spark, root2, Map("a" -> orders.limit(5))) // v1
    CatalogStore.commit(spark, root2, Map("b" -> orders.limit(6))) // v2
    CatalogStore.createBranch(spark, root2, "drop") // fork v2: a, b
    CatalogStore.restore(spark, root2, 1, ref = "drop") // head: a only
    CatalogStore.commit(spark, root2, Map("a" -> orders.limit(7)),
      ref = "drop")
    val e = intercept[IllegalArgumentException] {
      CatalogStore.mergeBranch(spark, root2, "drop")
    }
    assert(e.getMessage.contains("tombstones") &&
      e.getMessage.contains("b"))
  }

  test("branch-first WAP on an unpublished store: stage, audit via " +
      "branch reads, publish by merge") {
    val root = Files.createTempDirectory("refsw").toString
    // no main commit yet: branch forks at 0
    assert(CatalogStore.createBranch(spark, root, "load") == 0)
    val good = orders.limit(80)
    CatalogStore.commit(spark, root, Map("t" -> good), ref = "load")
    // main has NO catalog yet — reads fail loudly, branch serves
    intercept[IllegalStateException] { CatalogStore.snapshot(spark, root) }
    val bSnap = CatalogStore.snapshotRef(spark, root, "load")
    assert(CatalogStore.read(spark, root, "t", bSnap).count() == 80)
    val m = CatalogStore.mergeBranch(spark, root, "load")
    assert(m.fastForward && m.tables == Seq("t"))
    assertSameRows(CatalogStore.read(spark, root, "t",
      CatalogStore.snapshot(spark, root)), good.toDF())
  }

  test("two branch committers race: CAS loser re-parents and lands; " +
      "no orphan catalogs remain") {
    val root = Files.createTempDirectory("refsr").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    for (round <- 1 to 8) {
      val branch = s"race$round"
      CatalogStore.createBranch(spark, root, branch)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 2).map { i =>
        new Thread(() => {
          try CatalogStore.commit(spark, root,
            Map(s"t$i" -> orders.limit(10 + i)), ref = branch)
          catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      // both landed: head carries both tables, parent chain linear
      val head = CatalogStore.refVersion(spark, root, branch).get
      val snap = CatalogStore.snapshotRef(spark, root, branch)
      assert(snap.tables.keySet == Set("a", "t1", "t2"))
      val mHead = CatalogStore.catMeta(spark, root, head)
      val mPrev = CatalogStore.catMeta(spark, root, mHead.parent)
      assert(mHead.ref == branch && mPrev.ref == branch &&
        mPrev.parent == 1)
      // the CAS loser's aborted catalog file was rolled back: every
      // complete catalog is either main's v1 or on a branch chain
      // reachable from a ref — none dangling with this branch's name
      // and a dead parent
      val vs = CatalogStore.catalogVersions(spark, root)
      val branchCats = vs.filter(v =>
        CatalogStore.catMeta(spark, root, v).ref == branch)
      assert(branchCats.toSet == Set(head, mHead.parent),
        s"round $round: dangling branch catalogs: $branchCats")
      CatalogStore.dropBranch(spark, root, branch)
    }
  }

  test("branch committer racing a MAIN committer: both land, worlds " +
      "stay separate") {
    val root = Files.createTempDirectory("refsmx").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    for (round <- 1 to 4) {
      val branch = s"mix$round"
      CatalogStore.createBranch(spark, root, branch)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val tb = new Thread(() => {
        try CatalogStore.commit(spark, root,
          Map("bt" -> orders.limit(5)), ref = branch)
        catch { case e: Throwable => errs.add(e) }
      })
      val tm = new Thread(() => {
        try CatalogStore.commit(spark, root,
          Map("a" -> orders.limit(20 + round)))
        catch { case e: Throwable => errs.add(e) }
      })
      tb.start(); tm.start(); tb.join(); tm.join()
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      assert(!CatalogStore.snapshot(spark, root).tables.contains("bt"))
      assert(CatalogStore.snapshotRef(spark, root, branch)
        .tables.contains("bt"))
      CatalogStore.dropBranch(spark, root, branch)
    }
  }

  test("crashed branch publish (pre-CAS) leaves the ref intact; aged " +
      "vacuum reclaims the orphan; the branch keeps working") {
    val root = Files.createTempDirectory("refsx").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    CatalogStore.createBranch(spark, root, "crashy")
    CatalogStore.commit(spark, root, Map("b" -> orders.limit(5)),
      ref = "crashy")
    val headBefore = CatalogStore.refVersion(spark, root, "crashy").get
    // crash between catalog-file completion and the ref CAS
    CatalogStore.beforeFlip = v => sys.error(s"crash before CAS of $v")
    try intercept[RuntimeException] {
      CatalogStore.commit(spark, root, Map("b" -> orders.limit(6)),
        ref = "crashy", contentionTimeoutMs = 2000L)
    } finally CatalogStore.beforeFlip = _ => ()
    // the ref never moved — branch readers are unaffected
    assert(CatalogStore.refVersion(spark, root, "crashy")
      .contains(headBefore))
    assert(CatalogStore.snapshotRef(spark, root, "crashy")
      .tables("b") == headBefore)
    // the orphan catalog file (if the crash landed after completion)
    // and its v-dir are unreachable; an aged sweep reclaims them and
    // the branch continues committing cleanly
    CatalogStore.vacuum(spark, root, keep = 5, claimAgeMs = 0L)
    val t = CatalogStore.commit(spark, root,
      Map("b" -> orders.limit(7)), ref = "crashy")
    assert(t.committed)
    assert(CatalogStore.snapshotRef(spark, root, "crashy")
      .tables("b") == t.version.get)
    assert(CatalogStore.read(spark, root, "b",
      CatalogStore.snapshotRef(spark, root, "crashy")).count() == 7)
  }

  test("vacuum pins a live branch's chain and fork; dropBranch ends " +
      "the pin") {
    val root = Files.createTempDirectory("refsv").toString
    val b0 = orders.limit(15)
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10),
      "b" -> b0))                                      // main v1 (fork)
    CatalogStore.createBranch(spark, root, "keepme")
    val bb = orders.limit(33)
    CatalogStore.commit(spark, root, Map("b" -> bb), ref = "keepme")
    // main races ahead; keep=1 would drop v1 — the branch pins its
    // fork AND the fork's table versions (merge needs the fork map)
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(20)))
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(30)))
    val vac = CatalogStore.vacuum(spark, root, keep = 1, claimAgeMs = 0L)
    assert(!vac.catalogs.contains(1), s"fork swept: $vac")
    val bSnap = CatalogStore.snapshotRef(spark, root, "keepme")
    assertSameRows(CatalogStore.read(spark, root, "b", bSnap), bb.toDF())
    // and the merge still works after the sweep
    val m = CatalogStore.mergeBranch(spark, root, "keepme")
    assert(m.tables == Seq("b"))
    // drop the branch: its unmerged-chain files become garbage; the
    // merged DATA survives because main's map references it
    CatalogStore.dropBranch(spark, root, "keepme")
    CatalogStore.vacuum(spark, root, keep = 1, claimAgeMs = 0L)
    assertSameRows(CatalogStore.read(spark, root, "b",
      CatalogStore.snapshot(spark, root)), bb.toDF())
  }

  test("branch/tag namespace is ONE atomic file: cross-kind racers " +
      "get exactly one winner; drops are kind-checked") {
    val root = Files.createTempDirectory("refsns").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    for (round <- 1 to 8) {
      val name = s"ns$round"
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val losses = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq(
        new Thread(() => {
          gate.await()
          try { CatalogStore.createBranch(spark, root, name)
            wins.add("branch") }
          catch { case _: IllegalArgumentException => losses.add("branch") }
        }),
        new Thread(() => {
          gate.await()
          try { CatalogStore.createTag(spark, root, name)
            wins.add("tag") }
          catch { case _: IllegalArgumentException => losses.add("tag") }
        }))
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join())
      // EXACTLY one winner — the two-file-era race let both land and
      // the branch then silently shadowed the tag
      assert(wins.size == 1 && losses.size == 1,
        s"round $round: wins=$wins losses=$losses")
      val kind = wins.peek()
      val listed = CatalogStore.refs(spark, root).collect()
        .filter(_.getString(0) == name)
      assert(listed.length == 1 && listed(0).getString(1) == kind,
        s"round $round: refs listing ${listed.toSeq}")
      // kind-checked drop: the wrong verb is refused loudly instead
      // of deleting the other kind's ref
      val wrongDrop = intercept[IllegalArgumentException] {
        if (kind == "branch") CatalogStore.dropTag(spark, root, name)
        else CatalogStore.dropBranch(spark, root, name)
      }
      assert(wrongDrop.getMessage.contains(kind))
      assert(CatalogStore.refVersion(spark, root, name).isDefined)
      if (kind == "branch") CatalogStore.dropBranch(spark, root, name)
      else CatalogStore.dropTag(spark, root, name)
      assert(CatalogStore.refVersion(spark, root, name).isEmpty)
    }
    // dropping a missing name reports false, both verbs
    assert(!CatalogStore.dropBranch(spark, root, "never"))
    assert(!CatalogStore.dropTag(spark, root, "never"))
  }

  test("restore is ref-scoped: a foreign ref's catalog version is " +
      "refused — no constraint/merge-gate bypass through RESTORE") {
    val root = Files.createTempDirectory("refsrs").toString
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(10))) // v1
    CatalogStore.createBranch(spark, root, "wip")
    // branch world: its own table + a constraint main never adopted
    CatalogStore.commit(spark, root, Map("bt" -> orders.limit(5)),
      ref = "wip")                                     // v2 on wip
    CatalogStore.addConstraints(spark, root, Seq(
      CatalogStore.Constraint.check("bt", "b_pos", "o_orderkey >= 0")),
      ref = "wip")                                     // v3 on wip
    CatalogStore.commit(spark, root, Map("t" -> orders.limit(20))) // v4 main
    val branchHead = CatalogStore.refVersion(spark, root, "wip").get
    // main RESTORE to a BRANCH catalog: refused naming the foreign ref
    val e = intercept[IllegalArgumentException] {
      CatalogStore.restore(spark, root, branchHead)
    }
    assert(e.getMessage.contains("wip") && e.getMessage.contains("history"))
    // main's constraints were NOT silently replaced by the branch's
    assert(CatalogStore.constraintsOf(spark, root,
      CatalogStore.snapshot(spark, root)).isEmpty)
    // branch RESTORE to a main catalog AHEAD of its history: refused
    intercept[IllegalArgumentException] {
      CatalogStore.restore(spark, root, 4, ref = "wip")
    }
    // legitimate restores still work on both refs: main to its own
    // past, the branch to its fork (main v1 IS branch history)
    assert(CatalogStore.restore(spark, root, 1).committed)
    assert(CatalogStore.restore(spark, root, 1, ref = "wip").committed)
    assert(CatalogStore.snapshotRef(spark, root, "wip").tables ==
      Map("t" -> 1))
  }

  test("legacy two-file ref layout: bare-version ref= and tag= files " +
      "resolve, list, pin vacuum, block the namespace, and migrate") {
    val root = Files.createTempDirectory("refslegacy").toString
    val a1 = orders.limit(10)
    CatalogStore.commit(spark, root, Map("a" -> a1))               // v1
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(20))) // v2
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(rel: String, body: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(root, rel)
      val o = fs.create(p, true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
    }
    def readRaw(rel: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(root, rel))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    // pre-migration store state: every ref= file held a BARE version
    // (always a branch); tags lived in separate tag= files
    put("_cat/ref=oldbranch", "1")
    put("_cat/tag=oldtag", "1")
    // resolution and listing see both, with kinds
    assert(CatalogStore.refVersion(spark, root, "oldbranch").contains(1))
    assert(CatalogStore.refVersion(spark, root, "oldtag").contains(1))
    val refs = CatalogStore.refs(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(refs == Set(("main", "branch", 2), ("oldbranch", "branch", 1),
      ("oldtag", "tag", 1)), s"refs listing: $refs")
    // the legacy tag's world reads, stays immutable, holds its name
    assert(CatalogStore.snapshotRef(spark, root, "oldtag").tables ==
      Map("a" -> 1))
    intercept[Exception] {
      CatalogStore.commit(spark, root, Map("a" -> a1), ref = "oldtag")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.createBranch(spark, root, "oldtag")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.createTag(spark, root, "oldtag")
    }
    // kind-checked drops stay loud across layouts
    intercept[IllegalArgumentException] {
      CatalogStore.dropBranch(spark, root, "oldtag")
    }
    intercept[IllegalArgumentException] {
      CatalogStore.dropTag(spark, root, "oldbranch")
    }
    // vacuum(keep=1) would reclaim v1 — BOTH legacy refs pin it
    assert(CatalogStore.vacuum(spark, root, keep = 1,
      claimAgeMs = 0L).catalogs.isEmpty)
    assertSameRows(CatalogStore.read(spark, root, "a",
      CatalogStore.snapshotRef(spark, root, "oldtag")), a1.toDF())
    // an UNREADABLE ref file refuses the vacuum instead of unpinning
    put("_cat/ref=corrupt", "garbage junk")
    intercept[IllegalStateException] {
      CatalogStore.vacuum(spark, root, keep = 1, claimAgeMs = 0L)
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, "_cat/ref=corrupt"),
      false)
    // committing to the legacy branch advances it AND migrates the
    // file body to the current `<kind> <version>` form
    val tx = CatalogStore.commit(spark, root,
      Map("b" -> orders.limit(5)), ref = "oldbranch")
    assert(tx.committed)
    val head = CatalogStore.refVersion(spark, root, "oldbranch").get
    assert(readRaw("_cat/ref=oldbranch") == s"branch $head")
    // drop both; only then does vacuum reclaim v1
    assert(CatalogStore.dropTag(spark, root, "oldtag"))
    assert(CatalogStore.refVersion(spark, root, "oldtag").isEmpty)
    assert(CatalogStore.dropBranch(spark, root, "oldbranch"))
    val vac = CatalogStore.vacuum(spark, root, keep = 1, claimAgeMs = 0L)
    assert(vac.catalogs.contains(1), s"reclaimed: ${vac.catalogs}")
    intercept[Exception] { CatalogStore.snapshot(spark, root, Some(1)) }
  }

  test("vacuum sweeps crashed ref/tag/CAS temporaries (aged), keeps " +
      "young ones") {
    val root = Files.createTempDirectory("refstmp").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def touch(rel: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root, rel)
      val o = fs.create(p, true)
      try o.write("junk".getBytes("UTF-8")) finally o.close()
      p
    }
    val crashed = Seq(touch("_cat/.branch=x.tmp.abc123"),
      touch("_cat/.tag=y.tmp.def456"), touch("_cat/.ref=z.tmp.7"),
      touch("_cat_current.tmp.9"))
    // young sweep: everything survives (a LIVE writer's tmp must not
    // be yanked mid-rename)
    CatalogStore.vacuum(spark, root, keep = 5, claimAgeMs = 3600000L)
    crashed.foreach(p => assert(fs.exists(p), s"young tmp swept: $p"))
    // aged sweep reclaims all of them; real refs survive
    CatalogStore.createTag(spark, root, "keep-tag")
    CatalogStore.vacuum(spark, root, keep = 5, claimAgeMs = 0L)
    crashed.foreach(p => assert(!fs.exists(p), s"aged tmp leaked: $p"))
    assert(CatalogStore.refVersion(spark, root, "keep-tag").contains(1))
  }

  test("branch committer racing mergeBranch: repeat-run, no lost " +
      "tables, merge sees a consistent head") {
    val root = Files.createTempDirectory("refsmg").toString
    CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
    for (round <- 1 to 8) {
      val branch = s"mg$round"
      CatalogStore.createBranch(spark, root, branch)
      CatalogStore.commit(spark, root,
        Map(s"pre$round" -> orders.limit(5)), ref = branch)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val committer = new Thread(() => {
        gate.await()
        try CatalogStore.commit(spark, root,
          Map(s"late$round" -> orders.limit(6)), ref = branch)
        catch { case e: Throwable => errs.add(e) }
      })
      val merger = new Thread(() => {
        gate.await()
        try CatalogStore.mergeBranch(spark, root, branch)
        catch { case e: Throwable => errs.add(e) }
      })
      committer.start(); merger.start(); gate.countDown()
      committer.join(); merger.join()
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      // the merge carried AT LEAST the pre-race table; the racing
      // commit is either already on main or still on the branch —
      // never lost
      val main = CatalogStore.snapshot(spark, root).tables
      assert(main.contains(s"pre$round"), s"round $round: $main")
      if (!main.contains(s"late$round")) {
        assert(CatalogStore.snapshotRef(spark, root, branch)
          .tables.contains(s"late$round"), s"round $round: lost commit")
        // a second merge drains it
        CatalogStore.mergeBranch(spark, root, branch)
        assert(CatalogStore.snapshot(spark, root).tables
          .contains(s"late$round"))
      }
      CatalogStore.dropBranch(spark, root, branch)
    }
  }

  test("vacuum live-racing in-flight commits: concurrent sweeps under " +
      "the age contract never lose a commit; the boundary holds at " +
      "measured claim age, both sides") {
    // leg A — TRUE concurrency, no sync hook: a writer lands 6
    // commits while this thread vacuums continuously with a sane
    // claim age (the production posture: claimAgeMs >> any stall).
    // Repeat-run: the interleaving shifts with FS/JIT timing, so the
    // vacuum's listing races claim creation, staged renames, catalog
    // completion, and the pointer flip across rounds.
    for (round <- 1 to 4) {
      val root = Files.createTempDirectory(s"refslive$round").toString
      CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
      @volatile var werr: Throwable = null
      val writer = new Thread(() => {
        try (1 to 6).foreach { i =>
          val tx = CatalogStore.commit(spark, root,
            Map(s"t$i" -> orders.limit(i + 3)),
            contentionTimeoutMs = 20000L)
          if (!tx.committed)
            werr = new IllegalStateException(s"t$i not committed")
        } catch { case t: Throwable => werr = t }
      })
      writer.start()
      var sweeps = 0
      while (writer.isAlive) {
        CatalogStore.vacuum(spark, root, keep = 3, claimAgeMs = 60000L)
        sweeps += 1
      }
      writer.join()
      assert(werr == null, s"round $round writer failed: $werr")
      assert(sweeps > 0, s"round $round: no sweep overlapped the writer")
      val snap = CatalogStore.snapshot(spark, root)
      (1 to 6).foreach(i => assert(CatalogStore.read(spark, root,
        s"t$i", snap).count() == i + 3, s"round $round t$i rows"))
    }
    // leg B — the boundary at MEASURED claim age, deterministic via
    // the pre-flip hook: a sweep whose threshold sits just ABOVE the
    // live claim's actual age keeps it (the writer lands); a crashed
    // claim swept with a threshold just BELOW its actual age is
    // reclaimed (aged uses now - mtime >= claimAgeMs).
    val fsB = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ageOf(root: String, rel: String): Long =
      System.currentTimeMillis() - fsB.getFileStatus(
        new org.apache.hadoop.fs.Path(root, rel)).getModificationTime
    for (round <- 1 to 8) {
      val root = Files.createTempDirectory(s"refsbnd$round").toString
      CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
      CatalogStore.beforeFlip = v => {
        Thread.sleep(150)
        CatalogStore.vacuum(spark, root, keep = 5,
          claimAgeMs = ageOf(root, s"_cat/claim=$v") + 400L)
      }
      val tx = try CatalogStore.commit(spark, root,
        Map("b" -> orders.limit(7)), contentionTimeoutMs = 5000L)
      finally CatalogStore.beforeFlip = _ => ()
      assert(tx.committed, s"round $round: just-above-age sweep broke " +
        "a live claim")
      assert(CatalogStore.read(spark, root, "b",
        CatalogStore.snapshot(spark, root)).count() == 7)
      // crashed claim, swept just BELOW its measured age → reclaimed,
      // and the store keeps committing
      CatalogStore.beforeFlip = _ => sys.error("crash pre-flip")
      try intercept[RuntimeException] {
        CatalogStore.commit(spark, root, Map("c" -> orders.limit(9)),
          contentionTimeoutMs = 2000L)
      } finally CatalogStore.beforeFlip = _ => ()
      // the crash's exception handler already deleted its claim; the
      // residue is the COMPLETED catalog file + v-dirs, orphaned
      // below the unflipped pointer. Sweep with the threshold just
      // BELOW the orphan's measured age (aged uses >=) → reclaimed.
      Thread.sleep(150)
      val crashedV = CatalogStore.currentVersion(spark, root).get + 1
      CatalogStore.vacuum(spark, root, keep = 5,
        claimAgeMs = math.max(0L, ageOf(root, s"_cat/c=$crashedV") - 100L))
      val again = CatalogStore.commit(spark, root,
        Map("d" -> orders.limit(4)))
      assert(again.committed, s"round $round: post-reclaim commit")
      val snap2 = CatalogStore.snapshot(spark, root)
      assert(!snap2.tables.contains("c"))
      assert(CatalogStore.read(spark, root, "d", snap2).count() == 4)
    }
  }

  test("vacuum at the claim-age boundary: a vacuum INSIDE a live " +
      "writer's stall window keeps its claim; an aged sweep after a " +
      "crash reclaims and the store keeps committing") {
    for (round <- 1 to 8) {
      val root = Files.createTempDirectory(s"refsvc$round").toString
      CatalogStore.commit(spark, root, Map("a" -> orders.limit(10)))
      if (round % 2 == 1) {
        // stall a committer between its claim+renames and the flip,
        // with vacuum running INSIDE the stall (age window still
        // open): the claim, the completed catalog file, and the
        // already-renamed v-dir must all survive — sweeping any of
        // them would let the number be re-claimed under the live
        // writer or flip the pointer onto deleted metadata
        CatalogStore.beforeFlip = _ =>
          CatalogStore.vacuum(spark, root, keep = 5,
            claimAgeMs = 3600000L)
        val tx = try CatalogStore.commit(spark, root,
          Map("b" -> orders.limit(7)), contentionTimeoutMs = 2000L)
        finally CatalogStore.beforeFlip = _ => ()
        assert(tx.committed, s"round $round: live claim swept")
        assert(CatalogStore.read(spark, root, "b",
          CatalogStore.snapshot(spark, root)).count() == 7)
      } else {
        // the writer CRASHES pre-flip; the aged sweep reclaims its
        // claim + orphan catalog, and fresh commits (which must
        // re-claim the same number) land cleanly
        CatalogStore.beforeFlip = v => sys.error(s"crash pre-flip $v")
        try intercept[RuntimeException] {
          CatalogStore.commit(spark, root,
            Map("b" -> orders.limit(7)), contentionTimeoutMs = 2000L)
        } finally CatalogStore.beforeFlip = _ => ()
        CatalogStore.vacuum(spark, root, keep = 5, claimAgeMs = 0L)
        val again = CatalogStore.commit(spark, root,
          Map("c" -> orders.limit(8)))
        assert(again.committed)
        assert(CatalogStore.read(spark, root, "c",
          CatalogStore.snapshot(spark, root)).count() == 8)
        assert(!CatalogStore.snapshot(spark, root).tables.contains("b"))
      }
    }
  }
}
