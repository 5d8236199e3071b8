package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table transactional catalog — the cross-TABLE atomicity
  * layer [[VersionedStore]] (one table) and
  * [[AnalysisStore.writeAuditPublish]] (one write) stop short of:
  * one commit publishes N tables and a reader can NEVER observe a
  * mix of old-A with new-B (the Nessie/"multi-table transaction"
  * gap in first-generation lakehouse formats — a report joining a
  * fact to its freshly-republished dim across a torn boundary is
  * wrong in a way no per-table guarantee can catch).
  *
  * Layout — immutability everywhere, one mutable pointer:
  * {{{
  * root/
  *   _cat/c=N        one immutable catalog file per transaction:
  *                   line 1 "N", then "table<TAB>version" rows
  *   _cat/claim=N    transient exclusive-claim marker (separate from
  *                   the catalog file — see [[claimFile]]); deleted
  *                   after the pointer flip, swept by vacuum if its
  *                   commit died
  *   _cat_current    one line "N" — THE pointer, rename-flipped
  *   <table>/v=M/    immutable table snapshots (M = the catalog
  *                   version whose transaction wrote them)
  * }}}
  *
  * The commit protocol: claim `_cat/claim=next` with an exclusive create
  * (two racers computing the same `next` collide HERE, before any
  * data moves — the loser fails loudly, transaction-granular, same
  * contract as VersionedStore's per-version claim), write every
  * table's `v=next` dir, run the audits against the STAGED dirs
  * (write-audit-publish at transaction granularity: one failing
  * audit rolls back every table's staging), complete the catalog
  * file, rename-flip the pointer. A crash anywhere before the flip
  * leaves unreferenced dirs and an unreferenced catalog file —
  * readers keep resolving the old catalog; all-old or all-new,
  * never torn.
  *
  * Reads resolve the pointer ONCE into an immutable [[Snapshot]]
  * (catalog version + table→version map); every table read off one
  * snapshot is mutually consistent no matter how many commits land
  * meanwhile — MVCC snapshot isolation, catalog-versioned time
  * travel included (resolve an OLD catalog version and every table
  * reads as of that transaction). Tables untouched by a commit carry
  * their entry forward, so the catalog map always names a complete,
  * existing version per table.
  *
  * 100 TB shape: the catalog file is |tables| lines and the commit's
  * data cost is exactly the tables it rewrites — right for the
  * serving tier's analysis tables (VersionedStore's contract), with
  * consistency now spanning the whole report surface.
  */
object CatalogStore {

  /** Resolved catalog state: reads off one snapshot are mutually
    * consistent (pointer resolved exactly once).
    */
  final case class Snapshot(version: Int, tables: Map[String, Int])

  /** What a [[commit]] did: the new catalog version on success, or
    * the failing audit's name with every staged byte rolled back.
    */
  final case class CatalogTx(version: Option[Int],
      failedAudit: Option[String]) {
    def committed: Boolean = version.isDefined
  }

  /** A named audit against one STAGED table of the transaction. */
  final case class Audit(name: String, table: String,
      check: DataFrame => Boolean)

  /** Thrown when the exclusive catalog-file claim finds the version
    * already taken — i.e. another writer committed between our
    * version read and our claim. Retryable by design: the loser's
    * data hasn't been written yet, so re-reading the new current and
    * re-claiming the next number is a clean optimistic retry.
    */
  final class CommitContentionException(version: Int,
      cause: Throwable) extends IllegalStateException(
    s"concurrent commit detected: catalog version $version is " +
      "already claimed", cause)

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) =
    new org.apache.hadoop.fs.Path(root, "_cat_current")

  private def catFile(root: String, v: Int) =
    new org.apache.hadoop.fs.Path(root, s"_cat/c=$v")

  /** The exclusive-claim marker is a SEPARATE file from the catalog
    * file on purpose: completing a commit by renaming the catalog
    * body OVER the claim (the original design) transiently DELETES
    * the claim inside the overwrite-rename, and a spinning retrier
    * can atomically re-claim the number in that window — the loser
    * then fails its completion rename and rolls back the NEW
    * claimant's staging. With a separate marker the claim file is
    * never touched between claim and post-flip cleanup, and the
    * catalog file is created by a NO-overwrite rename (it either
    * appears complete or not at all — no torn-body handling needed).
    */
  private def claimFile(root: String, v: Int) =
    new org.apache.hadoop.fs.Path(root, s"_cat/claim=$v")

  private def tableDir(root: String, name: String, v: Int) =
    new org.apache.hadoop.fs.Path(root, s"$name/v=$v")

  /** Read a small catalog/pointer file. ChecksumFileSystem renames
    * the data file and its .crc sidecar as two operations, so a read
    * concurrent with a rename-flip can observe new bytes under the
    * old checksum — a transient torn state, not corruption. Retry it
    * a few times before giving up.
    */
  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(p)
        try return new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      } catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          attempt += 1
          if (attempt > 20) throw e
          Thread.sleep(5L * attempt)
      }
    }
    sys.error("unreachable")
  }

  /** Current catalog version, if any commit completed. The pointer's
    * overwrite-rename is delete-then-rename on the local filesystem,
    * so a read concurrent with a flip can observe NO pointer for a
    * moment — if complete catalog files exist, a missing pointer is
    * retried before concluding the store is unpublished (a writer
    * that believed "unpublished" mid-flip would compute next = 1 and
    * collide with history).
    */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val fs = fsOf(spark, root)
    var attempt = 0
    while (true) {
      if (fs.exists(pointer(root)))
        return Some(readSmall(fs, pointer(root)).trim).filter(_.nonEmpty)
          .map(_.toInt)
      if (catalogVersions(spark, root).isEmpty) return None
      attempt += 1
      if (attempt > 20) return None // genuinely crashed pre-first-flip
      Thread.sleep(5L * attempt)
    }
    sys.error("unreachable")
  }

  /** All catalog versions physically present, ascending — COMPLETE
    * catalog files only (the no-overwrite completion rename means a
    * c=N either exists whole or not at all). Only names matching
    * `c=<digits>` count: claim markers and a leftover `c=N.tmp` from
    * a crash between the tmp create and its rename must not brick
    * every later commit/vacuum with a NumberFormatException.
    */
  def catalogVersions(spark: SparkSession, root: String): Seq[Int] = {
    val fs = fsOf(spark, root)
    val dir = new org.apache.hadoop.fs.Path(root, "_cat")
    val numbered = "^c=(\\d+)$".r
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .flatMap(s => s.getPath.getName match {
        case numbered(n) => Some(n.toInt)
        case _           => None
      }).sorted
  }

  /** Resolve the catalog ONCE — current, or an old version (catalog
    * time travel: every table then reads as of that transaction).
    */
  def snapshot(spark: SparkSession, root: String,
      version: Option[Int] = None): Snapshot = {
    val fs = fsOf(spark, root)
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed catalog under $root"))
    val body = readSmall(fs, catFile(root, v))
    val lines = body.split("\n").map(_.trim).filter(_.nonEmpty)
    require(lines.nonEmpty && lines.head.toInt == v,
      s"catalog file c=$v is incomplete (crashed commit?)")
    Snapshot(v, lines.tail.map { l =>
      val Array(n, tv) = l.split("\t")
      n -> tv.toInt
    }.toMap)
  }

  /** Read one table off a resolved snapshot — N reads off the SAME
    * snapshot are the consistency guarantee; resolving per-read
    * would reopen the torn-boundary window commits exist to close.
    */
  def read(spark: SparkSession, root: String, name: String,
      snap: Snapshot): DataFrame = {
    val v = snap.tables.getOrElse(name, throw new IllegalArgumentException(
      s"table $name is not in catalog version ${snap.version} " +
        s"(has: ${snap.tables.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(tableDir(root, name, v).toString)
  }

  /** Convenience: resolve the current snapshot and read one table.
    * For MULTI-table reads that must agree, resolve [[snapshot]]
    * once and pass it to [[read]] per table instead.
    */
  def readCurrent(spark: SparkSession, root: String,
      name: String): DataFrame =
    read(spark, root, name, snapshot(spark, root))

  /** What [[vacuum]] removed: catalog versions dropped, and table
    * versions dropped per table.
    */
  final case class CatalogVacuum(catalogs: Seq[Int],
      tableVersions: Map[String, Seq[Int]])

  /** Drop all but the newest `keep` catalog versions — never the
    * pointer target — and every table version NO kept catalog
    * references. The subtlety carry-forward creates: a table version
    * can be referenced by MANY catalog versions (a dim committed once
    * rides through every later transaction's map), so table-version
    * liveness is a REFCOUNT over the kept catalogs' maps, not an
    * age cutoff — vacuum(keep = 1) after 100 commits that never
    * touched the dim must keep the dim's original v=1 dir. Runs under
    * the store's single-writer contract (no in-flight commit), so
    * unparseable claim files OLDER than the kept range are crashed
    * commits and are swept with their staged dirs.
    */
  def vacuum(spark: SparkSession, root: String,
      keep: Int): CatalogVacuum = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed catalog under $root"))
    val all = catalogVersions(spark, root)
    val snaps: Map[Int, Option[Snapshot]] = all.map(v => v ->
      (try Some(snapshot(spark, root, Some(v)))
       catch { case _: Exception => None })).toMap // torn file: no map
    // `keep` counts COMMITTED catalogs (complete AND at-or-below the
    // pointer); under vacuum's no-in-flight contract everything else
    // in _cat is a dead commit's leftover — claim markers and
    // above-pointer catalog files would otherwise block the
    // sequential `next` forever
    val committed = all.filter(v => v <= cur && snaps(v).isDefined)
    val keepSet = committed.takeRight(keep).toSet + cur
    val referenced: Set[(String, Int)] = keepSet.toSeq
      .flatMap(v => snaps.get(v).flatten.toSeq.flatMap(_.tables.toSeq))
      .toSet
    val doomedCats = all.filterNot(keepSet.contains)
    doomedCats.foreach(v => fs.delete(catFile(root, v), false))
    val claimRe = "^claim=(\\d+)$".r
    val deadClaims = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "_cat")).toSeq
      .filter(_.isFile)
      .flatMap(s => s.getPath.getName match {
        case claimRe(n) => Some(n.toInt)
        case _          => None
      })
    deadClaims.foreach(v => fs.delete(claimFile(root, v), false))
    val tables = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .toSeq.filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("_") &&
        !e.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
    val droppedTv = tables.map { t =>
      val vs = fs.listStatus(
          new org.apache.hadoop.fs.Path(root, t)).toSeq
        .filter(e => e.isDirectory && e.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toInt).sorted
      val doomed = vs.filterNot(v => referenced.contains((t, v)))
      doomed.foreach(v => fs.delete(tableDir(root, t, v), true))
      t -> doomed
    }.filter(_._2.nonEmpty).toMap
    CatalogVacuum((doomedCats ++ deadClaims).distinct.sorted, droppedTv)
  }

  /** Atomically publish `tables` as one transaction; tables not in
    * the map carry their current version forward. Audits run against
    * the STAGED dirs; the first failure rolls back every staged
    * table AND the claim, leaving the store byte-identical to the
    * pre-commit state. Concurrency: the exclusive catalog-file claim
    * is still the mechanism — the loser of a same-`next` race fails
    * the claim before writing any data — but the loss is handled by
    * a bounded optimistic retry: re-read current, recompute `next`,
    * re-claim, with backoff until `contentionTimeoutMs`. Claims are
    * STRICTLY SEQUENTIAL (`next` = committed current + 1, never
    * skipping an in-flight claim): version N+1's carry-forward map
    * must build on N's FINAL map, so a writer finding N+1 claimed
    * waits for the holder to flip rather than claiming N+2 against a
    * stale prior (which would silently drop the in-flight commit's
    * tables from the carry-forward — the lost-update anomaly).
    * A claim whose holder crashed blocks commits until the timeout
    * (loudly — [[CommitContentionException]]), and [[vacuum]] sweeps
    * it; sustained live contention past the timeout means the store
    * needs a queue, not more blind retries.
    */
  def commit(spark: SparkSession, root: String,
      tables: Map[String, DataFrame],
      audits: Seq[Audit] = Seq.empty,
      contentionTimeoutMs: Long = 60000L): CatalogTx = {
    val deadline = System.currentTimeMillis + contentionTimeoutMs
    var attempt = 0
    while (true) {
      val next = currentVersion(spark, root).getOrElse(0) + 1
      try return commitAs(spark, root, tables, audits, next)
      catch {
        case e: CommitContentionException =>
          attempt += 1
          if (System.currentTimeMillis > deadline) throw e
          Thread.sleep(math.min(500L, 25L * attempt))
      }
    }
    sys.error("unreachable")
  }

  /** [[commit]]'s write path at a SPECIFIC version — package-visible
    * so the claim collision is directly testable (two racers
    * computing the same `next` meet here; going through [[commit]]
    * a pre-planted claim file just bumps `next` past it).
    */
  private[graft] def commitAs(spark: SparkSession, root: String,
      tables: Map[String, DataFrame],
      audits: Seq[Audit], next: Int): CatalogTx = {
    require(tables.nonEmpty, "a transaction must publish at least one table")
    audits.foreach(a => require(tables.contains(a.table),
      s"audit ${a.name} names ${a.table}, not in this transaction " +
        "(committed tables are immutable — audit them at their own commit)"))
    val fs = fsOf(spark, root)
    // claim the transaction number FIRST — racers fail here, loudly
    val claim = claimFile(root, next)
    try FsAtomic.createExclusive(fs, claim)
    catch {
      case e: java.io.IOException =>
        throw new CommitContentionException(next, e)
    }
    // set ONLY after the completion rename succeeds: rollback must
    // never delete a c=next it did not create (it could be a real
    // committed catalog this writer collided with)
    var completedCat = false
    def rollbackStaged(): Unit = {
      tables.keys.foreach(n =>
        fs.delete(tableDir(root, n, next), true))
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_cat/c=$next.tmp"),
        false)
      if (completedCat) fs.delete(catFile(root, next), false)
      fs.delete(new org.apache.hadoop.fs.Path(root,
        s"_cat_current.tmp.$next"), false)
      fs.delete(claim, false)
    }
    try {
      // prior map AFTER the claim: a commit that completed between
      // our version read and our claim is now visible, so the
      // carry-forward builds on the latest committed state
      val priorV = currentVersion(spark, root)
      val prior = priorV
        .map(v => snapshot(spark, root, Some(v)).tables)
        .getOrElse(Map.empty)
      tables.foreach { case (name, df) =>
        df.write.mode("errorifexists")
          .parquet(tableDir(root, name, next).toString)
      }
      val failed = audits.find(a => !a.check(
        spark.read.parquet(tableDir(root, a.table, next).toString)))
      failed match {
        case Some(a) =>
          rollbackStaged()
          CatalogTx(None, Some(a.name))
        case None =>
          val map = prior ++ tables.keys.map(_ -> next)
          val body = (next.toString +: map.toSeq.sortBy(_._1)
            .map { case (n, v) => s"$n\t$v" }).mkString("\n")
          val tmp = new org.apache.hadoop.fs.Path(root, s"_cat/c=$next.tmp")
          val o = fs.create(tmp, true)
          try o.write(body.getBytes("UTF-8")) finally o.close()
          // NO-overwrite rename: we hold the claim, so an existing
          // c=next means our `next` was stale (a committed catalog we
          // raced, or a dead commit's leftover) — contention, never
          // something to rename over or delete
          try org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri,
              spark.sparkContext.hadoopConfiguration)
            .rename(tmp, catFile(root, next),
              org.apache.hadoop.fs.Options.Rename.NONE)
          catch {
            case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
              throw new CommitContentionException(next, e)
          }
          completedCat = true
          // the pointer flip is the commit point — and it must only
          // move FORWARD: if an overlapping writer claimed a later
          // number after us but flipped first (it read a prior map
          // that predates our still-in-flight transaction), flipping
          // back to `next` would silently drop its commit. Treat
          // that overlap as contention: roll back (including our
          // completed catalog file) and let the retry rebuild on the
          // latest state. Plain-filesystem rename is not CAS, so a
          // flip racing inside this check's window remains the
          // documented residual; the claim ordering makes it require
          // two writers interleaving at sub-rename granularity.
          if (currentVersion(spark, root).exists(_ > next)) {
            // the outer catch rolls back claim + staged dirs + tmp
            throw new CommitContentionException(next, null)
          }
          // per-transaction tmp name: a SHARED tmp would let two
          // overlapping flips delete each other's staging mid-rename
          val ptmp = new org.apache.hadoop.fs.Path(root,
            s"_cat_current.tmp.$next")
          val po = fs.create(ptmp, true)
          try po.write(next.toString.getBytes("UTF-8")) finally po.close()
          org.apache.hadoop.fs.FileContext.getFileContext(ptmp.toUri,
              spark.sparkContext.hadoopConfiguration)
            .rename(ptmp, pointer(root),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          // committed: the claim marker has done its job
          fs.delete(claim, false)
          CatalogTx(Some(next), None)
      }
    } catch {
      case e: Throwable =>
        rollbackStaged()
        throw e
    }
  }
}
