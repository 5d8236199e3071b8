package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table store — time travel, rollback, and audit history
  * with plain parquet directories (the Delta/Iceberg snapshot idea
  * reduced to its load-bearing parts): every publish writes a NEW
  * immutable version directory `v=N` and then atomically flips a
  * one-line `_current` pointer; readers resolve the pointer once and
  * scan an immutable dir, so a publish can never tear a running scan
  * (the old version stays byte-intact until vacuumed). Rollback is a
  * pointer flip to an older N — instant, data-free, and itself
  * auditable.
  *
  * Pointer atomicity: written to `_current.tmp` then renamed over
  * `_current` (HDFS/POSIX rename semantics — readers see the old or
  * the new pointer, never a torn one). A crash between the version
  * write and the pointer flip leaves an unreferenced `v=N` dir that
  * the next publish overwrites or [[vacuum]] removes — never a
  * corrupt table.
  *
  * 100 TB shape: versions share nothing (full snapshots) — right for
  * published ANALYSIS tables (reports, views, indexes: small relative
  * to the base data, re-derived each publish), wrong for the raw
  * corpus itself (use the incremental stores + SCD2 history there;
  * this class is the serving-side complement). [[vacuum]] bounds the
  * storage multiplier to `keep` versions.
  */
object VersionedStore {

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(path: String) =
    new org.apache.hadoop.fs.Path(path, "_current")

  private def versionDir(path: String, v: Int) =
    new org.apache.hadoop.fs.Path(path, s"v=$v")

  /** Current version number, if any publish completed.
    * ChecksumFileSystem renames the data file and its .crc sidecar
    * as two operations, so a read concurrent with a pointer flip can
    * observe new bytes under the old checksum — a transient torn
    * state, retried, not corruption.
    */
  def current(spark: SparkSession, path: String): Option[Int] = {
    val fs = fsOf(spark, path)
    val p = pointer(path)
    if (!fs.exists(p)) None
    else {
      var attempt = 0
      while (true) {
        try {
          val in = fs.open(p)
          try {
            val s = new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
            return if (s.isEmpty) None else Some(s.toInt)
          } finally in.close()
        } catch {
          case e: org.apache.hadoop.fs.ChecksumException =>
            attempt += 1
            if (attempt > 20) throw e
            Thread.sleep(5L * attempt)
        }
      }
      sys.error("unreachable")
    }
  }

  /** All version numbers physically present (referenced or not),
    * ascending.
    */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt).sorted
  }

  /** Publish a new version: write `df` to the next `v=N`, flip the
    * pointer. Returns N. The previous version stays readable (time
    * travel) until vacuumed.
    *
    * Concurrency contract: the version number is claimed with a
    * TRULY exclusive marker create ([[FsAtomic.createExclusive]] —
    * atomic on file:// and HDFS alike), so two concurrent publishers
    * that compute the same N collide on the claim; the loser RETRIES
    * against the winner's new numbering (versions are independent
    * snapshots — no carry-forward map, so a retried publish is
    * always safe) for up to `maxRetries` straight collisions, then
    * fails loudly. Readers are never affected either way (they only
    * ever see complete, pointed-at versions); note last-flip-wins
    * pointer semantics between overlapping publishers — both
    * versions exist and time-travel, [[rollback]] re-points freely.
    * A crashed publish's leftover `v=N` dir is never reclaimed —
    * `next` counts every physical dir, so numbering skips it and
    * [[vacuum]] sweeps it.
    */
  def publish(spark: SparkSession, path: String, df: DataFrame,
      maxRetries: Int = 5): Int = {
    var attempt = 0
    while (true) {
      // next = one past the highest version that EXISTS or is pointed
      // at — publishing after a rollback must never overwrite a live
      // (or time-travelable) number
      val next = (current(spark, path).toSeq ++ versions(spark, path))
        .maxOption.getOrElse(0) + 1
      try {
        publishAs(spark, path, df, next)
        return next
      } catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.contains("concurrent publish") =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(25L * attempt)
      }
    }
    sys.error("unreachable")
  }

  /** Publish `df` as the SPECIFIC version `v` — [[publish]]'s write
    * path, package-visible so the claim collision is directly
    * testable (two racers computing the same `next` meet here).
    */
  private[graft] def publishAs(
      spark: SparkSession, path: String, df: DataFrame, v: Int): Unit = {
    val fs = fsOf(spark, path)
    val dir = versionDir(path, v)
    val claim = new org.apache.hadoop.fs.Path(dir, "_claim")
    try FsAtomic.createExclusive(fs, claim) // throws if already claimed
    catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"concurrent publish detected: $dir is already claimed — " +
          "the loser retries through publish()", e)
    }
    // append mode: the dir exists (it holds the claim marker, hidden
    // from parquet readers by its underscore prefix)
    df.write.mode("append").parquet(dir.toString)
    setPointer(spark, path, v)
  }

  /** Flip the pointer to an EXISTING version — rollback (or
    * roll-forward). Instant and data-free.
    */
  def rollback(spark: SparkSession, path: String, v: Int): Unit = {
    require(versions(spark, path).contains(v),
      s"version $v does not exist under $path")
    setPointer(spark, path, v)
  }

  private def setPointer(spark: SparkSession, path: String, v: Int): Unit = {
    val fs = fsOf(spark, path)
    // per-version tmp name: a SHARED tmp would let two overlapping
    // flips delete each other's staging mid-rename
    val tmp = new org.apache.hadoop.fs.Path(path, s"_current.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // atomic OVERWRITE rename (FileContext, not FileSystem.rename):
    // delete-then-rename would open a crash window with NO pointer at
    // all — the store would look unpublished while every version dir
    // is intact. With the overwrite rename a reader sees the old
    // pointer or the new one, never neither. Local fs still
    // implements the overwrite as delete+rename internally, so TWO
    // concurrent flips can race each other's window — the loser sees
    // FileAlreadyExists and retries (last flip wins by contract).
    var attempt = 0
    while (true) {
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri,
            spark.sparkContext.hadoopConfiguration)
          .rename(tmp, pointer(path),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        return
      } catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          attempt += 1
          if (attempt > 20) throw e
          Thread.sleep(5L * attempt)
      }
    }
  }

  /** Read the current version, or a specific one (time travel). */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(current(spark, path)).getOrElse(
      throw new IllegalStateException(s"no published version under $path"))
    require(versions(spark, path).contains(v),
      s"version $v does not exist under $path (vacuumed?)")
    spark.read.parquet(versionDir(path, v).toString)
  }

  /** Change data feed between two published versions — what moved
    * between `vFrom` and `vTo`, by id and content hash: the CDF read
    * Iceberg/Delta serve from commit logs, recovered here for
    * full-snapshot stores by diffing the two IMMUTABLE version dirs
    * ([[graft.operators.Incremental.snapshotDiff]]: one id-keyed
    * full-outer join of (id, md5) projections — each version scanned
    * once, reduced to two narrow columns before the exchange).
    * Because version dirs are immutable and the pointer is not
    * consulted, the feed is stable under concurrent publishes and
    * readable for any un-vacuumed pair — including BACKWARD feeds
    * (vFrom newer than vTo), which is how a rollback's blast radius
    * is audited before flipping the pointer.
    */
  def changesBetween(spark: SparkSession, path: String,
      vFrom: Int, vTo: Int, idCol: String,
      contentCol: String): DataFrame =
    graft.operators.Incremental.snapshotDiff(
      read(spark, path, Some(vFrom)), read(spark, path, Some(vTo)),
      idCol, contentCol)

  /** Audit view of the store: one row per physical version —
    * (version, n_files, bytes, modified_ms, is_current). Driver-side
    * listing (version count is model-sized by [[vacuum]]'s contract);
    * `modified_ms` is the version dir's newest file mtime, i.e. when
    * the publish finished writing. Counts DATA files only — hidden
    * markers (`_claim`, `_SUCCESS`) are layout metadata.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val cur = current(spark, path)
    versions(spark, path).map { v =>
      val files = fs.listStatus(versionDir(path, v)).filter(f =>
        f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      (v, files.length, files.map(_.getLen).sum,
        if (files.isEmpty) 0L else files.map(_.getModificationTime).max,
        cur.contains(v))
    }.toDF("version", "n_files", "bytes", "modified_ms", "is_current")
  }

  /** Drop all but the newest `keep` versions — never the current one
    * (the pointer target survives regardless of age). Returns the
    * versions removed.
    */
  def vacuum(spark: SparkSession, path: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fsOf(spark, path)
    val cur = current(spark, path)
    val all = versions(spark, path)
    val doomed = all.dropRight(keep).filterNot(cur.contains)
    doomed.foreach(v => fs.delete(versionDir(path, v), true))
    doomed
  }
}
