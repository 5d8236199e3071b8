package graft.sources

/** The filesystem primitives every claim/flip protocol here leans
  * on, in one place so [[CatalogStore]] and [[VersionedStore]] cannot
  * drift apart on atomicity:
  *
  *  - [[createExclusive]]: atomically create an empty file, failing
  *    if it exists — THE exclusive-claim primitive. HDFS's
  *    `create(p, overwrite = false)` is atomic at the NameNode;
  *    RawLocalFileSystem's is check-then-create, so two local racers
  *    can both "win" — for `file://` go through NIO's createFile
  *    (O_CREAT|O_EXCL, atomic at the syscall).
  *  - [[putIfMatch]]: conditional small-file write — the pointer-flip
  *    CAS seam. Plain-filesystem rename is not compare-and-swap, so a
  *    bare read-check-rename leaves a window where a concurrent flip
  *    lands between the check and the rename and gets silently
  *    overwritten (a dropped commit). This primitive closes that
  *    window COMPLETELY within one JVM by serializing the
  *    read-check-write under a per-path process lock — which covers
  *    every writer a local[] deployment or a single driver has. Across
  *    JVMs the residual window remains on plain filesystems and is the
  *    documented limit; object stores with conditional put (S3
  *    If-None-Match / GCS generation preconditions / ABFS ETags) and
  *    HDFS-with-lease deployments should route this seam through the
  *    store's native conditional write instead of the rename fallback.
  */
object FsAtomic {

  def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try java.nio.file.Files.createFile(local)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new java.io.IOException(s"$p already claimed", e)
      }
    } else fs.create(p, false).close()
  }

  /** One lock object per qualified target path, JVM-wide: every
    * in-process writer of the same pointer file serializes through
    * the same monitor, whatever thread or session it runs on.
    */
  private val flipLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Object =
    flipLocks.computeIfAbsent(fs.makeQualified(p).toString,
      _ => new Object)

  /** Test seam: runs INSIDE the lock, between the accept-check and
    * the write — lets a spec widen the race window adversarially and
    * prove a concurrent writer still cannot interleave (it blocks on
    * the lock instead of reading a stale value past the check).
    */
  private[graft] var casWindowHook: () => Unit = () => ()

  /** Conditional write of a small file: writes `value` to `p` (via
    * `tmp` + overwrite-rename, so readers only ever observe complete
    * contents) IFF `accept(current contents)` holds, evaluated and
    * acted on atomically with respect to every other in-process
    * [[putIfMatch]] on the same path. Returns whether the write
    * happened; `false` means the current value was refused — the
    * caller's CAS failure path.
    *
    * `current` is a caller-supplied reader (so retry-hardened readers
    * — checksum-torn-state retries, missing-pointer grace — stay with
    * the protocol that owns them); it is invoked under the lock.
    */
  def putIfMatch(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      p: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      value: String, current: () => Option[String],
      accept: Option[String] => Boolean): Boolean =
    lockFor(fs, p).synchronized {
      if (!accept(current())) false
      else {
        casWindowHook()
        val o = fs.create(tmp, true)
        try o.write(value.getBytes("UTF-8")) finally o.close()
        org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
          .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      }
    }
}
