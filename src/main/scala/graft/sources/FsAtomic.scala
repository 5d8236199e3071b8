package graft.sources

/** The two filesystem primitives every claim/flip protocol here
  * leans on, in one place so [[CatalogStore]] and [[VersionedStore]]
  * cannot drift apart on atomicity:
  *
  *  - [[createExclusive]]: atomically create an empty file, failing
  *    if it exists — THE exclusive-claim primitive. HDFS's
  *    `create(p, overwrite = false)` is atomic at the NameNode;
  *    RawLocalFileSystem's is check-then-create, so two local racers
  *    can both "win" — for `file://` go through NIO's createFile
  *    (O_CREAT|O_EXCL, atomic at the syscall).
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
}
