package graft.sources

/** Table clone over the snapshot log (Delta `CLONE` / Iceberg snapshot-ref
  * export shape): materialize a chosen snapshot of a source table as a NEW
  * independent table without copying data bytes.
  *
  * Mechanism: every data file the snapshot references is HARD-LINKED into
  * the clone's `data/` tree under the same bucket=/day= relative path, the
  * table-identity metadata (bucket count, evolved-schema extras) is copied,
  * and the linked tree is committed as the clone's snapshot v1. Hard links
  * make the clone metadata-cost (no bytes move) yet FULLY isolated: each
  * table's vacuum/compaction/rollback unlinks only its own directory entry,
  * and the shared inodes survive until both sides drop them — the property
  * the spec pins by vacuuming the source out from under a clone. On an
  * object store the same operation is a manifest copy (paths there are
  * table-root-relative keys); the hard link is the local-FS equivalent
  * with strictly stronger isolation.
  *
  * Refused loudly: cloning onto an existing table (or any dir with data
  * files), and cloning a snapshot whose files a rollback/vacuum already
  * moved aside — a silent partial clone is corruption deferred.
  */
object Clone {

  /** Clone `srcDir` at `version` / tag `ref` (default: latest snapshot)
    * into `dstDir`. Returns (source version cloned, files linked).
    */
  def run(srcDir: String, dstDir: String,
          version: Option[Int] = None, ref: Option[String] = None): (Int, Int) = {
    val v = ref
      .map(r => Snapshots.resolveRef(srcDir, r).getOrElse(
        sys.error(s"clone: no tag '$r' on $srcDir")))
      .orElse(version)
      .orElse(Snapshots.latestVersion(srcDir))
      .getOrElse(sys.error(s"clone: $srcDir has no snapshots"))
    val (_, rel) = Snapshots.files(srcDir, v).getOrElse(
      sys.error(s"clone: $srcDir has no snapshot v$v"))
    val dst = new java.io.File(dstDir)
    val dstData = new java.io.File(dst, "data")
    require(Snapshots.latestVersion(dstDir).isEmpty &&
      Snapshots.walkData(dstData).isEmpty,
      s"clone: target $dstDir is already a table (refusing to mix histories)")
    val srcData = new java.io.File(srcDir, "data")
    val missing = rel.filterNot(p => new java.io.File(srcData, p).isFile)
    require(missing.isEmpty,
      s"clone: snapshot v$v references ${missing.size} files no longer " +
        s"present (rollback/vacuum aside?): ${missing.take(5).mkString(", ")}")
    rel.foreach { p =>
      val s = new java.io.File(srcData, p)
      val d = new java.io.File(dstData, p)
      d.getParentFile.mkdirs()
      java.nio.file.Files.createLink(d.toPath, s.toPath)
    }
    PageTable.readBucketMeta(srcDir)
      .foreach(b => PageTable.writeBucketMeta(dstDir, b))
    val extras = PageTable.readSchemaMeta(srcDir)
    if (extras.nonEmpty) PageTable.writeSchemaMeta(dstDir, extras)
    val cv = Snapshots.record(dstDir)
    assert(cv == 1, s"clone target unexpectedly had history (v$cv)")
    (v, rel.size)
  }
}
