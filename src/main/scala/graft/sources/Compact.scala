package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the pages layout (the OPTIMIZE maintenance op):
  * streaming appends ([[graft.streaming.StreamingCurate]], catalog
  * `writeTo.append`) leave one file per batch per partition; at 100 TB that
  * is millions of sub-split files whose per-file open/footer cost dominates
  * scans. `Compact.run`:
  *
  *   1. driver-side listing picks the FRAGMENTED leaves only
  *      (`bucket=<b>/day=<d>` with more than one data file) — well-sized
  *      partitions are never rewritten or even read;
  *   2. ONE Spark job reads exactly those leaves and hash-repartitions by
  *      `(bucket, day)` — every leaf's rows land in exactly one task, so the
  *      partitioned write emits exactly ONE file per leaf (capped by
  *      `maxRecordsPerFile` if configured);
  *   3. the rewritten leaf directories are swapped in whole (single-writer,
  *      like every other maintenance path here) and a snapshot is committed —
  *      current reads see the compacted layout; older snapshots referencing
  *      the replaced files fail loudly per the [[Snapshots]] retention note.
  *
  * Returns (leaves compacted, files before, files after).
  */
object Compact {

  def run(spark: SparkSession, tableDir: String): (Int, Int, Int) = {
    val dataDir = new java.io.File(tableDir, "data")
    require(dataDir.isDirectory, s"no pages data under $tableDir")

    def dataFiles(d: java.io.File): Array[java.io.File] =
      d.listFiles.filter(f => f.isFile && f.getName.endsWith(".parquet"))

    val fragmented =
      for {
        bDir <- dataDir.listFiles.toSeq if bDir.getName.startsWith("bucket=")
        dDir <- bDir.listFiles.toSeq if dDir.getName.startsWith("day=")
        n = dataFiles(dDir).length if n > 1
      } yield (dDir, n)

    if (fragmented.isEmpty) return (0, 0, 0)
    val filesBefore = fragmented.map(_._2).sum

    // one job over just the fragmented leaves; basePath restores bucket/day
    val tmpOut = new java.io.File(tableDir, "data.compact.tmp")
    val paths = fragmented.map(_._1.toString)
    spark.read
      .option("basePath", dataDir.toString)
      .schema(PagesTable.FULL)
      .parquet(paths: _*)
      .repartition(col("bucket"), col("day"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket", "day")
      .parquet(tmpOut.toString)

    // swap each rewritten leaf in whole
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    for ((oldLeaf, _) <- fragmented) {
      val rel = dataDir.toPath.relativize(oldLeaf.toPath).toString
      val newLeaf = new java.io.File(tmpOut, rel)
      require(dataFiles(newLeaf).nonEmpty, s"compaction produced no file for $rel")
      rm(oldLeaf)
      if (!newLeaf.renameTo(oldLeaf))
        throw new IllegalStateException(s"compaction swap failed for $rel")
    }
    rm(tmpOut)

    val filesAfter = fragmented.map { case (leaf, _) => dataFiles(leaf).length }.sum
    Snapshots.record(tableDir)
    (fragmented.size, filesBefore, filesAfter)
  }

  /** VACUUM: delete data files NOT referenced by the latest snapshot —
    * the cleanup op for debris from failed/killed writes (a parquet write
    * that died mid-job leaves committed-looking part files the snapshot
    * never adopted). Snapshot-less tables (bare [[PageTable.write]] layouts)
    * are refused rather than guessed at. Older snapshots referencing live
    * files are unaffected: vacuum only removes files in NO snapshot-current
    * state, and the snapshot log itself is never touched.
    *
    * Returns (files removed, bytes removed).
    */
  def vacuum(tableDir: String): (Int, Long) = {
    val latest = Snapshots.latestVersion(tableDir).getOrElse(
      throw new IllegalStateException(
        s"$tableDir has no snapshot log; vacuum needs one to know what is live"))
    val (_, live) = Snapshots.files(tableDir, latest).get
    val liveSet = live.toSet
    val dataDir = new java.io.File(tableDir, "data")
    val base = dataDir.toPath
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    val orphans = walk(dataDir)
      .filterNot(f => liveSet.contains(base.relativize(f.toPath).toString))
    val bytes = orphans.map(_.length()).sum
    orphans.foreach(_.delete())
    // drop leaf/bucket dirs emptied by the cleanup
    for {
      bDir <- dataDir.listFiles.toSeq if bDir.isDirectory
      dDir <- bDir.listFiles.toSeq if dDir.isDirectory && dDir.listFiles.isEmpty
    } dDir.delete()
    dataDir.listFiles.filter(f => f.isDirectory && f.listFiles.isEmpty).foreach(_.delete())
    (orphans.size, bytes)
  }

  /** Snapshot history: (version, epoch millis, file count) ascending. */
  def history(tableDir: String): Seq[(Int, Long, Int)] =
    (1 to Snapshots.latestVersion(tableDir).getOrElse(0)).flatMap { v =>
      Snapshots.files(tableDir, v).map { case (ts, fs) => (v, ts, fs.size) }
    }
}
