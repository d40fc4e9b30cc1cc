package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hub-style dataset export (`Main export-hf`): the hand-off format a
  * training-data consumer expects — per split, exactly-N parquet shards
  * named `<split>-00000-of-0000N.parquet` under `data/`, plus a
  * `dataset_info.json` with per-split row/byte counts. The shard partitioner
  * is the url hash, so re-exports are layout-deterministic for identical
  * input and shard counts.
  *
  * Scale: each split is one repartition write (shards sized by the
  * consumer's loader parallelism); the renames are per-file metadata ops;
  * nothing returns to the driver except shard file handles and counts.
  */
object ExportHf {

  /** Returns (split, rows, bytes) per exported split. */
  def run(spark: SparkSession, curatedDir: String, outDir: String,
          shards: Int): Seq[(String, Long, Long)] = {
    require(shards > 0, s"shards must be positive, got $shards")
    val splits = Option(new java.io.File(curatedDir)
        .listFiles((_, n) => n.startsWith("split=")))
      .getOrElse(Array.empty)
      .map(_.getName.stripPrefix("split=")).sorted.toSeq
    require(splits.nonEmpty, s"no split= partitions under $curatedDir")
    val dataDir = new java.io.File(outDir, "data")
    dataDir.mkdirs()
    val stats = splits.map { s =>
      val df = spark.read.parquet(s"$curatedDir/split=$s")
      val tmp = new java.io.File(outDir, s".tmp-$s")
      if (tmp.exists()) Snapshots.deleteRecursively(tmp)
      df.repartition(shards, col("url"))
        .write.mode("overwrite").parquet(tmp.getPath)
      val parts = tmp.listFiles.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      require(parts.length == shards,
        s"split $s produced ${parts.length} files, expected $shards")
      val named = parts.zipWithIndex.map { case (p, i) =>
        val dst = new java.io.File(dataDir,
          f"$s-$i%05d-of-$shards%05d.parquet")
        java.nio.file.Files.move(p.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst
      }
      Snapshots.deleteRecursively(tmp)
      val rows = spark.read.parquet(named.map(_.getPath).toSeq: _*).count()
      (s, rows, named.map(_.length()).sum)
    }
    def q(x: String) = "\"" + x + "\""
    val info = stats.map { case (s, r, b) =>
      s"${q(s)}: {${q("num_rows")}: $r, ${q("num_bytes")}: $b, " +
        s"${q("num_shards")}: $shards}"
    }.mkString("{", ", ", "}")
    val json = s"{${q("splits")}: $info, " +
      s"${q("total_rows")}: ${stats.map(_._2).sum}}"
    java.nio.file.Files.write(
      new java.io.File(outDir, "dataset_info.json").toPath,
      json.getBytes("UTF-8"))
    stats
  }
}
