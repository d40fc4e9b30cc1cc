package graft.operators

import graft.sources.{Manifest, ManifestRow, PageTable}
import org.apache.spark.sql.{Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed, per-partition-resumable batch extraction (B:14 "resumable
  * from checkpoint with per-partition lineage + metrics"):
  *
  *   1. pages anti-join manifest (J5) -> only buckets not yet completed;
  *   2. extract, write docs partitioned by bucket with DYNAMIC partition
  *      overwrite -> re-running a half-finished bucket replaces exactly that
  *      bucket's files (idempotent under kill/retry);
  *   3. per-bucket metrics (docs, chars, blocks, dropped) aggregated from the
  *      written data and appended to the manifest LAST — a bucket is "done"
  *      only after its data is fully committed, so a crash between (2) and
  *      (3) just re-does that bucket.
  *
  * The unit of resume is the url-hash bucket: at 10^12 documents a bucket is
  * still bounded work, and the manifest stays tiny (buckets x runs rows).
  */
object ResumableExtract {

  case class RunReport(runId: String, bucketsDone: Seq[Int], nDocs: Long, skipped: Int)

  def run(
      spark: SparkSession,
      pagesDir: String,
      outDir: String,
      manifestDir: String,
      runId: String,
      numBuckets: Int = PageTable.DEFAULT_BUCKETS,
      maxBuckets: Int = Int.MaxValue // process at most this many (test hook)
  ): RunReport = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    // J5: pages-buckets LEFT ANTI manifest — all metadata-sized inputs (the
    // bucket column is a partition dir value; the manifest is buckets x runs
    // rows). The surviving todo ids are then collected (bounded by #buckets)
    // because a compile-time isin list gives STATIC partition pruning on the
    // scan — the petabyte side never reads a completed bucket's files.
    val nDone = Manifest.doneBuckets(spark, manifestDir).count().toInt
    val all = PageTable.readRaw(spark, pagesDir)
    val todoBuckets = all
      .select(col("bucket").cast("int"))
      .distinct()
      .join(Manifest.doneBuckets(spark, manifestDir), Seq("bucket"), "left_anti")
      .as[Int]
      .collect()
      .sorted
      .take(maxBuckets)

    if (todoBuckets.isEmpty)
      return RunReport(runId, Seq.empty, 0L, nDone)

    val pages = all
      .filter(col("bucket").isin(todoBuckets.map(Integer.valueOf): _*))
      .select("url", "warc_ts", "html", "text", "lang")
      .as[graft.Page]

    val obs = Observation(s"extract-$runId")
    val docs = Extract
      .extract(pages)
      .withColumn("bucket", PageTable.bucketCol(numBuckets))
      .observe(
        obs,
        count(lit(1)).as("nDocs"),
        sum(length(col("text"))).as("nChars"),
        sum(col("nBlocks")).as("nBlocks"),
        sum(col("nDropped")).as("nDropped")
      )

    docs.write
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$outDir/docs")

    // lineage: per-bucket metrics from the committed output (source of truth)
    val perBucket = spark.read
      .parquet(s"$outDir/docs")
      .filter(col("bucket").isin(todoBuckets.map(Integer.valueOf): _*))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("nDocs"),
        coalesce(sum(length(col("text"))), lit(0L)).as("nChars"),
        coalesce(sum(col("nBlocks")), lit(0L)).as("nBlocks"),
        coalesce(sum(col("nDropped")), lit(0L)).as("nDropped")
      )
      .collect()
      .map { r =>
        ManifestRow(r.getInt(0), runId, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), System.currentTimeMillis())
      }
    // buckets whose pages all vanished in extraction still count as done
    val seen = perBucket.map(_.bucket).toSet
    val empties = todoBuckets.filterNot(seen).map(b =>
      ManifestRow(b, runId, 0L, 0L, 0L, 0L, System.currentTimeMillis()))
    Manifest.append(spark, manifestDir, (perBucket ++ empties).toSeq)

    val nDocs = obs.get.get("nDocs") match {
      case Some(l: java.lang.Long) => l.longValue()
      case _                       => -1L
    }
    RunReport(runId, todoBuckets.toSeq, nDocs, nDone)
  }
}
