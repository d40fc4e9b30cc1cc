package graft.streaming

import graft.{Model, Page}
import graft.operators.Extract
import graft.sources.PageTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental-ingest extraction (SURVEY.md §2.9 ST1 + ST6, build plan M6):
  * the SAME `Extract.extract` pipeline run as a Structured Streaming job
  * over the pages table.
  *
  *   - source: file stream over the bucketed pages directory,
  *     `Trigger.AvailableNow()` — processes everything currently present in
  *     bounded batches, then stops; re-running picks up only NEW files via
  *     the checkpoint (this is the streaming-native resume story, replacing
  *     the manifest anti-join of the batch path);
  *   - sink: `foreachBatch` + dynamic partition overwrite by url-hash bucket
  *     — re-processing a batch after a crash rewrites exactly the same
  *     bucket partitions, so the output is idempotent (exactly-once by url).
  *
  * At 10^12-document scale this is how fresh crawl drops are folded in
  * without re-running the corpus: each drop lands as new files under the
  * table, one AvailableNow run extracts just those.
  */
object StreamingExtract {

  def start(
      spark: SparkSession,
      pagesDir: String,
      outDir: String,
      checkpointDir: String,
      numBuckets: Int = PageTable.DEFAULT_BUCKETS
  ): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(Model.PAGES)
      .option("maxFilesPerTrigger", "64")
      .parquet(s"$pagesDir/data")
      .select("url", "warc_ts", "html", "text", "lang")
      .as[Page]

    pages.writeStream
      .queryName("graft-stream-extract")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Page], batchId: Long) =>
        // idempotence: partitions are keyed by (batch_id, bucket); a crash-
        // replayed batch carries the SAME batchId over the same input files
        // (checkpointed file list), so dynamic overwrite rewrites exactly
        // its own partitions and never another batch's output.
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        Extract
          .extract(batch)
          .withColumn("batch_id", lit(batchId))
          .withColumn("bucket", PageTable.bucketCol(numBuckets))
          .write
          .mode("overwrite")
          .partitionBy("batch_id", "bucket")
          .parquet(outDir)
        ()
      }
      .start()
  }

  /** Run to completion (AvailableNow terminates on its own) and return the
    * extracted table.
    */
  def runOnce(spark: SparkSession, pagesDir: String, outDir: String,
              checkpointDir: String): DataFrame = {
    val q = start(spark, pagesDir, outDir, checkpointDir)
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
