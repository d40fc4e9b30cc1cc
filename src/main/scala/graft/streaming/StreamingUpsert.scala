package graft.streaming

import graft.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply into the LIVE pages catalog (SURVEY.md §2.9 ST13) —
  * the lakehouse "streaming MERGE" shape: a stream of recrawled / corrected
  * pages upserts into the catalog table through the same copy-on-write
  * row-level MERGE the batch SQL surface uses, one MERGE per microbatch.
  *
  * Semantics (event-time upsert, the recrawl rule):
  *   - within a batch, only the LATEST row per url survives (warc_ts desc,
  *     md5(text) tiebreak — deterministic at any parallelism), so a url
  *     recrawled twice in one drop merges once;
  *   - `WHEN MATCHED AND s.warc_ts > t.warc_ts` — a strictly newer crawl
  *     replaces the live row; a LATE-arriving older crawl is a no-op (the
  *     live table never moves backward in event time);
  *   - `WHEN NOT MATCHED` inserts; the catalog recomputes the layout bucket
  *     from the url, never trusting incoming partition columns.
  *
  * The strict `>` guard is also what makes crash-replay idempotent WITHOUT
  * coordination: a replayed batch re-merges rows whose warc_ts now EQUALS
  * the live row's, every MATCHED clause fails, and inserts from the first
  * attempt are now matches — the second apply is a content no-op. (The
  * checkpoint already prevents most replays; the guard covers the
  * foreachBatch at-least-once window between sink commit and checkpoint
  * write.)
  *
  * Scale shape: per-batch cost = one MERGE whose runtime group filter
  * confines the copy-on-write rewrite to buckets containing matches
  * (PageTableSpec pins untouched-file survival); history is never rescanned
  * beyond the semi-join that locates affected groups. A drop's rows spread
  * over at most min(#buckets, |batch|) group rewrites.
  */
object StreamingUpsert {

  /** @param table fully-qualified catalog table, e.g. "pcat.pages" —
    *              must be registered ([[graft.sources.PageTable.register]])
    *              before the stream starts.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      table: String,
      checkpointDir: String,
      filesPerTrigger: Int = 1024,
      onApply: () => Unit = () => ()
  ): StreamingQuery = {
    val updates = spark.readStream
      .schema(Model.PAGES)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(srcDir)
      .select("url", "warc_ts", "html", "text", "lang")

    updates.writeStream
      .queryName("graft-stream-upsert")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (applyBatch(batch, table)) onApply()
        ()
      }
      .start()
  }

  /** One microbatch: collapse to latest-per-url, MERGE into the catalog.
    * Factored out so batch callers (tests, backfills) apply the identical
    * rule. The collapsed source is `localCheckpoint`ed: the MERGE's two
    * passes (group locate, then rewrite) re-read one executor-side computed
    * copy instead of re-running the window — and nothing returns to the
    * driver, so batch size is bounded by cluster memory, not driver memory.
    * Returns true when a non-empty batch was merged.
    */
  def applyBatch(batch: DataFrame, table: String): Boolean = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("url")
      .orderBy(col("warc_ts").desc, md5(col("text")).desc)
    val latest = batch
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .localCheckpoint()
    if (latest.isEmpty) return false
    // per-call view name: temp views are SESSION-scoped, so two upsert
    // streams on one SparkSession with a shared name would race and could
    // merge one stream's batch into the other stream's table
    val view = s"graft_upsert_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    latest.createOrReplaceTempView(view)
    try
      spark.sql(
        s"""MERGE INTO $table t USING $view s ON t.url = s.url
           |WHEN MATCHED AND s.warc_ts > t.warc_ts THEN UPDATE SET
           |  warc_ts = s.warc_ts, html = s.html, text = s.text, lang = s.lang
           |WHEN NOT MATCHED THEN INSERT (url, warc_ts, html, text, lang)
           |  VALUES (s.url, s.warc_ts, s.html, s.text, s.lang)""".stripMargin)
    finally spark.catalog.dropTempView(view)
    true
  }

  /** Run to completion; returns the applied-batch count — counted in the
    * foreachBatch itself, not from `recentProgress` (which retains only the
    * last `numRecentProgressUpdates` events and under-reports long backfills).
    */
  def runOnce(spark: SparkSession, srcDir: String, table: String,
              checkpointDir: String, filesPerTrigger: Int = 1024): Long = {
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val q = start(spark, srcDir, table, checkpointDir, filesPerTrigger,
      onApply = () => { applied.incrementAndGet(); () })
    q.awaitTermination()
    applied.get()
  }
}
