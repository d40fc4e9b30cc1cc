package graft

import graft.sources.{Corpus, PageTable}
import graft.streaming.StreamingUpsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** ST13 — streaming CDC apply (foreachBatch MERGE) into the pages catalog.
  *
  * Exercised properties:
  *   - multi-batch event-time upsert: newer recrawls replace, late (older)
  *     updates are ignored, brand-new urls insert into the layout bucket;
  *   - within-batch collapse: a url recrawled twice in one batch merges
  *     only its latest row;
  *   - cross-batch monotonicity: batch 2's newer crawl overrides batch 1's;
  *   - replay idempotence: re-running the whole stream with a FRESH
  *     checkpoint (the at-least-once worst case) leaves the table
  *     content-identical — the strict warc_ts guard makes reapply a no-op;
  *   - copy-on-write confinement: buckets no update touches keep their
  *     physical files byte-for-byte across the whole stream.
  */
class StreamingUpsertSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val N = 200L
  private val tmp = Files.createTempDirectory("graft-upsert").toString

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming upsert: event-time MERGE per microbatch, replay-idempotent") {
    val wh = s"$tmp/wh"
    PageTable.register(spark, "pcatu", wh)
    PageTable.write(Corpus.pages(spark, N), s"$wh/pages", numBuckets = 8)

    val live = spark.table("pcatu.pages")
      .select("url", "warc_ts").as[(String, Timestamp)].collect().toMap
    val urls = live.keySet.toSeq.sorted
    val (uNew, uLate, uTwice, uCross) = (urls(0), urls(1), urls(2), urls(3))
    def fiveCol(rows: Seq[(String, Timestamp, String)]) =
      rows.toDF("url", "warc_ts", "text")
        .select(col("url"), col("warc_ts"),
          lit(null).cast("binary").as("html"), col("text"),
          lit("en").as("lang"))

    // batch 1 (older mtime file): a newer recrawl, a LATE older update, a
    // url recrawled TWICE in-batch (latest must win), a cross-batch victim's
    // first recrawl, and a brand-new url
    val t1 = ts("2025-07-01 00:00:00")
    val t2 = ts("2025-07-02 00:00:00")
    val late = ts("2001-01-01 00:00:00")
    val b1 = fiveCol(Seq(
      (uNew, t1, s"RECRAWL1::$uNew"),
      (uLate, late, s"STALE::$uLate"),
      (uTwice, t1, s"TWICE-EARLY::$uTwice"),
      (uTwice, t2, s"TWICE-LATE::$uTwice"),
      (uCross, t1, s"CROSS1::$uCross"),
      ("https://upsert-new.example/a", t1, "NEW-A")))
    // batch 2 (newer mtime file): overrides the cross-batch victim, second
    // brand-new url
    val b2 = fiveCol(Seq(
      (uCross, t2, s"CROSS2::$uCross"),
      ("https://upsert-new.example/b", t1, "NEW-B")))

    val src = s"$tmp/src"
    b1.coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtimes => deterministic two-batch order
    b2.coalesce(1).write.mode("append").parquet(src)

    def leafFiles: Set[String] = {
      val base = java.nio.file.Paths.get(s"$wh/pages/data")
      graft.sources.Snapshots.walkData(new java.io.File(s"$wh/pages/data"))
        .map(f => base.relativize(f.toPath).toString).toSet
    }
    val filesBefore = leafFiles

    val applied = StreamingUpsert.runOnce(
      spark, src, "pcatu.pages", s"$tmp/ckpt", filesPerTrigger = 1)
    assert(applied == 2, s"expected 2 data batches, saw $applied")

    def snapshot(): Map[String, (Timestamp, String)] =
      spark.table("pcatu.pages")
        .select("url", "warc_ts", "text")
        .as[(String, Timestamp, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val after = snapshot()

    assert(after.size == N.toInt + 2)
    assert(after(uNew) == ((t1, s"RECRAWL1::$uNew")))
    // late update ignored: live row untouched
    assert(after(uLate)._1 == live(uLate))
    assert(!after(uLate)._2.startsWith("STALE::"))
    // within-batch collapse: only the later of the two in-batch rows landed
    assert(after(uTwice) == ((t2, s"TWICE-LATE::$uTwice")))
    // cross-batch: batch 2 overrode batch 1
    assert(after(uCross) == ((t2, s"CROSS2::$uCross")))
    assert(after("https://upsert-new.example/a") == ((t1, "NEW-A")))
    assert(after("https://upsert-new.example/b") == ((t1, "NEW-B")))
    // inserted rows live in the recomputed layout bucket
    assert(spark.sql(
      """SELECT count(*) FROM pcatu.pages
        |WHERE url LIKE 'https://upsert-new.example/%'
        |  AND bucket != pmod(xxhash64(url), 8)""".stripMargin)
      .head().getLong(0) == 0)

    // copy-on-write confinement: untouched buckets kept their files
    val touched = (Seq(uNew, uLate, uTwice, uCross) ++
      Seq("https://upsert-new.example/a", "https://upsert-new.example/b"))
      .map(u => spark.sql(s"SELECT pmod(xxhash64('$u'), 8)").head().getLong(0))
      .toSet
    val untouchedFiles = filesBefore.filterNot(f =>
      touched.exists(b => f.startsWith(s"bucket=$b/")))
    assert(untouchedFiles.nonEmpty, "degenerate: every bucket touched")
    assert(untouchedFiles.subsetOf(leafFiles),
      "stream rewrote buckets no update touched")

    // replay the WHOLE stream with a fresh checkpoint (at-least-once worst
    // case): the strict warc_ts guard makes every reapply a no-op
    StreamingUpsert.runOnce(
      spark, src, "pcatu.pages", s"$tmp/ckpt2", filesPerTrigger = 1)
    assert(snapshot() == after, "replay changed table content")

    spark.sql("DROP TABLE pcatu.pages")
  }
}
