package graft

import graft.operators.{ResumableExtract, ScalarExtract}
import graft.sources.{Corpus, Manifest, PageTable}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** PageTable façade + manifest lineage + kill-and-resume (SURVEY.md M4). */
class PageTableSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val N = 200L
  private val tmp = Files.createTempDirectory("graft-pt").toString

  test("write/read round-trips the pages table; partition pruning works") {
    val pages = Corpus.pages(spark, N)
    PageTable.write(pages, s"$tmp/pages", numBuckets = 8)

    val back = PageTable.read(spark, s"$tmp/pages")
    assert(back.count() == N)
    assert(back.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    // content identical
    val origUrls = pages.select("url").as[String].collect().sorted.toSeq
    val backUrls = back.select("url").as[String].collect().sorted.toSeq
    assert(origUrls == backUrls)

    // partition pruning: filter on bucket appears as PartitionFilters
    val pruned = PageTable.readRaw(spark, s"$tmp/pages").filter(col("bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    assert(pruned.count() > 0)
  }

  test("kill-and-resume equals one-shot run; manifest carries lineage") {
    val pagesDir = s"$tmp/pages2"
    PageTable.write(Corpus.pages(spark, N), pagesDir, numBuckets = 8)

    // one-shot reference
    val oneShot = ResumableExtract.run(spark, pagesDir, s"$tmp/once",
      s"$tmp/once-manifest", "run0", numBuckets = 8)
    assert(oneShot.nDocs == N)

    // "crashed" first run: only 3 buckets complete
    val r1 = ResumableExtract.run(spark, pagesDir, s"$tmp/resume",
      s"$tmp/resume-manifest", "run1", numBuckets = 8, maxBuckets = 3)
    assert(r1.bucketsDone.size == 3)

    // resume processes exactly the remaining buckets
    val r2 = ResumableExtract.run(spark, pagesDir, s"$tmp/resume",
      s"$tmp/resume-manifest", "run2", numBuckets = 8)
    assert(r2.bucketsDone.nonEmpty)
    assert((r1.bucketsDone.toSet & r2.bucketsDone.toSet).isEmpty)

    // third run: nothing left
    val r3 = ResumableExtract.run(spark, pagesDir, s"$tmp/resume",
      s"$tmp/resume-manifest", "run3", numBuckets = 8)
    assert(r3.bucketsDone.isEmpty)

    // resumed output == one-shot output == scalar oracle
    val a = spark.read.parquet(s"$tmp/once/docs")
      .select("url", "text").as[(String, String)].collect().toMap
    val b = spark.read.parquet(s"$tmp/resume/docs")
      .select("url", "text").as[(String, String)].collect().toMap
    assert(a == b)
    (0L until N).foreach { i =>
      val p = Corpus.page(Corpus.DEFAULT_SEED, i)
      assert(b(p.url) == ScalarExtract.extract(p).text, p.url)
    }

    // manifest lineage: all 8 buckets done, metrics are positive and honest
    val m = Manifest.read(spark, s"$tmp/resume-manifest")
    assert(m.select("bucket").distinct().count() == 8)
    val totals = m.agg(sum("nDocs"), sum("nChars")).collect()(0)
    assert(totals.getLong(0) == N)
    // manifest nChars uses Spark length() = codepoints
    assert(totals.getLong(1) ==
      a.values.map(t => t.codePointCount(0, t.length).toLong).sum)
  }
}
