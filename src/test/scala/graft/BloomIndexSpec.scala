package graft

import graft.sources.{BloomIndex, Corpus, PageTable}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S26 per-file url bloom sidecars: point lookups scan a small fraction of
  * the snapshot, absent urls scan ~nothing, and index staleness can only
  * cost performance — never rows.
  */
class BloomIndexSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft-bloom").toString

  test("lookup returns exactly the filtered-scan rows while scanning a " +
    "fraction of the files; absent urls scan zero files") {
    val dir = s"$tmp/t1"
    PageTable.write(Corpus.pages(spark, 400L), dir, numBuckets = 8)
    // second drop: a second file lands in each bucket dir — the files the
    // BLOOM (not the bucket layout) must prune for a drop-1 url
    PageTable.register(spark, "gbloom1", tmp)
    Corpus.pages(spark, 200L, seed = 55L).toDF().writeTo("gbloom1.t1").append()
    val n = BloomIndex.build(spark, dir)
    assert(n > 8, s"expected >1 file per bucket, got $n files")
    val all = Corpus.pages(spark, 400L).select("url").as[String]
      .collect().sorted
    val probe = Seq(all.head, all(all.length / 2), all.last)
    val (rows, scanned, total) = BloomIndex.lookup(spark, dir, probe)
    val got = rows.select("url").as[String].collect().sorted.toSeq
    assert(got == probe.sorted)
    assert(total == n)
    // each probe url lives in exactly one drop-1 file; bucket pruning gives
    // <=3 buckets x 2 files, the bloom rejects the drop-2 halves (+1 slack
    // for an fpp-rate spurious hit)
    assert(scanned <= probe.size + 1, s"scanned $scanned of $total")
    assert(scanned >= probe.size / 2, "each url lives in at least one file")
    // absent url: bucket pruning leaves candidates, blooms reject them all
    val (miss, mScanned, _) =
      BloomIndex.lookup(spark, dir, Seq("https://absent.example.org/x"))
    assert(miss.count() == 0)
    assert(mScanned == 0, s"bloom should reject all candidates, scanned $mScanned")
  }

  test("staleness fallback: files appended after the build are scanned " +
    "unconditionally, so new rows are never missed") {
    val dir = s"$tmp/t2"
    PageTable.write(Corpus.pages(spark, 200L), dir, numBuckets = 4)
    BloomIndex.build(spark, dir)
    // append a fresh drop WITHOUT rebuilding the index
    PageTable.register(spark, "gbloom", tmp)
    Corpus.pages(spark, 40L, seed = 123L).toDF().writeTo("gbloom.t2").append()
    val newUrl = Corpus.pages(spark, 40L, seed = 123L)
      .select("url").as[String].head()
    val (rows, scanned, total) = BloomIndex.lookup(spark, dir, Seq(newUrl))
    assert(rows.select("url").as[String].collect().toSeq == Seq(newUrl))
    // the un-indexed files were scanned (fallback), but indexed files of
    // other buckets still pruned
    assert(scanned < total, s"scanned $scanned of $total")
  }
}
