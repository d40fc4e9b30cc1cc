package graft

import graft.sources.{Compact, PageTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** OPTIMIZE ZORDER BY rewrite (VERDICT r3 §missing-3): after
  * `Compact.zorder` the parquet footer min/max of EVERY file must be narrow
  * in BOTH dimensions, so range predicates on either dimension skip most
  * files — measured here directly from the footers, the same stats a
  * lakehouse scan prunes with.
  */
class ZorderSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString

  /** (min, max) of a column across one parquet file's row groups; None when
    * any row group lacks stats (a scan must read such a file).
    */
  private def fileRange(f: java.io.File, column: String): Option[(Comparable[Any], Comparable[Any])] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toString), new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val stats = r.getFooter.getBlocks.asScala
        .map(_.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics)
      def cmp(o: AnyRef): Comparable[Any] = o match {
        case b: org.apache.parquet.io.api.Binary =>
          new String(b.getBytes, "UTF-8").asInstanceOf[Comparable[Any]]
        case x => x.asInstanceOf[Comparable[Any]]
      }
      if (stats.exists(s => s == null || !s.hasNonNullValue)) None
      else Some((stats.map(s => cmp(s.genericGetMin().asInstanceOf[AnyRef])).min,
        stats.map(s => cmp(s.genericGetMax().asInstanceOf[AnyRef])).max))
    } finally r.close()
  }

  /** Files a range predicate [lo, hi] must read, by footer min/max. */
  private def candidates(dataDir: java.io.File, column: String,
                         lo: Comparable[Any], hi: Comparable[Any]): (Int, Int) = {
    val files = graft.sources.Snapshots.walkData(dataDir)
    val hit = files.count { f =>
      fileRange(f, column).forall { case (mn, mx) =>
        mn.compareTo(hi.asInstanceOf[Any]) <= 0 && mx.compareTo(lo.asInstanceOf[Any]) >= 0
      }
    }
    (hit, files.size)
  }

  test("zorder rewrite: footer min/max skips files on BOTH dimensions") {
    // INT96 timestamps carry no footer stats; at-scale writers use MICROS
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val dir = s"$tmp/pages"
    val day = java.sql.Timestamp.valueOf("2025-03-01 00:00:00").getTime
    def slice(lo: Long, hi: Long) = spark.range(lo, hi).map { i =>
      Page(f"https://host${i % 64}%02d.example.org/p/$i",
        new java.sql.Timestamp(day + (i * 97 % 86400) * 1000L),
        null, s"text $i", "en")
    }
    // 8 appended slices: every file spans ALL hosts and the WHOLE day —
    // the worst case for min/max skipping
    PageTable.write(slice(0, 500), dir, numBuckets = 2)
    PageTable.register(spark, "pz", tmp)
    (1 to 7).foreach(k => slice(k * 500L, (k + 1) * 500L).toDF()
      .writeTo("pz.pages").append())

    val dataDir = new java.io.File(dir, "data")
    val urlLo = "https://host11".asInstanceOf[Comparable[Any]]
    val urlHi = "https://host12".asInstanceOf[Comparable[Any]]
    // timestamps are INT64 micros in the footers
    val tsLo = java.lang.Long.valueOf((day + 3 * 3600 * 1000L) * 1000L).asInstanceOf[Comparable[Any]]
    val tsHi = java.lang.Long.valueOf((day + 6 * 3600 * 1000L) * 1000L).asInstanceOf[Comparable[Any]]

    val (urlBefore, nBefore) = candidates(dataDir, "url", urlLo, urlHi)
    val (tsBefore, _) = candidates(dataDir, "warc_ts", tsLo, tsHi)
    assert(urlBefore * 4 >= nBefore * 3 && tsBefore * 4 >= nBefore * 3,
      s"precondition: unclustered files should nearly all intersect ($urlBefore/$tsBefore of $nBefore)")

    val beforeUrls = spark.read.table("pz.pages").select("url").as[String].collect().sorted

    val (leaves, filesAfter) = Compact.zorder(spark, dir, ("url", "warc_ts"),
      maxRecordsPerFile = 125L)
    assert(leaves == 2 && filesAfter >= 16, s"leaves=$leaves files=$filesAfter")

    // content survives the rewrite exactly
    val afterUrls = spark.read.table("pz.pages").select("url").as[String].collect().sorted
    assert(afterUrls.toSeq == beforeUrls.toSeq)

    val (urlAfter, nAfter) = candidates(dataDir, "url", urlLo, urlHi)
    val (tsAfter, _) = candidates(dataDir, "warc_ts", tsLo, tsHi)
    // the z-curve gives BOTH dimensions narrow per-file ranges: each
    // predicate must now skip at least half the files
    assert(urlAfter * 2 <= nAfter, s"url skipping: $urlAfter of $nAfter files")
    assert(tsAfter * 2 <= nAfter, s"ts skipping: $tsAfter of $nAfter files")

    // the rewrite committed a snapshot and left no asides/tmp behind
    assert(!new java.io.File(dir, "data.compact.tmp").exists())
    assert(graft.sources.Snapshots.walkData(dataDir).forall(!_.getName.startsWith(".")))
    spark.sql("DROP TABLE pz.pages")
  }
}
