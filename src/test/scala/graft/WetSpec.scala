package graft

import graft.operators.Extract
import graft.sources.{Corpus, Warc}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WET (extracted-text conversion archive): the round trip through the
  * archive format must not perturb one byte of the extraction output, and
  * damaged archives must refuse deterministically.
  */
class WetSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("WET write->read round-trips extraction output byte-identically, " +
    "including timestamps and lang") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wet").toString
    val docs = Extract.extract(Corpus.pages(spark, 300L).as[Page])
    Warc.writeWet(docs, tmp, 3)
    val back = Warc.readWet(spark, tmp)
      .select("url", "warc_ts", "text", "lang").orderBy("url")
    val want = docs.toDF()
      .select(col("url"), col("warc_ts"),
        coalesce(col("text"), lit("")).as("text"), col("lang"))
      .orderBy("url")
    val diff = back.exceptAll(want).count() + want.exceptAll(back).count()
    assert(diff == 0L, s"$diff rows diverged through the WET round trip")
    assert(back.count() == 300L)
  }

  test("WET gz members round-trip record-for-record identical to the plain " +
    "container") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wetgz").toString
    val docs = Extract.extract(Corpus.pages(spark, 200L).as[Page])
    Warc.writeWet(docs, s"$tmp/plain", 3)
    Warc.writeWetGz(docs, s"$tmp/gz", 3)
    val a = Warc.readWet(spark, s"$tmp/plain")
      .select("url", "warc_ts", "text", "lang")
    val b = Warc.readWetGz(spark, s"$tmp/gz")
      .select("url", "warc_ts", "text", "lang")
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
    assert(b.count() == 200L)
    // truncating an archive mid-member refuses at inflate (never silent
    // partial output)
    val f = new java.io.File(s"$tmp/gz").listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    intercept[Exception](Warc.gunzipAll(bytes.take(bytes.length - 7)))
  }

  test("WET damage discipline: truncated payloads and missing separators " +
    "refuse deterministically") {
    val rec = Warc.wetRecord("https://e.org/x",
      java.sql.Timestamp.from(java.time.Instant.parse("2025-01-02T03:04:05Z")),
      "some extracted text", "en")
    // well-formed parses to exactly one record
    val one = Warc.parse(rec).toSeq
    assert(one.length == 1 &&
      new String(one.head.html, "UTF-8") == "some extracted text")
    // any truncation refuses (never fabricates payload bytes)
    Seq(rec.length - 1, rec.length - 4, rec.length / 2, 10).foreach { n =>
      intercept[IllegalArgumentException](Warc.parse(rec.take(n)).toSeq)
    }
    // a corrupted separator refuses
    val bad = rec.clone(); bad(rec.length - 2) = 'X'.toByte
    intercept[IllegalArgumentException](Warc.parse(bad).toSeq)
  }
}
