package graft

import graft.sources.{Compact, Corpus, PageTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S18 — append-only schema evolution on the pages catalog.
  *
  * Pinned properties:
  *   - `ALTER TABLE ... ADD COLUMNS` appends a nullable data column ahead of
  *     bucket/day; old rows null-fill (no file rewrite), wide inserts carry
  *     values, narrow (pre-evolution) inserts keep resolving via the NULL
  *     column default;
  *   - MERGE on an evolved table carries the evolved column through the
  *     copy-on-write group rewrite (rows sharing a bucket with the merge
  *     target keep their evolved values byte-for-byte);
  *   - compaction rewrites preserve evolved columns;
  *   - time travel reads old snapshots under the CURRENT schema (null-fill);
  *   - everything except nullable top-level ADD COLUMN is refused loudly.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val N = 120L
  private val tmp = Files.createTempDirectory("graft-evo").toString

  test("ADD COLUMN: null-fill, defaults, merge carry-through, compaction, refusals") {
    val wh = s"$tmp/wh"
    PageTable.register(spark, "pcatse", wh)
    PageTable.write(Corpus.pages(spark, N), s"$wh/pages", numBuckets = 8)
    val v0 = graft.sources.Snapshots.latestVersion(s"$wh/pages").get

    spark.sql("ALTER TABLE pcatse.pages ADD COLUMNS (quality INT)")
    assert(spark.table("pcatse.pages").columns.toSeq ==
      Seq("url", "warc_ts", "html", "text", "lang", "quality", "bucket", "day"))
    // old rows null-fill — no data file was rewritten for the ALTER
    assert(spark.table("pcatse.pages").filter(col("quality").isNull).count() == N)

    // wide insert carries the value; narrow insert resolves via the default
    spark.sql(
      """INSERT INTO pcatse.pages (url, warc_ts, html, text, lang, quality)
        |VALUES ('https://evo.example/wide', TIMESTAMP'2025-07-01 00:00:00',
        |        NULL, 'EVO-WIDE', 'en', 87)""".stripMargin)
    spark.sql(
      """INSERT INTO pcatse.pages (url, warc_ts, html, text, lang)
        |VALUES ('https://evo.example/narrow', TIMESTAMP'2025-07-01 00:00:00',
        |        NULL, 'EVO-NARROW', 'en')""".stripMargin)
    val q = spark.table("pcatse.pages")
      .filter(col("url").startsWith("https://evo.example/"))
      .select("url", "quality").as[(String, Option[Int])].collect().toMap
    assert(q("https://evo.example/wide").contains(87))
    assert(q("https://evo.example/narrow").isEmpty)

    // time travel: the pre-evolution snapshot reads under the CURRENT
    // schema, null-filled. (Checked before any MERGE/compaction: those are
    // copy-on-write rewrites, and replaced files invalidate older snapshots
    // — the documented append-only-durable retention caveat.)
    val v0q = spark.sql(s"SELECT quality FROM pcatse.pages VERSION AS OF $v0")
    assert(v0q.filter(col("quality").isNotNull).count() == 0)
    assert(v0q.count() == N)

    // MERGE carry-through: give one old url a quality, then merge-update a
    // DIFFERENT url in the SAME bucket — the group rewrite must re-write the
    // first row and keep its evolved value
    val byBucket = spark.table("pcatse.pages")
      .filter(!col("url").startsWith("https://evo.example/"))
      .select(col("url"), col("bucket")).as[(String, Int)].collect()
      .groupBy(_._2).filter(_._2.length >= 2)
    val (_, pair) = byBucket.head
    val (carrier, victim) = (pair(0)._1, pair(1)._1)
    spark.sql(
      s"""MERGE INTO pcatse.pages t
         |USING (SELECT '$carrier' AS url, 55 AS quality) s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET quality = s.quality""".stripMargin)
    spark.sql(
      s"""MERGE INTO pcatse.pages t
         |USING (SELECT '$victim' AS url, 'MERGED-TEXT' AS text) s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET text = s.text""".stripMargin)
    val carried = spark.table("pcatse.pages")
      .filter(col("url") === carrier).select("quality").as[Option[Int]].head()
    assert(carried.contains(55),
      "merge group rewrite dropped the evolved column of an untouched row")
    assert(spark.table("pcatse.pages")
      .filter(col("url") === victim).select("text").as[String].head() == "MERGED-TEXT")

    // compaction preserves evolved values (it reads/writes fullFor)
    Compact.run(spark, s"$wh/pages")
    val afterCompact = spark.table("pcatse.pages")
      .filter(col("quality").isNotNull)
      .select("url", "quality").as[(String, Int)].collect().toMap
    assert(afterCompact == Map(carrier -> 55, "https://evo.example/wide" -> 87))

    // a second evolution stacks; duplicate / reserved / destructive → loud
    spark.sql("ALTER TABLE pcatse.pages ADD COLUMNS (lang_conf DOUBLE)")
    assert(spark.table("pcatse.pages").columns.contains("lang_conf"))
    intercept[Exception](spark.sql(
      "ALTER TABLE pcatse.pages ADD COLUMNS (quality INT)"))
    intercept[Exception](spark.sql(
      "ALTER TABLE pcatse.pages ADD COLUMNS (url STRING)"))
    intercept[Exception](spark.sql(
      "ALTER TABLE pcatse.pages DROP COLUMN quality"))
    intercept[Exception](spark.sql(
      "ALTER TABLE pcatse.pages RENAME COLUMN quality TO q2"))

    spark.sql("DROP TABLE pcatse.pages")
  }
}
