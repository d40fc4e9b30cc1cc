package graft

import graft.sources.{Corpus, PageTable, Snapshots}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S19 — named snapshot refs (Iceberg-style tags).
  *
  * Pinned: tag → `VERSION AS OF 'name'` resolution in SQL, immutability
  * (re-tag refused until untag), bad-name/missing-version refusals, listing,
  * and the tag-then-experiment-then-rollback flow (the tag survives a
  * rollback because rollback restores exactly the tagged state's files).
  */
class SnapshotTagSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  private val N = 100L
  private val tmp = Files.createTempDirectory("graft-tag").toString

  test("tags: named time travel, immutability, rollback interplay") {
    val wh = s"$tmp/wh"
    val dir = s"$wh/pages"
    PageTable.register(spark, "pcatt", wh)
    PageTable.write(Corpus.pages(spark, N), dir, numBuckets = 8)
    val v1 = Snapshots.latestVersion(dir).get

    Snapshots.tag(dir, "train-v1", v1)
    assert(Snapshots.tags(dir) == Seq("train-v1" -> v1))

    // append an experimental drop -> v2; the tag keeps naming the old state
    Corpus.pages(spark, 20L)
      .withColumnRenamed("url", "u")
      .selectExpr("concat('https://exp.example/', u) AS url",
        "warc_ts", "html", "text", "lang")
      .writeTo("pcatt.pages").append()
    assert(spark.table("pcatt.pages").count() == N + 20)
    assert(spark.sql(
      "SELECT count(*) FROM pcatt.pages VERSION AS OF 'train-v1'")
      .head().getLong(0) == N)
    // numbered access unaffected
    assert(spark.sql(
      s"SELECT count(*) FROM pcatt.pages VERSION AS OF $v1")
      .head().getLong(0) == N)

    // immutability + refusals
    intercept[IllegalArgumentException](Snapshots.tag(dir, "train-v1", v1))
    intercept[IllegalArgumentException](Snapshots.tag(dir, "9lives", v1))
    intercept[IllegalArgumentException](Snapshots.tag(dir, "ghost", 999))
    val err = intercept[Exception](spark.sql(
      "SELECT count(*) FROM pcatt.pages VERSION AS OF 'no-such-tag'").collect())
    assert(err.getMessage.contains("no tag"))

    // tag the good state, experiment, roll back: the rollback RESTORES the
    // tagged files, so the tag stays readable and equals the live table
    val (v3, _) = Snapshots.rollback(dir, v1)
    assert(v3 > v1)
    assert(spark.table("pcatt.pages").count() == N)
    assert(spark.sql(
      "SELECT count(*) FROM pcatt.pages VERSION AS OF 'train-v1'")
      .head().getLong(0) == N)

    // untag: name gone, snapshot stays
    assert(Snapshots.untag(dir, "train-v1"))
    assert(!Snapshots.untag(dir, "train-v1"))
    assert(Snapshots.tags(dir).isEmpty)
    assert(spark.sql(
      s"SELECT count(*) FROM pcatt.pages VERSION AS OF $v1")
      .head().getLong(0) == N)

    spark.sql("DROP TABLE pcatt.pages")
  }
}
