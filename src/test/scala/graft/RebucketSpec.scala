package graft

import graft.sources.{Corpus, PageTable, Rebucket, Snapshots}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S29 partition-spec evolution: the bucket modulus changes only through a
  * full rewrite, after which every row sits in the directory the NEW layout
  * function says it must.
  */
class RebucketSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft-rebkt").toString

  private def contentKey(dir: String): Seq[(String, String)] =
    PageTable.read(spark, dir).collect().toSeq.map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val payload = if (p.html == null) Array.empty[Byte] else p.html
      (p.url, md.digest(payload).map(b => f"$b%02x").mkString)
    }.sortBy(_._1)

  test("rebucket 8 -> 16: content identical, every row in its new-layout " +
    "directory, meta updated, appends keep resolving") {
    val dir = s"$tmp/t1"
    PageTable.write(Corpus.pages(spark, 300L), dir, numBuckets = 8)
    PageTable.register(spark, "grb", tmp)
    Corpus.pages(spark, 60L, seed = 9L).toDF().writeTo("grb.t1").append()
    val before = contentKey(dir)
    val (v, n) = Rebucket.run(spark, dir, 16)
    assert(n > 0 && v == Snapshots.latestVersion(dir).get)
    assert(PageTable.readBucketMeta(dir).contains(16))
    assert(contentKey(dir) == before)
    // physical placement: the bucket partition value of every row equals
    // the NEW layout function of its url
    val placed = spark.read.option("basePath", s"$dir/data")
      .parquet(s"$dir/data")
      .select(col("url"), col("bucket").cast("int").as("b"),
        PageTable.bucketCol(16).as("want"))
      .filter(col("b") =!= col("want")).count()
    assert(placed == 0L)
    // post-evolution appends land with the new modulus (catalog re-reads meta)
    Corpus.pages(spark, 40L, seed = 77L).toDF().writeTo("grb.t1").append()
    assert(contentKey(dir).size == 400)
    val placed2 = spark.read.option("basePath", s"$dir/data")
      .parquet(s"$dir/data")
      .select(col("bucket").cast("int").as("b"), PageTable.bucketCol(16).as("want"))
      .filter(col("b") =!= col("want")).count()
    assert(placed2 == 0L)
    // old layout is aside, not deleted; the new snapshot is self-consistent
    assert(new java.io.File(dir).listFiles.exists(_.getName.startsWith("rebucket-aside")))
    val (_, rel) = Snapshots.files(dir, v).get
    rel.foreach(p => assert(new java.io.File(s"$dir/data/$p").isFile, p))
  }

  test("replay is a no-op on a settled table; a staged-but-uncommitted " +
    "rebucket leaves the table untouched") {
    val dir = s"$tmp/t2"
    PageTable.write(Corpus.pages(spark, 100L), dir, numBuckets = 4)
    val before = contentKey(dir)
    Rebucket.replay(dir) // no intent -> no-op
    assert(contentKey(dir) == before)
    // a crash BEFORE the intent commit (stage dir exists, no intent file)
    // must be invisible: the stage is hidden from scans and the next run
    // replaces it
    val stage = new java.io.File(dir, "_rebucket_stage/bucket=0/day=2025-01-01")
    stage.mkdirs()
    java.nio.file.Files.write(
      stage.toPath.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    assert(contentKey(dir) == before)
    val (v, _) = Rebucket.run(spark, dir, 8)
    assert(PageTable.readBucketMeta(dir).contains(8))
    assert(contentKey(dir) == before)
    assert(!new java.io.File(dir, "_rebucket_stage").exists())
    assert(v == Snapshots.latestVersion(dir).get)
  }
}
