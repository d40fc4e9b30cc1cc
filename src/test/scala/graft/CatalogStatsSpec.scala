package graft

import graft.sources.{Corpus, PageTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog statistics surface (VERDICT r3 §missing-2): the planner must be
  * able to pick broadcast sides on catalog scans BEFORE runtime — no AQE,
  * no hint — and the SPJ scan must report real sizes instead of the
  * Long.MaxValue default.
  */
class CatalogStatsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  private val tmp = java.nio.file.Files.createTempDirectory("graft-stats").toString

  test("small catalog table plans as the BROADCAST side without hint or AQE") {
    PageTable.register(spark, "pstat", s"$tmp/wh")
    PageTable.write(Corpus.pages(spark, 50L), s"$tmp/wh/small", numBuckets = 4)
    PageTable.write(Corpus.pages(spark, 2000L), s"$tmp/wh/big", numBuckets = 4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("pstat.big").join(spark.table("pstat.small"), "url")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected static broadcast of the small catalog side:\n${plan.take(2000)}")
      // and the small side's relation-level size is the file-backed estimate,
      // not a default
      val stats = spark.table("pstat.small").queryExecution.optimizedPlan.stats
      assert(stats.sizeInBytes > 0 &&
        stats.sizeInBytes < spark.conf.get("spark.sql.autoBroadcastJoinThreshold").replace("b", "").toLong.max(10L * 1024 * 1024),
        s"small-table sizeInBytes not file-backed: ${stats.sizeInBytes}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bucketed (SPJ) scan reports delegate size and exact footer rowCount") {
    PageTable.register(spark, "pstat2", s"$tmp/wh2")
    PageTable.write(Corpus.pages(spark, 300L), s"$tmp/wh2/pages", numBuckets = 4)
    val df = spark.read.option("bucketedScan", "true").table("pstat2.pages")
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.get
    val st = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().isPresent && st.numRows().getAsLong == 300L,
      s"footer rowCount: ${st.numRows()}")
    assert(st.sizeInBytes().isPresent && st.sizeInBytes().getAsLong > 0)
    // relation-level stats carry the exact row count through to the planner
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(300)), s"relation rowCount: ${stats.rowCount}")
  }
}
