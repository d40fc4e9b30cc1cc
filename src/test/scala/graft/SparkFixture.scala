package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (fork:=true, single JVM). */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // match graft.Verify: the suite and the driver-contract dump SHARE the
      // staged oracle corpora, and the staging is marker-gated on code mtime
      // — whichever JVM stages last must produce the SAME parquet timestamp
      // typing or the DuckDB oracle's ts columns flip naive/tz between runs
      // (observed: suite-staged INT96 docs made ex_urldedup's kept_ts
      // type-mismatch a Verify dump)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable (bucketed-join tests) out of the repo root
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").getAbsolutePath)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
