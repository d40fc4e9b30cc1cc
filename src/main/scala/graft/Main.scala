package graft

import graft.operators.Extract
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** User-facing driver entry (also the spark-submit entry on a real cluster):
  *
  *   extract <nPages> <outDir> [seed]    synthesize corpus, extract, write parquet
  *   extract-dir <pagesDir> <outDir>     extract from an existing pages table
  *   write-pages <nPages> <tableDir> [seed] [buckets]
  *                                       synthesize + write the bucketed pages table
  *   run <tableDir> <outDir> <manifestDir> [maxBuckets]
  *                                       resumable production run (per-bucket
  *                                       lineage; re-run to resume after a kill)
  *
  * Local run: sbt "runMain graft.Main extract 1000 /tmp/out"
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.Main extract <nPages> <outDir> [seed] | extract-dir <pagesDir> <outDir>")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args(0) match {
        case "write-pages" =>
          val n = args(1).toLong
          val seed = if (args.length > 3) args(3).toLong else Corpus.DEFAULT_SEED
          val buckets = if (args.length > 4) args(4).toInt else graft.sources.PageTable.DEFAULT_BUCKETS
          graft.sources.PageTable.write(Corpus.pages(spark, n, seed), args(2), buckets)
          println(s"wrote $n pages -> ${args(2)} ($buckets buckets)")
          return
        case "run" =>
          val maxB = if (args.length > 4) args(4).toInt else Int.MaxValue
          val runId = s"run-${System.currentTimeMillis()}"
          val rep = graft.operators.ResumableExtract.run(
            spark, args(1), args(2), args(3), runId, maxBuckets = maxB)
          println(s"run $runId: processed buckets ${rep.bucketsDone.mkString(",")} " +
            s"(${rep.nDocs} docs); ${rep.skipped} buckets already done")
          return
        case _ => ()
      }
      val (pages, outDir) = args(0) match {
        case "extract" =>
          val n = args(1).toLong
          val seed = if (args.length > 3) args(3).toLong else Corpus.DEFAULT_SEED
          (Corpus.pages(spark, n, seed), args(2))
        case "extract-dir" =>
          import spark.implicits._
          (spark.read.schema(Model.PAGES).parquet(args(1)).as[Page], args(2))
        case other =>
          System.err.println(s"unknown command: $other"); sys.exit(2); null
      }
      val t0 = System.nanoTime()
      val docs = Extract.extract(pages)
      docs.write.mode("overwrite").parquet(outDir)
      val dt = (System.nanoTime() - t0) / 1e9
      val stats = spark.read.parquet(outDir)
        .groupBy("contentKind")
        .agg(count(lit(1)).as("docs"), sum(length(col("text"))).as("chars"))
        .orderBy("contentKind")
        .collect()
      val total = stats.map(_.getLong(1)).sum
      stats.foreach(r => println(f"  ${r.getString(0)}%-16s ${r.getLong(1)}%8d docs  ${if (r.isNullAt(2)) 0L else r.getLong(2)}%12d chars"))
      println(f"extracted $total%d docs in $dt%.2f s (${total / dt}%.0f docs/s) -> $outDir")
    } finally spark.stop()
  }
}
