package graft
import graft.operators.Extract
import graft.sources.{Corpus, PageTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(new java.io.File(args(0)), "UTF-8")
    out.println("# PLANS — physical plans of the hot paths (generated; AQE off for readability)\n")
    out.println("## `Extract.extract(pages)` — the extraction pipeline\n")
    out.println("```")
    out.println(Extract.extract(Corpus.pages(spark, 50)).toDF().queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(20000))
    out.println("```")
    // parquet pushdown evidence
    val dir = java.nio.file.Files.createTempDirectory("plans-pages").toString
    PageTable.write(Corpus.pages(spark, 500), dir, 8)
    val q = PageTable.readRaw(spark, dir)
      .filter(col("bucket") === 3 && col("lang") === "en")
      .select("url", "lang")
    out.println("\n## Pages-table scan: partition pruning + predicate pushdown + column pruning\n")
    out.println("```")
    out.println(q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(8000))
    out.println("```")
    out.println("\n## `dd_ngram_jaccard` — df-capped inverted shingle index\n")
    out.println("The count window (df cap) and the candidate self-join share the")
    out.println("shingle hash partitioning; the self-join sides are ReusedExchange.\n")
    out.println("```")
    out.println(graft.operators.Dedup.ngramJaccard(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(14000))
    out.println("```")
    out.println("\n## `sim_lsh_nn` — multi-band sign-LSH candidate join\n")
    out.println("```")
    out.println(graft.operators.Similarity.lshNn(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(12000))
    out.println("```")
    out.println("\n## `q_topk_per_key` — custom TopKPerKey operator stack\n")
    out.println("PartialTopK (map-side heap) -> Exchange(keys) -> FinalTopK; no Window,")
    out.println("no per-partition sort (the only Sort is the presentation orderBy).\n")
    out.println("```")
    out.println(graft.operators.Relational.qTopkPerKey(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    out.println("```")
    out.close(); spark.stop()
  }
}
