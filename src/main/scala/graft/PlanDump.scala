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
    out.println("**Memory bound (round 3).** The partial stage is self-disabling on")
    out.println("high-cardinality keys: it holds at most `maxPartialKeys * k` retained rows")
    out.println("per partition (`-Dgraft.topk.maxPartialKeys`, default 2^17), and a")
    out.println("selectivity probe after 8192 rows bails to passthrough when the heaps have")
    out.println("retained >= 75% of input (near-unique keys: the pre-selection would copy")
    out.println("~every row for no shuffle savings). Bailing emits the accumulated heaps plus")
    out.println("the untouched remainder — always a superset of each key's true top-k, so the")
    out.println("final stage stays exact (tested at ~1M near-unique keys through both bail")
    out.println("paths, CatalystSurfaceSpec). The FINAL stage never bails; its true memory")
    out.println("need is O(distinct keys per partition * k) rows — at 100 TB, size the key")
    out.println("partitioning so distinct-keys/partition * k * rowWidth fits the executor")
    out.println("(e.g. 10^9 keys / 2000 partitions * k=5 * 100 B = 250 MB), or fall back to")
    out.println("the window formulation (which spills its sort) for pathological key counts.\n")
    out.println("```")
    out.println(graft.operators.Relational.qTopkPerKey(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    out.println("```")
    out.println("\n## DSv2 catalog scan (`spark.read.table`) — bucket pruning through the plugin\n")
    out.println("GraftCatalog resolves the table; the scan is the built-in v2 Parquet")
    out.println("source, so the bucket filter prunes directories before planning")
    out.println("(PageTableSpec additionally asserts only bucket=3 files are planned).\n")
    val wh = java.nio.file.Files.createTempDirectory("plans-wh").toString
    PageTable.write(Corpus.pages(spark, 300), s"$wh/pages", 8)
    PageTable.register(spark, "plans_cat", wh)
    out.println("```")
    out.println(spark.sql("SELECT url, lang FROM plans_cat.pages WHERE bucket = 3")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    out.println("```")
    out.println("\n## `ex_skewjoin` — salt-folded shuffled join (skew handling on a join key)\n")
    out.println("The fact side folds salt = pmod(xxhash64(url), 8) into the join key; the")
    out.println("dim side is replicated 8x; shuffle_hash keeps it a real shuffled join")
    out.println("(broadcast would never skew). The hot host's rows spread over 8 reducers.\n")
    out.println("```")
    out.println(graft.operators.ExtractOracle.exSkewJoin(spark, "")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(10000))
    out.println("```")
    out.println("\n## `q_lateral` — LATERAL top-2-per-customer, decorrelated\n")
    out.println("Catalyst rewrites the correlated ORDER BY+LIMIT subquery into a ranked")
    out.println("window join (no per-row re-execution); the rank<=2 filter then plans as")
    out.println("WindowGroupLimit — bounded per-key heaps on both sides of the shuffle")
    out.println("instead of a full per-key sort (same shape ScaleSurfaceSpec pins).\n")
    out.println("```")
    out.println(graft.operators.Relational.qLateral(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(9000))
    out.println("```")
    out.close(); spark.stop()
  }
}
