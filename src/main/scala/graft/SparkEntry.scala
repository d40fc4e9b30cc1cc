package graft

import graft.operators._
import graft.sources.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the operator surface from every module; each
  * SQL-expressible entry carries a bit-exact DuckDB oracle in `oracleSql`
  * (same column names/aliases, deterministic total ORDER BY, no float drift
  * — see FIXTURES.md §3 for the exactness rules).
  */
object SparkEntry {

  /** Flagship: the full extraction pipeline (sniff → decode → tokenize →
    * classify → line-merge → assemble) over a small deterministic synthetic
    * corpus; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Extract.extract(Corpus.pages(spark, 200L)).toDF()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
      Dedup.queries ++
      Similarity.queries ++
      TextAnalysis.queries ++
      ExtractOracle.queries ++
      Structured.queries ++
      CrawlOps.queries ++
      PdfChrome.queries ++
      graft.streaming.StreamingOps.queries ++
      Multimodal.queries ++
      graft.sources.Formats.queries ++
      graft.sources.Warc.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (winnowing,
    * binary media decode, approx sketches) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++
      Dedup.oracles ++
      Similarity.oracles ++
      TextAnalysis.oracles ++
      ExtractOracle.oracles ++
      Structured.oracles ++
      CrawlOps.oracles ++
      PdfChrome.oracles ++
      graft.streaming.StreamingOps.oracles ++
      Multimodal.oracles ++
      graft.sources.Formats.oracles ++
      graft.sources.Warc.oracles
}
