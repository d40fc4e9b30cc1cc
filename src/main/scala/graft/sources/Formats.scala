package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType}

/** Source/sink format breadth (SURVEY.md §2.13 S8): the extraction output
  * exported through Spark's text-based interchange sinks (JSONL, RFC-4180
  * CSV) and the columnar ORC sink, then read back and verified.
  *
  * What the oracles actually prove:
  *   - `fmt_json` / `fmt_csv`: DuckDB parses the EXACT files Spark wrote
  *     (read_json / read_csv over the same directory) — a cross-ENGINE check
  *     of the sink's escaping (986 of 1500 docs carry embedded newlines;
  *     quotes, commas and non-ASCII appear throughout the corpus text), not
  *     just a Spark-reads-its-own-output round trip.
  *   - `fmt_orc`: ORC has no DuckDB reader, so the oracle recomputes the
  *     aggregate from the parquet docs table the export came from — the ORC
  *     round trip must preserve every row/value to hash-match.
  *
  * Scale notes (100 TB): all three sinks inherit the DataFrame's
  * partitioning — export shards per task with no driver involvement, and a
  * `partitionBy(bucket)` layout drops in unchanged. JSONL is the preferred
  * text interchange at scale: it splits by line without parser state. CSV
  * with embedded newlines needs `multiLine=true` on read, which makes one
  * file one split — ship CSV for interop, not as a scan source. ORC/parquet
  * remain the only formats with pushdown + pruning; the oracles here verify
  * fidelity, the parquet paths elsewhere carry the scan story.
  *
  * Empty-text docs (unsupported PDFs, `text=''`) are excluded from the text
  * exports: Spark's CSV sink writes empty string and NULL identically by
  * default, so '' would not survive a CSV round trip unambiguously. The ORC
  * export keeps every row (binary-faithful columnar format).
  */
object Formats {

  private val DIR = OracleCorpus.DIR
  val JSON_DIR = s"$DIR/export-json"
  val JSONGZ_DIR = s"$DIR/export-json-gz"
  val CSV_DIR = s"$DIR/export-csv"
  val ORC_DIR = s"$DIR/export-orc"

  private val TEXT_SCHEMA = StructType(Seq(
    StructField("url", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  @volatile private var done = false

  /** Idempotent export of the materialized extraction output; marker-gated
    * with the shared code-stamp protocol so a recompile re-exports.
    */
  private def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"$DIR/_FORMATS_READY")
    val stamp = s"fmt:${OracleCorpus.codeStamp()}"
    if (!OracleCorpus.markerFresh(marker, stamp)) {
      val docs = OracleCorpus.docs(spark)
      val textDocs = docs.filter(col("text") =!= "")
        .select("url", "lang", "text")
      textDocs.write.mode("overwrite").json(JSON_DIR)
      textDocs.write.mode("overwrite")
        .option("compression", "gzip").json(JSONGZ_DIR)
      // CSV additionally excludes docs carrying C0 control bytes (binary-soup
      // payloads decoded as text): RFC 4180 has no escape for NUL & friends
      // and parsers disagree on them — measured: DuckDB drops the NUL, Spark
      // mangles it. JSONL above round-trips those same docs fine (backslash-u
      // escapes), which is exactly the "JSONL for interchange" scale note.
      textDocs.filter(!col("text").rlike("[\\x00-\\x09\\x0B-\\x1F\\x7F]"))
        .write.mode("overwrite")
        .option("header", "true")
        .option("quote", "\"")
        .option("escape", "\"") // RFC-4180 doubled quotes, not backslash
        .csv(CSV_DIR)
      docs.select("url", "lang", "contentKind", "nBlocks", "nDropped", "text")
        .write.mode("overwrite").orc(ORC_DIR)
      OracleCorpus.writeMarker(marker, stamp)
    }
    done = true
  }

  /** JSONL export read back by Spark with an explicit schema; DuckDB parses
    * the same files independently. Text compared by md5 + codepoint length
    * (corpus is BMP-only, so Spark chars == DuckDB codepoints).
    */
  def fmtJson(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    spark.read.schema(TEXT_SCHEMA).json(JSON_DIR)
      .select(col("url"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text").cast("binary")).as("h"))
      .orderBy("url")
  }

  val fmtJsonSql: String =
    s"""SELECT url, lang, CAST(length(text) AS BIGINT) n_chars, md5(text) h
       |FROM read_json('$JSON_DIR/*.json', format='newline_delimited',
       |               columns={url:'VARCHAR',lang:'VARCHAR',text:'VARCHAR'})
       |ORDER BY url""".stripMargin

  /** Gzip-compressed JSONL — the interchange wire norm (a 100 TB text
    * export ships compressed or not at all): Spark's built-in codec chain
    * writes `.json.gz` parts and the reader inflates by extension with no
    * code change; DuckDB does the same on its side, so the oracle proves
    * the COMPRESSED artifact itself round-trips bit-exactly across engines
    * (same rollup as fmt_json — any codec-layer corruption breaks the md5s).
    */
  def fmtJsonGz(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    spark.read.schema(TEXT_SCHEMA).json(JSONGZ_DIR)
      .select(col("url"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text").cast("binary")).as("h"))
      .orderBy("url")
  }

  val fmtJsonGzSql: String =
    s"""SELECT url, lang, CAST(length(text) AS BIGINT) n_chars, md5(text) h
       |FROM read_json('$JSONGZ_DIR/*.json.gz', format='newline_delimited',
       |               columns={url:'VARCHAR',lang:'VARCHAR',text:'VARCHAR'})
       |ORDER BY url""".stripMargin

  /** CSV export (RFC-4180: quote-doubling escape, embedded newlines inside
    * quotes) read back by Spark with `multiLine` and by DuckDB's read_csv.
    */
  def fmtCsv(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    spark.read.schema(TEXT_SCHEMA)
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(CSV_DIR)
      .select(col("url"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text").cast("binary")).as("h"))
      .orderBy("url")
  }

  val fmtCsvSql: String =
    s"""SELECT url, lang, CAST(length(text) AS BIGINT) n_chars, md5(text) h
       |FROM read_csv('$CSV_DIR/*.csv', header=true, quote='"', escape='"',
       |              columns={'url':'VARCHAR','lang':'VARCHAR','text':'VARCHAR'})
       |ORDER BY url""".stripMargin

  /** ORC round trip: full docs projection written to ORC, read back, rolled
    * up. The oracle aggregates the parquet table the export came from — any
    * row or value the ORC trip loses breaks the hash.
    */
  def fmtOrc(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    spark.read.orc(ORC_DIR)
      .groupBy("lang", "contentKind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(col("nBlocks").cast("long")).as("sum_blocks"),
        sum(col("nDropped").cast("long")).as("sum_dropped"),
        // deterministic per-group digest: sorted per-doc hashes, space-joined
        md5(array_join(sort_array(collect_list(md5(col("text").cast("binary")))),
          " ").cast("binary")).as("texts_h"))
      .orderBy("lang", "contentKind")
  }

  val fmtOrcSql: String =
    s"""SELECT lang, contentKind,
       |       count(*) n,
       |       CAST(sum(length(text)) AS BIGINT) sum_chars,
       |       CAST(sum(nBlocks) AS BIGINT) sum_blocks,
       |       CAST(sum(nDropped) AS BIGINT) sum_dropped,
       |       md5(string_agg(md5(text), ' ' ORDER BY md5(text))) texts_h
       |FROM ${OracleCorpus.DOCS_PQ}
       |GROUP BY lang, contentKind
       |ORDER BY lang, contentKind""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fmt_json" -> (fmtJson _),
    "fmt_json_gz" -> (fmtJsonGz _),
    "fmt_csv" -> (fmtCsv _),
    "fmt_orc" -> (fmtOrc _),
    "fmt_footer" -> (FooterStats.fmtFooter _),
    "fmt_zstd" -> (FooterStats.fmtZstd _)
  )

  def oracles: Map[String, String] = Map(
    "fmt_json" -> fmtJsonSql,
    "fmt_json_gz" -> fmtJsonGzSql,
    "fmt_csv" -> fmtCsvSql,
    "fmt_orc" -> fmtOrcSql,
    "fmt_footer" -> FooterStats.fmtFooterSql,
    "fmt_zstd" -> FooterStats.fmtZstdSql
  )
}
