package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet footer-statistics harvesting (`fmt_footer`): read the row-group
  * metadata of a staged parquet export DISTRIBUTED (one footer per task, no
  * driver loop) and emit the per-(file, row-group, column) min/max/null
  * statistics for the integer columns — the primitive a 100 TB lakehouse
  * uses to build min/max file-skipping manifests (what `q_zorder` +
  * `Compact.zorder` consume, and what BloomIndex complements for point
  * lookups).
  *
  * Cross-engine oracle: DuckDB's `parquet_metadata()` table function reads
  * the SAME staged files' footers with its own independent parquet
  * implementation — every value (row-group boundaries chosen by the writer,
  * value counts, null counts, min/max) must agree byte-for-byte between
  * parquet-mr-read and DuckDB-read footers. Restricted to INT32/INT64
  * physical columns so min/max render identically as BIGINT on both sides
  * (string stats can be writer-truncated mid-grapheme; timestamps render
  * engine-specifically).
  *
  * Scale notes: footers are O(KB) regardless of file size — harvesting them
  * over a 100 TB table is a file-count-bound job (one footer read per task,
  * ~10^5 tasks for 10^5 files), not a data-bound one; the staged export here
  * deliberately forces SMALL row groups (64 KB) so several groups per file
  * exercise the per-group iteration. The file listing itself is the
  * driver-side bound — at 10^5+ files ship the manifest (S5) as the input
  * table instead of `listFiles`.
  */
object FooterStats {

  val FOOT_DIR = s"${OracleCorpus.DIR}/export-footer"

  @volatile private var done = false

  /** Stage a multi-file, multi-row-group parquet export of the extraction
    * output: 4 url-hash-bucketed files, sorted within each so the integer
    * stats are non-trivial (monotone n_chars would make min/max degenerate),
    * 64 KB row groups so each file carries several. Marker-gated with the
    * shared code-stamp protocol.
    */
  private def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"${OracleCorpus.DIR}/_FOOTER_READY")
    val stamp = s"foot:${OracleCorpus.codeStamp()}"
    if (!OracleCorpus.markerFresh(marker, stamp)) {
      OracleCorpus.docs(spark)
        .select(col("url"), col("text"),
          col("nBlocks"), col("nDropped"),
          length(col("text")).cast("long").as("n_chars"),
          // all-NULL integer column: the witness for NULL min/max footer
          // stats (parquet writes hasNonNullValue=false; DuckDB reports
          // NULL stats_min_value — both sides must agree)
          lit(null).cast("long").as("n_null_w"))
        .repartition(4, pmod(xxhash64(col("url")), lit(4)))
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(FOOT_DIR)
      OracleCorpus.writeMarker(marker, stamp)
    }
    done = true
  }

  /** One row per (file, row-group, integer column) with the footer stats,
    * harvested on executors with parquet-mr (`ParquetFileReader` reads ONLY
    * the footer bytes — no data pages touched).
    */
  def fmtFooter(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark)
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val files = new java.io.File(FOOT_DIR).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted.toSeq
    spark.createDataset(files)
      .repartition(files.length) // one footer per task: the 10^5-file shape
      .mapPartitions { paths =>
        val conf = new org.apache.hadoop.conf.Configuration()
        paths.flatMap { path =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(path), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val base = path.substring(path.lastIndexOf('/') + 1)
            r.getFooter.getBlocks.asScala.toList.zipWithIndex.flatMap {
              case (b, rg) =>
                b.getColumns.asScala.flatMap { c =>
                  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                  val tn = c.getPrimitiveType.getPrimitiveTypeName
                  if (tn != INT32 && tn != INT64) None
                  else {
                    val st = c.getStatistics
                    // all-null column ⇒ no min/max exists: emit NULL like
                    // DuckDB's NULL stats_min_value, never dereference
                    val (mn, mx) =
                      if (st != null && st.hasNonNullValue)
                        (Some(st.genericGetMin.asInstanceOf[Number].longValue),
                          Some(st.genericGetMax.asInstanceOf[Number].longValue))
                      else (None, None)
                    Some((base, rg, c.getPath.toDotString, c.getValueCount,
                      st.getNumNulls, mn, mx))
                  }
                }
            }
          } finally r.close()
        }
      }
      .toDF("file", "rg", "col", "num_values", "n_nulls", "min_v", "max_v")
      .orderBy("file", "rg", "col")
  }

  val ZSTD_DIR = s"${OracleCorpus.DIR}/export-zstd"

  /** Zstd-compressed parquet export (`fmt_zstd`): the at-scale codec norm —
    * snappy is the default but zstd is what a 100 TB archive actually ships
    * (2–3× smaller at similar scan speed, and parquet-mr/DuckDB/Arrow all
    * read it natively). The export writes the extraction output with
    * `compression=zstd`; DuckDB decompresses the SAME files with its own
    * zstd and the rollup must hash-match — a codec-layer corruption or an
    * unsupported-codec fallback breaks it. (The fmt_json_gz of the columnar
    * path.)
    */
  def fmtZstd(spark: SparkSession, sfDir: String): DataFrame = {
    ensureZstd(spark)
    spark.read.parquet(ZSTD_DIR)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        md5(concat_ws(" ",
          array_sort(collect_list(md5(col("text").cast("binary"))))).cast("binary"))
          .as("texts_h"))
      .orderBy("lang")
  }

  @volatile private var zstdDone = false

  private def ensureZstd(spark: SparkSession): Unit = synchronized {
    if (zstdDone) return
    val marker = new java.io.File(s"${OracleCorpus.DIR}/_ZSTD_READY")
    val stamp = s"zstd:${OracleCorpus.codeStamp()}"
    if (!OracleCorpus.markerFresh(marker, stamp)) {
      OracleCorpus.docs(spark)
        .select(col("url"), col("lang"), col("text"),
          length(col("text")).cast("long").as("n_chars"))
        .repartition(4, pmod(xxhash64(col("url")), lit(4)))
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(ZSTD_DIR)
      OracleCorpus.writeMarker(marker, stamp)
    }
    zstdDone = true
  }

  val fmtZstdSql: String =
    s"""SELECT lang, count(*) n,
       |       CAST(sum(n_chars) AS BIGINT) sum_chars,
       |       md5(string_agg(md5(text), ' ' ORDER BY md5(text))) texts_h
       |FROM read_parquet('$ZSTD_DIR/*.parquet')
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB reads the same footers with its own parquet implementation. */
  val fmtFooterSql: String =
    s"""SELECT regexp_extract(file_name, '[^/]+$$') AS file,
       |       CAST(row_group_id AS INT) rg,
       |       path_in_schema AS col,
       |       CAST(num_values AS BIGINT) num_values,
       |       CAST(stats_null_count AS BIGINT) n_nulls,
       |       CAST(stats_min_value AS BIGINT) min_v,
       |       CAST(stats_max_value AS BIGINT) max_v
       |FROM parquet_metadata('$FOOT_DIR/*.parquet')
       |WHERE type IN ('INT32', 'INT64')
       |ORDER BY file, rg, col""".stripMargin
}
