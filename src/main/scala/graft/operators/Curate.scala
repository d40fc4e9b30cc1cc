package graft.operators

import graft.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline — the operators of this library composed
  * into the one program a training-data run actually executes:
  *
  *   extract → C4 line dedup → quality gate (length + Gopher repetition) →
  *   exact dedup → deterministic split → partitioned write
  *
  * Every stage is the library's own operator (lineDedupOver, gopherSignals,
  * md5 split) over the extracted documents; stage verdicts are carried as
  * BOOLEAN COLUMNS on one DataFrame so the whole audit report comes from a
  * single aggregate pass — no per-stage recount jobs. Scale shape: the
  * extraction output is checkpointed once, the line-dedup join and the
  * signals are the only exchanges, and the final write partitions by split.
  */
object Curate {

  case class Report(
      extracted: Long, nonEmpty: Long, qualityKept: Long,
      uniqueKept: Long, train: Long, `val`: Long, test: Long)

  /** Quality thresholds (integer, documented in the report):
    * ≥ 20 whitespace tokens, ≤ 30 % duplicate lines, top bigram ≤ 20 % of
    * characters.
    */
  val MIN_TOKENS = 20L
  val MAX_DUP_LINE_X1000 = 300L
  val MAX_TOP_BIGRAM_X1000 = 200L

  def run(spark: SparkSession, pages: Dataset[Page], outDir: String): Report = {
    import org.apache.spark.sql.expressions.Window

    val docs = Extract.extract(pages).toDF()
      .select(col("url"), col("warc_ts"), col("lang"), col("text"), col("contentKind"))
      .localCheckpoint() // extraction runs once; three consumers below

    val nonEmpty = docs.filter(col("contentKind") =!= "empty" && length(col("text")) > 0)

    // C4 corpus-level line dedup: boilerplate lines keep one occurrence
    val deduped = Dedup.lineDedupOver(nonEmpty.select(col("url"), col("text")))
      .select(col("url"), col("text_dedup"))
    val withText = nonEmpty.drop("text")
      .join(deduped, Seq("url"))
      .withColumnRenamed("text_dedup", "text")

    // Gopher repetition signals + length gate, as verdict columns
    val signals = TextAnalysis.gopherSignals(withText.select(col("url"), col("text")))
      .select(col("url"), col("dup_line_frac_x1000"), col("top_bigram_frac_x1000"))
    val judged = withText
      .join(signals, Seq("url"))
      .withColumn("n_tok",
        size(filter(split(col("text"), " "), t => t =!= lit(""))).cast("long"))
      .withColumn("quality_ok",
        col("n_tok") >= MIN_TOKENS &&
          col("dup_line_frac_x1000") <= MAX_DUP_LINE_X1000 &&
          col("top_bigram_frac_x1000") <= MAX_TOP_BIGRAM_X1000)

    // exact dedup among quality survivors: first url per text fingerprint
    val w = Window.partitionBy("fp").orderBy("url")
    val flagged = judged
      // rejected rows get a per-row key: a shared NULL fp would funnel every
      // rejected document through one window partition (skew)
      .withColumn("fp", when(col("quality_ok"), md5(col("text")))
        .otherwise(concat(lit("rejected:"), col("url"))))
      .withColumn("unique_ok",
        col("quality_ok") && row_number().over(w) === 1)
      .withColumn("split",
        when(!col("unique_ok"), lit(null).cast("string")).otherwise {
          val h = conv(substring(md5(col("url")), 1, 4), 16, 10).cast("long") % 100
          when(h < 80, "train").when(h < 90, "val").otherwise("test")
        })
      .localCheckpoint() // verdicts computed once; report + write below

    val r = flagged.agg(
      count(lit(1)).as("nonEmpty"),
      count(when(col("quality_ok"), 1)).as("qualityKept"),
      count(when(col("unique_ok"), 1)).as("uniqueKept"),
      count(when(col("split") === "train", 1)).as("train"),
      count(when(col("split") === "val", 1)).as("val"),
      count(when(col("split") === "test", 1)).as("test")).head()

    flagged.filter(col("unique_ok"))
      .select(col("split"), col("url"), col("warc_ts"), col("lang"),
        col("contentKind"), col("n_tok"), col("text"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)

    Report(docs.count(), r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
  }
}
