package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's `documents` / `embeddings` tables
  * for the heavy-tail soak (VERDICT r3 item 3: wall-time scaling exponents
  * for the iterative/quadratic-risk queries at ~10x the bench scale).
  *
  * The driver's sf0.1 tables can't be regenerated (read-only, unknown
  * generator), so this reproduces their MEASURED distributions — the
  * properties the heavy queries' costs actually depend on:
  *   - documents: 31-word vocabulary, 10..100 words/doc uniform,
  *     langs en 40% / {zh,es,fr,de} 15% each, 20 sources, ~0.16% exact
  *     duplicate texts (8 in 5000 at sf0.1);
  *   - embeddings: dim 64, 10 roughly-equal label clusters, values in
  *     ~[-0.4, 0.4] centred near 0 (per-label centre + uniform noise).
  *
  * Everything is a pure function of (id, seed) via xxhash64 — distributed,
  * shuffle-free generation (one `spark.range`, map-only), re-runnable to
  * the byte. Texts of planted duplicates come from generating with the
  * ORIGINAL doc's key, not from a self-join.
  */
object SoakData {
  // measured vocabulary of the driver's documents table (sf0.1)
  private val VOCAB: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** `n` documents with the driver-table shape (doc_id, text, lang, source,
    * n_chars). A doc is an exact duplicate of its predecessor with
    * probability 1/625 (the sf0.1 rate): its text is generated from
    * `doc_id - 1`'s key, so duplication needs no join.
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val vocab = array(VOCAB.map(lit): _*)
    spark.range(n).toDF("doc_id")
      .withColumn("_dup",
        col("doc_id") > 0 && pmod(xxhash64(col("doc_id"), lit(seed), lit("dup")), lit(625)) === 0)
      .withColumn("_k", when(col("_dup"), col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("_nw", (pmod(xxhash64(col("_k"), lit(seed), lit("len")), lit(91)) + 10).cast("int"))
      .withColumn("text", array_join(
        transform(sequence(lit(1), col("_nw")),
          i => element_at(vocab,
            (pmod(xxhash64(col("_k"), i, lit(seed)), lit(VOCAB.length)) + 1).cast("int"))),
        " "))
      .withColumn("lang",
        element_at(array(lit("en"), lit("en"), lit("en"), lit("en"), lit("en"),
            lit("en"), lit("en"), lit("en"), lit("zh"), lit("zh"), lit("zh"),
            lit("es"), lit("es"), lit("es"), lit("fr"), lit("fr"), lit("fr"),
            lit("de"), lit("de"), lit("de")),
          (pmod(xxhash64(col("doc_id"), lit(seed), lit("lang")), lit(20)) + 1).cast("int")))
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("doc_id"), lit(seed), lit("src")), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** `n` embeddings with the driver-table shape (vec_id, embedding[64],
    * label): per-label deterministic centre (amplitude ~0.2) + per-vector
    * uniform noise (~±0.18) — same value range and cluster structure as the
    * measured table.
    */
  def embeddings(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    def u(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (pmod(h, lit(1000000)).cast("double") / 500000.0) - 1.0 // [-1, 1)
    spark.range(n).toDF("vec_id")
      .withColumn("label", pmod(xxhash64(col("vec_id"), lit(seed), lit("lbl")), lit(10)).cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), d =>
          (u(xxhash64(col("label"), d, lit(seed), lit("ctr"))) * 0.2 +
            u(xxhash64(col("vec_id"), d, lit(seed), lit("nz"))) * 0.18).cast("float")))
      .select("vec_id", "embedding", "label")
  }

  /** Stage a soak directory shaped like a driver sf dir: `mult` scales the
    * sf0.1 row counts (5000 docs / 2000 vectors). Layout matches what every
    * `queries()` entry reads: `<dir>/documents.parquet`,
    * `<dir>/embeddings.parquet`.
    */
  def stage(spark: SparkSession, outDir: String, mult: Double, seed: Long = 42L): (Long, Long) = {
    val nDocs = (5000 * mult).toLong
    val nVecs = (2000 * mult).toLong
    documents(spark, nDocs, seed).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs, seed).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
    (nDocs, nVecs)
  }
}
