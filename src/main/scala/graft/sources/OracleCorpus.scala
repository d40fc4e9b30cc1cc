package graft.sources

import graft.BlockRow
import graft.operators.Extract
import org.apache.spark.sql.SparkSession

/** Materializes the synthetic corpus ONCE per JVM for the DuckDB oracle
  * (FIXTURES.md §3): DuckDB cannot run the tokenizer, so the tokenizer's
  * output (the blocks table) is written as parquet and both engines compute
  * the classification / line-merge / assembly stages from that shared input
  * — two independent implementations of the same semantics.
  *
  * Paths are absolute and stable so the oracle SQL can reference them.
  */
object OracleCorpus {

  val DIR = "/root/repo/target/oracle-corpus"
  val BLOCKS = s"$DIR/blocks"
  val DOCS = s"$DIR/docs"
  val HTML = s"$DIR/html"
  val N_PAGES = 1500L

  val BLOCKS_PQ = s"read_parquet('$BLOCKS/*.parquet')"
  val DOCS_PQ = s"read_parquet('$DOCS/*.parquet')"
  val HTML_PQ = s"read_parquet('$HTML/*.parquet')"

  @volatile private var done = false

  /** Fingerprint of everything the materialization depends on: N_PAGES plus
    * the newest class-file mtime under the graft package — any recompile of
    * the generator/extractor invalidates the marker, so the oracle queries
    * can never validate against a stale materialization (the 1.5k-page
    * regeneration costs seconds).
    */
  def codeStamp(): String = {
    val codeDir = try {
      val loc = classOf[graft.BlockRow].getProtectionDomain.getCodeSource.getLocation
      val f = new java.io.File(java.nio.file.Paths.get(loc.toURI).toString, "graft")
      if (f.isDirectory) {
        val walk = java.nio.file.Files.walk(f.toPath)
        try {
          var m = 0L
          walk.forEach { p =>
            val t = p.toFile.lastModified(); if (t > m) m = t
          }
          m.toString
        } finally walk.close()
      } else new java.io.File(java.nio.file.Paths.get(loc.toURI).toString).lastModified.toString
    } catch {
      case e: Throwable =>
        // fall back loudly: a constant stamp disables the staleness guard
        System.err.println(s"[OracleCorpus] code-stamp probe failed (${e.getClass.getSimpleName}): " +
          "oracle materializations will NOT auto-invalidate on recompile")
        "nocode"
    }
    codeDir
  }

  /** Shared marker-freshness protocol for oracle materializations: a marker
    * file is fresh iff it exists and carries exactly `stamp`.
    */
  def markerFresh(marker: java.io.File, stamp: String): Boolean =
    marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp

  def writeMarker(marker: java.io.File, stamp: String): Unit = {
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath, stamp.getBytes)
  }

  private def stamp(): String = s"$N_PAGES:${codeStamp()}"

  /** Idempotent: synthesize pages, tokenize to a blocks table, run the full
    * extraction to a docs table. Marker-file-gated across JVMs; regenerated
    * whenever the fingerprint (page count / code mtime) changes.
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"$DIR/_READY")
    val s = stamp()
    if (!markerFresh(marker, s)) {
      import spark.implicits._
      val pages = Corpus.pages(spark, N_PAGES).cache()
      pages.flatMap(Extract.toRows).toDF()
        .write.mode("overwrite").parquet(BLOCKS)
      Extract.extract(pages)
        .write.mode("overwrite").parquet(DOCS)
      // decoded-html artifact: the SHARED input for queries where DuckDB
      // independently re-implements a parse over the page markup (link
      // extraction) — DuckDB cannot run the charset decode, so the decode
      // (golden-pinned elsewhere) is materialized and both engines start
      // from the same string
      import org.apache.spark.sql.functions.col
      pages.toDF()
        .select(col("url"), graft.functions.exprs.decodeSniff(col("html")).as("html_str"))
        .write.mode("overwrite").parquet(HTML)
      pages.unpersist()
      writeMarker(marker, s)
    }
    done = true
  }

  def blocks(spark: SparkSession): org.apache.spark.sql.Dataset[BlockRow] = {
    import spark.implicits._
    ensure(spark)
    spark.read.parquet(BLOCKS).as[BlockRow]
  }

  def docs(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    ensure(spark)
    spark.read.parquet(DOCS)
  }

  def htmlStrs(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    ensure(spark)
    spark.read.parquet(HTML)
  }
}
