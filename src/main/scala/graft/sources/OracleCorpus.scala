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
  val N_PAGES = 1500L

  val BLOCKS_PQ = s"read_parquet('$BLOCKS/*.parquet')"
  val DOCS_PQ = s"read_parquet('$DOCS/*.parquet')"

  @volatile private var done = false

  /** Idempotent: synthesize pages, tokenize to a blocks table, run the full
    * extraction to a docs table. Marker-file-gated across JVMs.
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"$DIR/_READY")
    if (!marker.exists()) {
      import spark.implicits._
      val pages = Corpus.pages(spark, N_PAGES).cache()
      pages.flatMap(Extract.toRows).toDF()
        .write.mode("overwrite").parquet(BLOCKS)
      Extract.extract(pages)
        .write.mode("overwrite").parquet(DOCS)
      pages.unpersist()
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath, Array.empty[Byte])
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
}
