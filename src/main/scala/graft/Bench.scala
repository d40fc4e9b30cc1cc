package graft

import graft.operators.Extract
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract; BASELINE.md protocol).
  *
  * Runs (a) the extraction pipeline over a synthetic corpus — the headline
  * docs/sec metric of BASELINE.json — and (b) a set of headline relational /
  * dedup / similarity queries at `SPARK_GRAFT_SF_DIR`. Prints ONE JSON line.
  *
  * Scaling protocol (two-cluster-size stand-in): run twice with
  * `SPARK_GRAFT_CPUS=8` and `=32` on the same input; efficiency =
  * throughput(32) / (4 × throughput(8)). See BASELINE.md.
  */
object Bench {

  /** Headline subset — big shuffly queries, one per operator family. */
  private val HEADLINE = Seq(
    "q1_agg", "q3_join", "q_window", "q_range_join", "q_distinct",
    "dd_exact", "dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash",
    "sim_knn", "dd_embed_cos", "ta_quality", "ta_tokens", "st_session"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the JIT + parquet readers once with a tiny run
    Extract.extract(Corpus.pages(spark, 200L)).foreach(_ => ())

    // headline extraction throughput
    var nDocs = 0L
    val tExtract = time {
      nDocs = Extract.extract(Corpus.pages(spark, nPages)).count()
    }
    val docsPerSec = nDocs / tExtract

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("extract") = tExtract
    HEADLINE.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        results(name) =
          try time { fn(spark, sfDir).count() }
          catch { case _: Throwable => -1.0 }
      }
    }

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"extract_pages":$nPages,"extract_docs_per_sec":$docsPerSec%.1f}""")
    spark.stop()
  }
}
