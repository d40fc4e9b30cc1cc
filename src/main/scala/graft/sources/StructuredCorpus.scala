package graft.sources

import graft.functions.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic corpus for the STRUCTURED-data extraction
  * operators (JSON-LD metadata, data tables): pages carrying
  * `<script type="application/ld+json">` blocks and `<table class="data">`
  * grids, plus decoys (a plain JS script, a class-less layout table) that a
  * correct extractor must ignore. Staged once per JVM as a (url, html_str)
  * parquet so the DuckDB oracle can independently re-extract from the SAME
  * strings (the exLinks pattern: the generated markup is regexp-tractable by
  * construction — single-line, double-quoted fixed-order attributes, no
  * entities inside values — while the Spark scanner stays a general lexical
  * parser).
  *
  * Generation is a pure function of (SEED, page index) via [[Rng]] — any
  * executor, any order, same corpus.
  */
object StructuredCorpus {

  val DIR = "/root/repo/target/oracle-structured"
  val HTML_PQ = s"read_parquet('$DIR/html/*.parquet')"
  val N_PAGES = 400L
  private val SEED = 77L

  private val WORDS = Vector(
    "alpha", "bravo", "carbon", "delta", "ember", "falcon", "gamma", "harbor",
    "indigo", "jasper", "kestrel", "lumen", "meadow", "nickel", "onyx",
    "pepper", "quartz", "russet", "saffron", "timber", "umber", "velvet",
    "walnut", "xenon", "yonder", "zephyr")

  private def word(i: Long, k: Int): String =
    WORDS(Rng.nextInt(SEED, 100L + k, i, WORDS.length))

  private def phrase(i: Long, k: Int, n: Int): String =
    (0 until n).map(j => word(i, k * 37 + j)).mkString(" ")

  /** One JSON-LD script: schema.org Article/NewsArticle with the fields a
    * news-extraction pass reads. Single-line, no quotes/entities in values.
    */
  private def ldScript(i: Long, s: Int): String = {
    val typ = if (Rng.nextInt(SEED, 200L + s, i, 2) == 0) "Article" else "NewsArticle"
    val m = 1 + Rng.nextInt(SEED, 210L + s, i, 12)
    val d = 1 + Rng.nextInt(SEED, 220L + s, i, 28)
    val wc = 80 + Rng.nextInt(SEED, 230L + s, i, 900)
    s"""<script type="application/ld+json">{"@context":"https://schema.org","@type":"$typ","headline":"${phrase(i, 300 + s, 3)}","datePublished":"2026-${f"$m%02d"}-${f"$d%02d"}","author":{"@type":"Person","name":"${phrase(i, 310 + s, 2)}"},"wordCount":$wc}</script>"""
  }

  /** One data table: header row of th cells + 1..4 body rows of td cells,
    * 2..4 columns, single-line.
    */
  private def dataTable(i: Long, t: Int): String = {
    val cols = 2 + Rng.nextInt(SEED, 400L + t, i, 3)
    val rows = 1 + Rng.nextInt(SEED, 410L + t, i, 4)
    val head = (0 until cols).map(c => s"<th>${word(i, 500 + t * 11 + c)}</th>").mkString
    val body = (0 until rows).map { r =>
      (0 until cols)
        .map(c => s"<td>${phrase(i, 600 + t * 31 + r * 7 + c, 1 + Rng.nextInt(SEED, 420L + t, i, 2))}</td>")
        .mkString("", "", "")
    }.map(r => s"<tr>$r</tr>").mkString
    s"""<table class="data"><tr>$head</tr>$body</table>"""
  }

  /** Canonical target: pages pair up (i and i+1 point at even i) — the
    * recrawl/tracking-param duplicate shape; every 7th page declares none.
    */
  def canonicalFor(i: Long): Option[String] =
    if (i % 7 == 0) None
    else Some(s"https://structured.example.org/a/${i - (i % 2)}")

  def htmlFor(i: Long): String = {
    val nLd = (i % 3).toInt
    val nTbl = ((i + 1) % 3).toInt
    val sb = new StringBuilder
    sb.append(s"<html><head><title>${phrase(i, 1, 3)}</title>")
    canonicalFor(i).foreach(c => sb.append(s"""<link rel="canonical" href="$c">"""))
    sb.append("</head><body>")
    sb.append(s"<p>${phrase(i, 2, 8)}.</p>")
    (0 until nLd).foreach(s => sb.append(ldScript(i, s)))
    // decoys: a plain JS script with JSON-looking content, a layout table
    if (i % 2 == 0)
      sb.append("""<script type="text/javascript">var ld = {"@type":"Decoy","headline":"nope"};</script>""")
    if (i % 3 == 0)
      sb.append(s"<table><tr><td>layout ${word(i, 7)}</td></tr></table>")
    (0 until nTbl).foreach(t => sb.append(dataTable(i, t)))
    sb.append(s"<p>${phrase(i, 3, 6)}.</p></body></html>")
    sb.toString
  }

  // ---- sitemaps -------------------------------------------------------------

  val SITEMAPS_PQ = s"read_parquet('$DIR/sitemaps/*.parquet')"
  val N_HOSTS = 40

  /** One single-line sitemap.xml per host: 5..30 `<url>` entries with loc /
    * lastmod / priority — the crawl-frontier seed document.
    */
  def sitemapFor(h: Long): String = {
    val n = 5 + Rng.nextInt(SEED, 900L, h, 26)
    val entries = (0 until n).map { k =>
      val m = 1 + Rng.nextInt(SEED, 910L + k, h, 12)
      val d = 1 + Rng.nextInt(SEED, 920L + k, h, 28)
      val pr = Rng.nextInt(SEED, 930L + k, h, 10)
      s"<url><loc>https://host$h.example.org/p/$k</loc>" +
        s"<lastmod>2026-${f"$m%02d"}-${f"$d%02d"}</lastmod>" +
        s"<priority>0.$pr</priority></url>"
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">$entries</urlset>"""
  }

  @volatile private var done = false

  /** Idempotent marker-gated staging (OracleCorpus protocol: page count +
    * code mtime key, so a generator change can never validate against a
    * stale materialization).
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val marker = new java.io.File(s"$DIR/_READY")
    val stamp = s"$N_PAGES:${OracleCorpus.codeStamp()}"
    if (!OracleCorpus.markerFresh(marker, stamp)) {
      import spark.implicits._
      spark.range(N_PAGES)
        .map(i => (s"https://structured.example.org/a/$i", htmlFor(i)))
        .toDF("url", "html_str")
        .write.mode("overwrite").parquet(s"$DIR/html")
      spark.range(N_HOSTS)
        .map(h => (s"host$h.example.org", sitemapFor(h)))
        .toDF("host", "sitemap_xml")
        .write.mode("overwrite").parquet(s"$DIR/sitemaps")
      OracleCorpus.writeMarker(marker, stamp)
    }
    done = true
  }

  def htmlStrs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/html")
  }

  def sitemaps(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/sitemaps")
  }
}
