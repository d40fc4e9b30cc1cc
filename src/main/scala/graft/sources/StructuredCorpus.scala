package graft.sources

import graft.functions.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

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

  private val HREFLANGS = Vector("en", "de", "fr", "es", "ja")

  /** OpenGraph / Twitter-card head metas for page i. Field presence varies
    * by residue class so every precedence/absence branch has witnesses;
    * og:* use `property=`, twitter:* uses `name=` (the real-world split).
    */
  private def socialMetas(i: Long): String = {
    val sb = new StringBuilder
    if (i % 5 != 4)
      sb.append(s"""<meta property="og:title" content="${phrase(i, 700, 3)}">""")
    if (i % 3 != 2) {
      val t = if (Rng.nextInt(SEED, 710L, i, 2) == 0) "article" else "website"
      sb.append(s"""<meta property="og:type" content="$t">""")
    }
    if (i % 2 == 0)
      sb.append(s"""<meta property="og:image" content="https://img.example.org/$i.png">""")
    if (i % 7 != 6)
      sb.append(s"""<meta property="og:url" content="https://structured.example.org/a/$i">""")
    if (i % 4 != 1) {
      val c = if (Rng.nextInt(SEED, 720L, i, 2) == 0) "summary" else "summary_large_image"
      sb.append(s"""<meta name="twitter:card" content="$c">""")
    }
    // decoy: name= (not property=) og:title — a correct og scanner skips it
    if (i % 6 == 0)
      sb.append("""<meta name="og:title" content="NAMEDECOY">""")
    sb.toString
  }

  /** hreflang alternate links for page i (even pages declare 1..3 language
    * variants), plus a rel=alternate FEED decoy that carries no hreflang.
    */
  private def hreflangLinks(i: Long): String = {
    val sb = new StringBuilder
    if (i % 2 == 0) {
      val k = 1 + (i % 3).toInt
      (0 until k).foreach { j =>
        val l = HREFLANGS((j + Rng.nextInt(SEED, 730L + j, i, 2)) % HREFLANGS.length)
        sb.append(s"""<link rel="alternate" hreflang="$l" href="https://structured.example.org/$l/$i">""")
      }
    }
    if (i % 3 == 1)
      sb.append("""<link rel="alternate" type="application/rss+xml" href="/feed.xml">""")
    sb.toString
  }

  /** Crawl-control head surfaces: page-level robots meta (directive token
    * list), meta-refresh soft redirect, amphtml alternate. Presence varies by
    * residue class; a `name="robotto"` decoy must not read as robots.
    */
  private def crawlControl(i: Long): String = {
    val sb = new StringBuilder
    if (i % 3 != 1) {
      val toks = Vector(
        if (Rng.nextInt(SEED, 800L, i, 3) == 0) "noindex" else "index",
        if (Rng.nextInt(SEED, 810L, i, 2) == 0) "nofollow" else "follow") ++
        (if (Rng.nextInt(SEED, 820L, i, 4) == 0) Vector("noarchive") else Vector())
      sb.append(s"""<meta name="robots" content="${toks.mkString(",")}">""")
    }
    if (i % 11 == 3)
      sb.append("""<meta name="robotto" content="noindex">""")
    if (i % 9 == 2)
      sb.append(s"""<meta http-equiv="refresh" content="${i % 7};url=https://structured.example.org/moved/$i">""")
    if (i % 5 == 3)
      sb.append(s"""<link rel="amphtml" href="https://structured-amp.example.org/a/$i">""")
    sb.toString
  }

  /** article:published_time head meta (every 4th page). */
  private def publishedMeta(i: Long): String =
    if (i % 4 == 0) {
      val m = 1 + Rng.nextInt(SEED, 740L, i, 12)
      val d = 1 + Rng.nextInt(SEED, 750L, i, 28)
      s"""<meta property="article:published_time" content="2025-${f"$m%02d"}-${f"$d%02d"}T08:30:00Z">"""
    } else ""

  /** Visible `<time datetime=…>` body element (odd pages). */
  def timeTagFor(i: Long): String =
    if (i % 2 == 1) {
      val m = 1 + Rng.nextInt(SEED, 760L, i, 12)
      val d = 1 + Rng.nextInt(SEED, 770L, i, 28)
      s"""<time datetime="2024-${f"$m%02d"}-${f"$d%02d"}">posted ${word(i, 78)}</time>"""
    } else ""

  /** Image markup for page i: alternating figure-wrapped (src/alt/dims +
    * figcaption) and bare `<img>` (src/alt only, alt sometimes empty) — the
    * two caption-harvest shapes; srcs unique per (page, slot).
    */
  def imagesFor(i: Long): String = {
    val n = (i % 4).toInt
    (0 until n).map { k =>
      val src = s"https://img.example.org/i/$i/$k.jpg"
      if (k % 2 == 0) {
        val w = 160 + 16 * Rng.nextInt(SEED, 830L + k, i, 40)
        val h = 90 + 9 * Rng.nextInt(SEED, 840L + k, i, 40)
        s"""<figure><img src="$src" alt="${phrase(i, 850 + k, 3)}" width="$w" height="$h"><figcaption>${phrase(i, 860 + k, 5)}</figcaption></figure>"""
      } else {
        val alt = if (Rng.nextInt(SEED, 870L + k, i, 3) == 0) "" else phrase(i, 880 + k, 2)
        s"""<img src="$src" alt="$alt">"""
      }
    }.mkString
  }

  /** Fenced code blocks for page i: `<pre><code class="language-x">` with
    * newline-preserved multi-line bodies (the whitespace-preservation case
    * the running-text extractor deliberately destroys), alternating with a
    * class-less `<pre><code>` (lang unknown). Bodies carry planted `&amp;` /
    * `&lt;` entities on some residues (decode pinned) and NEVER a raw '<'
    * or '&' (oracle-equivalence precondition). Decoys: a bare `<pre>` with
    * no code child (ASCII art — not a code block) and an inline `<code>`
    * span outside any pre (not a BLOCK).
    */
  private val CODELANGS = Vector("python", "scala", "sql")

  def codeFor(i: Long): String = {
    val n = ((i + 2) % 3).toInt
    val sb = new StringBuilder
    (0 until n).foreach { k =>
      val body = (0 until (2 + Rng.nextInt(SEED, 1000L + k, i, 3))).map { r =>
        val ind = if (r % 2 == 1) "  " else ""
        val op = Rng.nextInt(SEED, 1010L + k * 7 + r, i, 3) match {
          case 0 => s"x$r = ${word(i, 1020 + k * 11 + r)} &amp; mask"
          case 1 => s"if n$r &lt; ${Rng.nextInt(SEED, 1030L + k, i, 99)}: emit(${word(i, 1040 + k * 13 + r)})"
          case _ => s"val y$r = f(${word(i, 1050 + k * 17 + r)}, $r)"
        }
        ind + op
      }.mkString("\n")
      if (Rng.nextInt(SEED, 1060L + k, i, 4) == 3)
        sb.append(s"<pre><code>$body</code></pre>")
      else {
        val lang = CODELANGS(Rng.nextInt(SEED, 1070L + k, i, CODELANGS.length))
        sb.append(s"""<pre><code class="language-$lang">$body</code></pre>""")
      }
    }
    if (i % 9 == 4) sb.append("<pre>  +--+\n  |::|\n  +--+</pre>")
    if (i % 7 == 2) sb.append(s"<p>call <code>run(${word(i, 1080)})</code> inline.</p>")
    sb.toString
  }

  /** Bullet/numbered lists for page i: `(i % 3)` lists alternating ul/ol,
    * 2..5 items each; items are phrases with occasional nested `<b>` markup
    * (tag-strip pinned) and planted `&amp;` entities. List lookalikes never
    * appear inside scripts (oracle precondition).
    */
  def listsFor(i: Long): String = {
    val n = (i % 3).toInt
    (0 until n).map { l =>
      val kind = if ((i + l) % 2 == 0) "ul" else "ol"
      val items = (0 until (2 + Rng.nextInt(SEED, 1100L + l, i, 4))).map { k =>
        val base = phrase(i, 1110 + l * 19 + k, 2 + Rng.nextInt(SEED, 1120L + l, i, 2))
        val t = Rng.nextInt(SEED, 1130L + l * 7 + k, i, 4) match {
          case 0 => s"$base <b>${word(i, 1140 + l * 23 + k)}</b> tail"
          case 1 => s"$base &amp; more"
          case _ => base
        }
        s"<li>$t</li>"
      }.mkString
      s"<$kind>$items</$kind>"
    }.mkString
  }

  /** License declaration for page i: head `<link rel="license">` (residue 1),
    * body `<a rel="nofollow license">` (residue 2 — rel as a token LIST),
    * CC0 public-domain link (residue 0 of 8), none otherwise. Decoy:
    * `rel="licenses"` is NOT the license token.
    */
  def licenseFor(i: Long): (String, String) = {
    val code = Vector("by", "by-sa", "by-nc", "by-nc-sa")(
      Rng.nextInt(SEED, 1200L, i, 4))
    val head = new StringBuilder
    val body = new StringBuilder
    if (i % 8 == 0)
      head.append("""<link rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">""")
    else if (i % 4 == 1)
      head.append(s"""<link rel="license" href="https://creativecommons.org/licenses/$code/4.0/">""")
    else if (i % 4 == 2)
      body.append(s"""<p><a rel="nofollow license" href="https://creativecommons.org/licenses/$code/4.0/">cc $code</a></p>""")
    if (i % 12 == 7)
      head.append("""<link rel="licenses" href="https://example.org/not-a-license">""")
    (head.toString, body.toString)
  }

  /** Pagination rel=next / rel=prev head links: pages with `i % 10 < 3`
    * form 3-part chains (head = i - i%10); part 0/1 declare next, part 1/2
    * declare prev. Every 40th page (part 0) declares a BROKEN next pointer
    * (target not in the corpus) — the chain walk must stop there and the
    * orphaned parts 1..2 become their own chain (pinned).
    */
  def paginateFor(i: Long): String = {
    val p = i % 10
    if (p >= 3) ""
    else {
      val sb = new StringBuilder
      if (p < 2) {
        val nxt =
          if (i % 40 == 20) s"https://structured.example.org/a/x$i"
          else s"https://structured.example.org/a/${i + 1}"
        sb.append(s"""<link rel="next" href="$nxt">""")
      }
      if (p > 0)
        sb.append(s"""<link rel="prev" href="https://structured.example.org/a/${i - 1}">""")
      sb.toString
    }
  }

  /** Blockquotes for page i (residue 2 of 3): 1..2 quotes alternating a
    * `cite=`-attributed form with a bare one; bodies carry nested `<em>`
    * markup (strip pinned) and planted `&amp;` entities, never raw '<'/'&'.
    */
  def quotesFor(i: Long): String =
    if (i % 3 != 2) ""
    else {
      val n = 1 + (i % 2).toInt
      (0 until n).map { k =>
        val base = phrase(i, 1300 + k * 13, 4 + Rng.nextInt(SEED, 1310L + k, i, 4))
        val body = Rng.nextInt(SEED, 1320L + k, i, 3) match {
          case 0 => s"$base <em>${word(i, 1330 + k)}</em> coda"
          case 1 => s"$base &amp; after"
          case _ => base
        }
        if (k % 2 == 0)
          s"""<blockquote cite="https://quotes.example.org/q/$i/$k">$body</blockquote>"""
        else s"<blockquote>$body</blockquote>"
      }.mkString
    }

  /** Definition lists for page i (residue 3 of 4): 1..2 `<dl>`s of 2..4
    * strictly-alternating dt/dd pairs (one dd per dt — the oracle pairing
    * precondition); dd bodies carry nested `<i>` markup and `&amp;`.
    */
  def dlFor(i: Long): String =
    if (i % 4 != 3) ""
    else {
      val n = 1 + (i % 2).toInt
      (0 until n).map { d =>
        val pairs = (0 until (2 + Rng.nextInt(SEED, 1400L + d, i, 3))).map { k =>
          val term = phrase(i, 1410 + d * 29 + k, 1 + Rng.nextInt(SEED, 1420L + d, i, 2))
          val defn = Rng.nextInt(SEED, 1430L + d * 7 + k, i, 3) match {
            case 0 => s"${phrase(i, 1440 + d * 31 + k, 3)} <i>${word(i, 1450 + d + k)}</i> note"
            case 1 => s"${phrase(i, 1460 + d * 37 + k, 4)} &amp; rest"
            case _ => phrase(i, 1470 + d * 41 + k, 3 + Rng.nextInt(SEED, 1480L + d, i, 3))
          }
          s"<dt>$term</dt><dd>$defn</dd>"
        }.mkString
        s"<dl>$pairs</dl>"
      }.mkString
    }

  /** schema.org FAQPage JSON-LD for page i (residue 2 of 5): 2..4
    * Question/acceptedAnswer entries; every 10th FAQ page plants a
    * non-Question entry MID-LIST (the declared-array-index pin: question
    * positions must skip over it, not renumber). Values single-line, no
    * quotes/entities, and never the `datePublished` key (exPubdate's
    * channel discriminator).
    */
  def faqScript(i: Long): String =
    if (i % 5 != 2) ""
    else {
      val n = 2 + Rng.nextInt(SEED, 1500L, i, 3)
      val qs = (0 until n).map { k =>
        val q = s"how does ${phrase(i, 1510 + k * 17, 2)} work"
        val a = phrase(i, 1520 + k * 19, 5 + Rng.nextInt(SEED, 1530L + k, i, 5))
        s"""{"@type":"Question","name":"$q","acceptedAnswer":{"@type":"Answer","text":"$a"}}"""
      }
      val entries =
        if (i % 10 == 7)
          (qs.take(1) ++ Vector(s"""{"@type":"Tip","name":"${phrase(i, 1540, 2)}","acceptedAnswer":{"@type":"Answer","text":"decoy"}}""") ++ qs.drop(1)).mkString(",")
        else qs.mkString(",")
      s"""<script type="application/ld+json">{"@context":"https://schema.org","@type":"FAQPage","mainEntity":[$entries]}</script>"""
    }

  /** schema.org BreadcrumbList JSON-LD (every 3rd page, 2..4 levels). */
  private def breadcrumbScript(i: Long): String =
    if (i % 3 == 0) {
      val depth = 2 + Rng.nextInt(SEED, 780L, i, 3)
      val items = (1 to depth).map { p =>
        s"""{"@type":"ListItem","position":$p,"name":"${phrase(i, 790 + p, 2)}","item":"https://structured.example.org/c/$i/$p"}"""
      }.mkString(",")
      s"""<script type="application/ld+json">{"@context":"https://schema.org","@type":"BreadcrumbList","itemListElement":[$items]}</script>"""
    } else ""

  def htmlFor(i: Long): String = {
    val nLd = (i % 3).toInt
    val nTbl = ((i + 1) % 3).toInt
    val (licHead, licBody) = licenseFor(i)
    val sb = new StringBuilder
    sb.append(s"<html><head><title>${phrase(i, 1, 3)}</title>")
    canonicalFor(i).foreach(c => sb.append(s"""<link rel="canonical" href="$c">"""))
    sb.append(socialMetas(i))
    sb.append(hreflangLinks(i))
    sb.append(publishedMeta(i))
    sb.append(crawlControl(i))
    sb.append(licHead)
    sb.append(paginateFor(i))
    sb.append("</head><body>")
    sb.append(licBody)
    // decoys: og meta + hreflang link in BODY — both surfaces are head-scoped
    if (i % 8 == 5) {
      sb.append("""<meta property="og:title" content="BODYDECOY">""")
      sb.append("""<link rel="alternate" hreflang="zz" href="https://structured.example.org/zz/decoy">""")
    }
    sb.append(s"<p>${phrase(i, 2, 8)}.</p>")
    sb.append(codeFor(i))
    sb.append(listsFor(i))
    sb.append(quotesFor(i))
    sb.append(dlFor(i))
    sb.append(timeTagFor(i))
    sb.append(imagesFor(i))
    sb.append(breadcrumbScript(i))
    sb.append(faqScript(i))
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

  // ---- RSS feeds --------------------------------------------------------------

  val FEEDS_PQ = s"read_parquet('$DIR/feeds/*.parquet')"

  /** One single-line RSS 2.0 feed per host: channel title + 3..12 `<item>`
    * entries with title / link / pubDate / guid — the news-frontier seed the
    * sitemap doesn't carry (recency-ordered, per-article timestamps).
    */
  def feedFor(h: Long): String = {
    val n = 3 + Rng.nextInt(SEED, 940L, h, 10)
    val items = (0 until n).map { k =>
      val m = 1 + Rng.nextInt(SEED, 950L + k, h, 12)
      val d = 1 + Rng.nextInt(SEED, 960L + k, h, 28)
      s"<item><title>${phrase(h, 970 + k, 4)}</title>" +
        s"<link>https://host$h.example.org/news/$k</link>" +
        s"<pubDate>2026-${f"$m%02d"}-${f"$d%02d"}</pubDate>" +
        s"<guid>urn:host$h:item:$k</guid></item>"
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?><rss version="2.0"><channel><title>${phrase(h, 980, 3)} feed</title><link>https://host$h.example.org/</link>$items</channel></rss>"""
  }

  // ---- recrawl snapshots --------------------------------------------------------

  val RECRAWLS_PQ = s"read_parquet('$DIR/recrawls/*.parquet')"

  /** Recrawl snapshots for page i: 1..3 crawls of the same url; between
    * consecutive crawls the body either changes (a fresh phrase) or repeats
    * verbatim, decided per (i, crawl) residue — the CDX-style revisit table
    * a recrawl scheduler diffs. Pure function of (SEED, i, crawl).
    */
  def recrawlRows(i: Long): Seq[(String, Long, String)] = {
    val url = s"https://structured.example.org/a/$i"
    val nSnap = 1 + (i % 3).toInt
    var c = 0
    (0 until nSnap).map { j =>
      if (j > 0 && Rng.nextInt(SEED, 2100L + j, i, 2) == 0) c += 1
      (url, j.toLong, phrase(i, 2000 + c * 13, 6))
    }
  }

  // ---- per-host document table (template-line discovery) -----------------------

  val HOSTDOCS_PQ = s"read_parquet('$DIR/hostdocs/*.parquet')"
  val N_DHOSTS = 24

  /** Page counts per doc-host: 2..10 — hosts below the 4-page min-support
    * floor are template-discovery negatives BY CONSTRUCTION.
    */
  def dhostPages(h: Long): Int = 2 + (h % 9).toInt

  /** Text of page `i` of doc-host `h`, as newline-joined lines:
    *
    *   - 1..3 TEMPLATE lines keyed by `h` alone — identical on every page of
    *     the host (the nav/footer chrome a per-host boilerplate pass finds);
    *   - a MAJORITY line planted on floor(p/2)+1 pages — strictly more than
    *     half, must be discovered;
    *   - a HALF line planted on exactly floor(p/2) pages — at or below half,
    *     must NOT be discovered (the threshold boundary witness);
    *   - 3..6 unique lines carrying a `p<i>` literal token — unique across
    *     pages by construction, no birthday-collision reasoning needed.
    */
  def hostdocText(h: Long, i: Int): String = {
    val p = dhostPages(h)
    val lines = ArrayBuffer.empty[String]
    val nTpl = 1 + (h % 3).toInt
    (0 until nTpl).foreach(k => lines += s"site$h ${phrase(h, 1100 + k, 4)}")
    if (i <= p / 2) lines += s"maj$h ${phrase(h, 1200, 3)}" // floor(p/2)+1 pages
    if (i < p / 2) lines += s"half$h ${phrase(h, 1210, 3)}" // floor(p/2) pages
    val nU = 3 + (i % 4)
    (0 until nU).foreach(j => lines += s"p$i u$j ${phrase(h * 31 + i, 1300 + j, 4)}")
    lines.mkString("\n")
  }

  def hostdocRows(h: Long): Seq[(String, String, String)] = {
    val host = s"dhost$h.example.org"
    (0 until dhostPages(h)).map(i =>
      (s"https://$host/d/$i", host, hostdocText(h, i)))
  }

  // ---- link-rich pages (outlink profile) ----------------------------------------

  val LINKPAGES_PQ = s"read_parquet('$DIR/linkpages/*.parquet')"
  val N_LINKPAGES = 60L

  /** One link-rich page per index: 4 relative nav anchors, 0..4 absolute
    * external anchors over a 9-host external universe, every 4th page an
    * empty-anchor-text deep link. Oracle-equivalence shape as [[exLinks]]:
    * every anchor is `<a href="...">plain text</a>`, non-empty double-quoted
    * href, no entities/markup in anchor text, never inside comments/rawtext.
    */
  def linkpageHtml(i: Long): String = {
    val sb = new StringBuilder
    sb.append(s"<html><head><title>${phrase(i, 1400, 3)}</title></head><body><ul>")
    (0 until 4).foreach(k =>
      sb.append(s"""<li><a href="/cat$k">${word(i, 1410 + k)} ${word(i, 1420 + k)}</a></li>"""))
    sb.append("</ul>")
    val e = (i % 5).toInt
    (0 until e).foreach { j =>
      val eh = (i * 7 + j) % 9
      sb.append(s"""<p>see <a href="https://ext$eh.example.net/x/$j">${phrase(i, 1430 + j, 2)}</a>.</p>""")
    }
    if (i % 4 == 0) sb.append(s"""<a href="/deep$i"></a>""")
    sb.append(s"<p>${phrase(i, 1440, 6)}.</p></body></html>")
    sb.toString
  }

  // ---- crawl-log urls (template mining / trap detection) ------------------------

  val CRAWLLOG_PQ = s"read_parquet('$DIR/crawllog/*.parquet')"
  val N_CHOSTS = 18

  private def hex16(h: Long, k: Int): String = {
    val sb = new StringBuilder
    (0 until 16).foreach(j =>
      sb.append("0123456789abcdef".charAt(Rng.nextInt(SEED, 1500L + k * 17 + j, h, 16))))
    sb.toString
  }

  /** Crawl-log urls for host `h`: article pages `/a/{k}` (odd hosts carry
    * `?id=&ref=` tracking params — the param-canonicalization witness), tag
    * pages `/tag/<word>` (short literal segments — stay distinct templates),
    * session urls `/s/<16-hex>` (≥13-char segment → `{s}`), and for every
    * 3rd host a calendar TRAP `/cal/2026/{m}/{d}` whose url count crosses
    * the ≥50 trap threshold.
    */
  def crawllogRows(h: Long): Seq[(String, String)] = {
    val host = s"chost$h.example.org"
    val base = s"https://$host"
    val out = ArrayBuffer.empty[(String, String)]
    val nA = 5 + ((h * 3) % 28).toInt
    (0 until nA).foreach { k =>
      val u =
        if (h % 2 == 1) s"$base/a/$k?id=$k&ref=${word(h, 1600 + k)}"
        else s"$base/a/$k"
      out += ((host, u))
    }
    val nT = 3 + (h % 6).toInt
    (0 until nT).foreach(k => out += ((host, s"$base/tag/${word(h, 1700 + k)}")))
    val nS = (h % 4).toInt
    (0 until nS).foreach(k => out += ((host, s"$base/s/${hex16(h, k)}")))
    if (h % 3 == 0) {
      val days = 10 + (h % 15).toInt
      (1 to 12).foreach(m => (1 to days).foreach(d =>
        out += ((host, s"$base/cal/2026/$m/$d"))))
    }
    out.toSeq.distinct
  }

  // ---- dirty documents (unicode scrub) -------------------------------------------

  val DIRTYDOCS_PQ = s"read_parquet('$DIR/dirtydocs/*.parquet')"
  val N_DIRTY = 120L

  /** Text with planted web-text artifacts, all BMP (Spark UTF-16 length ==
    * DuckDB codepoint length): soft hyphens inside a word, zero-width
    * chars (ZWSP/ZWNJ/BOM cycling), NBSPs, control chars (BEL/SOH), and for
    * every 5th doc CRLF + lone-CR line breaks.
    */
  def dirtyText(i: Long): String = {
    val sb = new StringBuilder
    sb.append(phrase(i, 1800, 5))
    val soft = (i % 4).toInt
    if (soft > 0) {
      sb.append(" hy")
      (0 until soft).foreach(_ => sb.append("\u00ADphen"))
      sb.append("ation")
    }
    val zw = ((i + 1) % 3).toInt
    (0 until zw).foreach { j =>
      sb.append(" zw")
      sb.append(Array('\u200B', '\u200C', '\uFEFF')((j + i.toInt) % 3))
      sb.append("join")
    }
    val nb = (i % 3).toInt
    (0 until nb).foreach(_ => sb.append("\u00A0nb"))
    val ct = ((i + 2) % 3).toInt
    (0 until ct).foreach(j => sb.append(Array('\u0007', '\u0001')(j % 2)))
    if (i % 5 == 0) sb.append("\r\nline two\rline three")
    sb.append(" ").append(phrase(i, 1810, 4))
    sb.toString
  }

  // ---- mixed-language documents (language-span segmentation) -------------------

  val MIXEDDOCS_PQ = s"read_parquet('$DIR/mixeddocs/*.parquet')"
  val N_MIXED = 80L

  /** Pairwise-disjoint per-language vocabularies, also disjoint from the
    * base [[WORDS]] salad: every generated line is majority-vocab of its
    * planted language, so argmax marker scoring recovers the label exactly
    * in both engines — the segmentation operator is tested on its real
    * classify-then-sessionize plan, not on a lookup.
    */
  val SEG_LANGS: Seq[(String, Vector[String])] = Seq(
    "de" -> Vector("zug", "berg", "wald", "stadt", "fluss", "nacht", "baum", "wolke"),
    "en" -> Vector("river", "stone", "cloud", "field", "night", "road", "grass", "hill"),
    "fr" -> Vector("fleuve", "pierre", "nuage", "champ", "nuit", "route", "herbe", "mont"))

  /** Planted language index of each line of mixed doc `i`: runs of 1..3
    * consecutive same-language lines with FORCED switches between runs (a
    * span boundary is always a real language change); every 10th doc is
    * single-language end to end — the one-span witness.
    */
  def mixedLineLangs(i: Long): Seq[Int] = {
    val n = 4 + (i % 9).toInt
    if (i % 10 == 0) Seq.fill(n)(Rng.nextInt(SEED, 2200L, i, SEG_LANGS.length))
    else {
      val out = ArrayBuffer.empty[Int]
      var cur = Rng.nextInt(SEED, 2200L, i, SEG_LANGS.length)
      var r = 0
      while (out.length < n) {
        val run = 1 + Rng.nextInt(SEED, 2210L + r, i, 3)
        (0 until math.min(run, n - out.length)).foreach(_ => out += cur)
        cur = (cur + 1 + Rng.nextInt(SEED, 2220L + r, i, SEG_LANGS.length - 1)) %
          SEG_LANGS.length
        r += 1
      }
      out.toSeq
    }
  }

  /** Line `j` of doc `i` in language `langIdx`: 3..5 own-vocab words; every
    * 4th line carries ONE decoy word of the next language — the classifier
    * must win by majority (≥3 own vs 1 decoy), not by mere presence.
    */
  def mixedLine(i: Long, j: Int, langIdx: Int): String = {
    val vocab = SEG_LANGS(langIdx)._2
    val n = 3 + Rng.nextInt(SEED, 2230L + j, i, 3)
    val own = (0 until n).map(k =>
      vocab(Rng.nextInt(SEED, 2240L + j * 7 + k, i, vocab.length)))
    val decoy =
      if (j % 4 == 3) {
        val dv = SEG_LANGS((langIdx + 1) % SEG_LANGS.length)._2
        Seq(dv(Rng.nextInt(SEED, 2250L + j, i, dv.length)))
      } else Seq.empty
    (own ++ decoy).mkString(" ")
  }

  def mixedText(i: Long): String =
    mixedLineLangs(i).zipWithIndex
      .map { case (l, j) => mixedLine(i, j, l) }
      .mkString("\n")

  // ---- redirect edges (chain resolution) ----------------------------------------

  val REDIRECTS_PQ = s"read_parquet('$DIR/redirects/*.parquet')"
  val N_CHAINS = 40
  val N_CYCLES = 6

  /** Redirect edge list with planted topology every resolver case needs a
    * witness for: linear chains of length 1..8 (crosses several doubling
    * rounds), pure cycles of length 2..4 (must flag, never loop), and a
    * tail-into-cycle chain per cycle (unresolvable srcs that are NOT cycle
    * members themselves). Edges are FUNCTIONAL — one outgoing edge per src,
    * the http-redirect invariant.
    */
  def redirectEdges(): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    (0 until N_CHAINS).foreach { c =>
      val len = 1 + c % 8
      (0 until len).foreach(k =>
        out += ((s"https://redir.example.org/c$c/$k",
          s"https://redir.example.org/c$c/${k + 1}")))
    }
    (0 until N_CYCLES).foreach { y =>
      val len = 2 + y % 3
      (0 until len).foreach(k =>
        out += ((s"https://redir.example.org/y$y/$k",
          s"https://redir.example.org/y$y/${(k + 1) % len}")))
      out += ((s"https://redir.example.org/t$y/0",
        s"https://redir.example.org/y$y/0"))
    }
    out.toSeq
  }

  // ---- host link graph (graph analytics: BFS depth, HITS, co-citation) ----------

  val HOSTEDGES_PQ = s"read_parquet('$DIR/hostedges/*.parquet')"
  val N_GHOSTS = 64

  /** Directed host-graph edge list with a witness for every graph-analytics
    * case: a 10-deep chain (BFS layer structure), quadratic-ish skip edges
    * among the first 30 hosts (mixing + cycles the BFS must not re-expand),
    * a co-citation block (12 sources all linking h50+h51, the even half also
    * h52, plus mod-4 fan-out to h42..h45), one mega-hub h49 whose out-degree
    * exceeds the co-citation cap (must be excluded from pairing, the df-cap
    * rule), and a 3-cycle island unreachable from the seed set. Edges are
    * distinct; no self-loops by construction.
    */
  def hostEdges(): Seq[(String, String)] = {
    def h(i: Int) = s"h$i.example.org"
    val out = ArrayBuffer.empty[(String, String)]
    (0 until 9).foreach(i => out += ((h(i), h(i + 1))))
    (0 until 30).foreach(i => out += ((h(i), h((3 * i + 7) % 30))))
    (30 to 41).foreach { i =>
      out += ((h(i), h(50)))
      out += ((h(i), h(51)))
      if (i % 2 == 0) out += ((h(i), h(52)))
      out += ((h(i), h(42 + i % 4)))
    }
    (50 to 59).foreach(j => out += ((h(49), h(j))))
    out += ((h(60), h(61)))
    out += ((h(61), h(62)))
    out += ((h(62), h(60)))
    out.distinct.toSeq
  }

  // ---- raw host names (registrable-domain extraction) ---------------------------

  val RAWHOSTS_PQ = s"read_parquet('$DIR/rawhosts/*.parquet')"

  /** Host names with a witness per public-suffix rule class: two-label
    * suffixes (co.uk, org.uk, com.au, co.jp), the PRIVATE-registry case
    * (github.io — user sites are registrable one label below it), deep
    * subdomain chains, hosts that ARE a bare suffix (unregistrable), and
    * unknown TLDs (out of policy → unregistrable).
    */
  def rawHosts(): Seq[String] = Seq(
    "www.example.co.uk", "example.co.uk", "co.uk",
    "news.bbc.org.uk",
    "shop.example.com.au",
    "user.github.io", "proj.user.github.io", "github.io",
    "a.b.c.example.com", "example.com", "com",
    "sub.example.org", "example.net",
    "example.xyz", "weird.internal",
    "blog.example.co.jp",
    "example.io", "deep.sub.example.io",
    "edu", "school.example.edu",
    "uk", "au.com"
  ) ++ (0 until 30).map(i => s"host$i.bulk${i % 5}.example.com")

  // ---- crawled-url log (frontier backlog vs the sitemap) ------------------------

  val CRAWLED_PQ = s"read_parquet('$DIR/crawled/*.parquet')"

  /** Crawled-url log over the SITEMAP hosts' universe: per host, every
    * sitemap loc except the k % 3 == 0 entries (the planted backlog), plus
    * off-sitemap urls discovered via links/feeds (which must never make a
    * backlog count negative).
    */
  def crawledUrls(): Seq[(String, String)] =
    (0 until N_HOSTS).flatMap { h =>
      val host = s"host$h.example.org"
      val n = 5 + Rng.nextInt(SEED, 900L, h.toLong, 26)
      val inMap = (0 until n).filter(_ % 3 != 0)
        .map(k => (host, s"https://$host/p/$k"))
      val extra = Seq((host, s"https://$host/news/0")) ++
        (if (h % 4 == 0) Seq((host, s"https://$host/extra/$h")) else Nil)
      inMap ++ extra
    }

  // ---- language-variant urls (URL-pattern bitext alignment) ---------------------

  val L10NURLS_PQ = s"read_parquet('$DIR/l10nurls/*.parquet')"

  /** Url lists with language path segments: every doc has an /en/ variant,
    * deterministic subsets add /fr/ and /de/ (one /es/ witness makes a
    * four-language clique), plus the cases the aligner must NOT pair — an
    * orphan translation with no counterpart, a lang-free static path, and a
    * decoy segment (`/env/`) that merely starts with a lang code. Exactly
    * one lang segment per url by construction (the documented precondition
    * that makes Spark's replace-all == DuckDB's replace-first).
    */
  def l10nUrls(): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    (0 until 10).foreach { s =>
      (0 until 20).foreach { d =>
        out += s"https://site$s.example.org/en/doc$d"
        if ((s + d) % 2 == 0) out += s"https://site$s.example.org/fr/doc$d"
        if ((s + d) % 3 == 0) out += s"https://site$s.example.org/de/doc$d"
        out += s"https://site$s.example.org/env/doc$d"
      }
      out += s"https://site$s.example.org/fr/only$s"
      out += s"https://site$s.example.org/static/page$s"
    }
    out += "https://site0.example.org/es/doc0"
    out.toSeq
  }

  // ---- mixed-kind alias edges (canonical-URL mapping) ---------------------------

  val CANONEDGES_PQ = s"read_parquet('$DIR/canonedges/*.parquet')"

  /** Alias edges of all three kinds (http redirect / rel=canonical / amp)
    * with the cases the canonicalizer must witness: mixed-kind chains of
    * length 1..6, LOWER-priority conflicting declarations that must lose
    * the per-url election (decoy targets — if one ever wins, resolution
    * diverges observably), mixed-kind cycles, and tails feeding cycles.
    */
  def canonEdges(): Seq[(String, String, String)] = {
    val out = ArrayBuffer.empty[(String, String, String)]
    val kinds = Vector("http", "canonical", "amp")
    def u(c: Int, k: Int) = s"https://site$c.canon.example.org/p/$k"
    (0 until 30).foreach { c =>
      val len = 1 + c % 6
      (0 until len).foreach { k =>
        out += ((u(c, k), kinds((c + k) % 3), u(c, k + 1)))
        if (k % 4 == 0 && (c + k) % 3 < 2)
          out += ((u(c, k), "amp", s"https://decoy.example.org/d$c-$k"))
      }
    }
    (0 until 4).foreach { y =>
      val len = 2 + y % 2
      def cu(k: Int) = s"https://cyc$y.canon.example.org/c/$k"
      (0 until len).foreach(k =>
        out += ((cu(k), kinds((y + k) % 3), cu((k + 1) % len))))
      out += ((s"https://tail$y.canon.example.org/t/0", "canonical", cu(0)))
    }
    out.toSeq
  }

  // ---- IDN hosts (homoglyph spoof detection) ------------------------------------

  val IDNHOSTS_PQ = s"read_parquet('$DIR/idnhosts/*.parquet')"

  /** Host list mixing pure-ASCII legit hosts, Cyrillic-confusable spoofs of
    * half of them (one confusable char class swapped per spoof — skeleton
    * collides with exactly its source), clean unrelated hosts (must not
    * appear in the spoof report), and one confusable-bearing ORPHAN whose
    * skeleton matches no legit host (flagged, attribution empty).
    */
  def idnHosts(): Seq[String] = {
    val cyr = Map('a' -> 'а', 'e' -> 'е', 'o' -> 'о',
      'p' -> 'р', 'c' -> 'с', 'x' -> 'х')
    val legit = (0 until 12).map(i => s"brand$i.example.com") ++
      Seq("paypal.example.org", "secure-shop.example.net")
    val spoofs = legit.zipWithIndex.collect { case (h, i) if i % 2 == 0 =>
      val target = "aeopcx".charAt(i % 6)
      h.replace(target, cyr(target))
    }.filter(s => !legit.contains(s))
    val clean = (0 until 6).map(i => s"other$i.example.net")
    (legit ++ spoofs ++ clean :+ "weirdо.example.xyz").distinct
  }

  // ---- news docs (capitalized-span entity mining) -------------------------------

  val NEWSDOCS_PQ = s"read_parquet('$DIR/newsdocs/*.parquet')"
  val N_NEWS = 300L

  private def cap(w: String): String = w.capitalize

  /** Entity pool for `ta_ner`: 26 multi-word proper names, pairwise distinct
    * because each k owns a unique FIRST word (gcd trick unnecessary — direct
    * index). Filler text is all-lowercase from the same vocabulary, so a
    * capitalized RUN of ≥2 words appears only where the generator planted
    * one (or a stopword-led decoy — see [[newsText]]).
    */
  def newsEntity(k: Int): String = {
    val base = cap(WORDS(k)) + " " + cap(WORDS((k * 5 + 3) % WORDS.length))
    if (k % 3 == 0) base + " " + cap(WORDS((k * 11 + 7) % WORDS.length))
    else base
  }

  /** Sentence-cased prose with planted features, one per sentence at most,
    * never sentence-initial (a mention adjacent to the sentence-start
    * capital would EXTEND the run and change the entity string):
    * r<4 → a bare entity mention; r=4 → "The <entity>" (must surface as the
    * STRIPPED entity); r=5 → "The <Word>" decoy (2-cap run that strips to a
    * single word — must never surface). Sentence starts are single capitals
    * and can never match the ≥2-run regex.
    */
  def newsText(i: Long): String = {
    val sents = 4 + Rng.nextInt(SEED, 600L, i, 4)
    val sb = new StringBuilder
    var s = 0
    while (s < sents) {
      val words = 6 + Rng.nextInt(SEED, 610L + s, i, 6)
      sb.append(cap(word(i, 620 + s * 31)))
      var w = 1
      while (w < words) { sb.append(' ').append(word(i, 620 + s * 31 + w)); w += 1 }
      val r = Rng.nextInt(SEED, 700L + s, i, 10)
      if (r < 4)
        sb.append(' ').append(newsEntity(Rng.nextInt(SEED, 710L + s, i, 26)))
      else if (r == 4)
        sb.append(" The ").append(newsEntity(Rng.nextInt(SEED, 720L + s, i, 26)))
      else if (r == 5)
        sb.append(" The ").append(cap(word(i, 730 + s)))
      sb.append(". ")
      s += 1
    }
    sb.toString.trim
  }

  // ---- typo docs (SymSpell vocab canonicalization) ------------------------------

  val TYPODOCS_PQ = s"read_parquet('$DIR/typodocs/*.parquet')"
  val N_TYPO = 250L

  /** Planted typos for `ta_symspell`, each a deliberate witness class:
    * single deletions/insertions/substitutions of clean vocab words (must
    * map to their source), `omber` at distance 1 from BOTH ember and umber
    * (the argmax/tiebreak witness), and `brxvq` at distance 2 from bravo
    * (must never map — the exact-verify witness the deletion index alone
    * would admit). None equals a clean word; all stay rare (<10 mentions)
    * while every clean word stays high-frequency.
    */
  val TYPOS: Vector[String] = Vector(
    "alph", "bravp", "carbonn", "delt", "embr", "falcom",
    "gammma", "harbr", "indigoo", "omber", "brxvq", "zephyrx")

  /** All-lowercase prose: 40 clean vocabulary words per doc (every clean
    * word lands ~380 mentions corpus-wide), one planted typo on every fifth
    * doc (~4 mentions per typo — safely under the rare threshold).
    */
  def typoText(i: Long): String = {
    val sb = new StringBuilder
    var w = 0
    while (w < 40) {
      if (w > 0) sb.append(' ')
      sb.append(word(i, 800 + w))
      w += 1
    }
    if (i % 5 == 0)
      sb.append(' ').append(TYPOS((i / 5 % TYPOS.length).toInt))
    sb.toString
  }

  // ---- mirror hosts (site-mirror collapse) --------------------------------------

  val MIRRORDOCS_PQ = s"read_parquet('$DIR/mirrordocs/*.parquet')"
  val N_MHOSTS = 24

  /** Per-host document sets for `dd_mirror`, planted pair by pair:
    * hosts (0,1) are a FULL mirror (identical 30-doc sets, J=1); (2,3) a
    * partial mirror (27 of 30 shared, J=27/33≈0.82); (4,5) sit EXACTLY on
    * the J=1/2 boundary (20 shared, 10 exclusive each: 3·20 = 30+30 —
    * the ≥ rule must keep them); (6,7) just UNDER it (19 shared: 57 < 60 —
    * must drop); (8,9) a small-overlap decoy (2 shared docs, syndicated
    * article shape); remaining hosts are fully exclusive. Texts are host-
    * seeded phrases; mirrored docs COPY the source host's text so the
    * fingerprint (not the url) is what matches — exactly what a mirror is.
    */
  def mirrorRows(h: Int): Seq[(String, String, String)] = {
    val host = s"mhost$h.example.org"
    def doc(owner: Int, k: Int): String = phrase(owner.toLong * 1000 + k, 900, 8)
    val texts: Seq[String] = h match {
      case 1 => (0 until 30).map(k => doc(0, k))
      case 3 => (0 until 27).map(k => doc(2, k)) ++ (0 until 3).map(k => doc(3, 100 + k))
      case 5 => (0 until 20).map(k => doc(4, k)) ++ (0 until 10).map(k => doc(5, 100 + k))
      case 7 => (0 until 19).map(k => doc(6, k)) ++ (0 until 11).map(k => doc(7, 100 + k))
      case 9 => (0 until 2).map(k => doc(8, k)) ++ (0 until 28).map(k => doc(9, 100 + k))
      case _ => (0 until 30).map(k => doc(h, k))
    }
    texts.zipWithIndex.map { case (t, i) => (s"https://$host/p/$i", host, t) }
  }

  // ---- community graph (label propagation) --------------------------------------

  val COMMEDGES_PQ = s"read_parquet('$DIR/commedges/*.parquet')"

  /** Undirected edge list (stored one direction; consumers symmetrize) with
    * planted community structure for `ex_communities`: four 6-cliques
    * (converge to their min label by round 2 — round 1 sends the min node
    * itself to the second-least label, round 2 pulls it back, a real sync-
    * LPA transient), single bridges chaining the cliques (1 inter- vs 5
    * intra-neighbors: majority keeps the bridge home), an isolated triangle
    * (tie-break-driven convergence to its min), and a STAR — the classic
    * synchronous-LPA bipartite oscillator (center and leaves swap labels
    * every round, forever): fixed rounds keep it deterministic, both
    * engines reproduce the oscillation phase exactly, and the spec pins it
    * as the documented pathology async/semi-sync variants exist to fix.
    */
  def commEdges(): Seq[(String, String)] = {
    def n(k: Int, j: Int) = s"c${k}n$j.example.org"
    val out = ArrayBuffer.empty[(String, String)]
    for (k <- 0 until 4; i <- 0 until 6; j <- i + 1 until 6)
      out += ((n(k, i), n(k, j)))
    for (k <- 0 until 3) out += ((n(k, 5), n(k + 1, 0)))
    out += (("g0.example.org", "g1.example.org"))
    out += (("g1.example.org", "g2.example.org"))
    out += (("g2.example.org", "g0.example.org"))
    (1 to 4).foreach(l => out += (("s0c.example.org", s"s0l$l.example.org")))
    out.toSeq
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
      spark.range(N_HOSTS)
        .map(h => (s"host$h.example.org", feedFor(h)))
        .toDF("host", "feed_xml")
        .write.mode("overwrite").parquet(s"$DIR/feeds")
      spark.range(N_PAGES)
        .flatMap(i => recrawlRows(i))
        .toDF("url", "crawl", "body")
        .write.mode("overwrite").parquet(s"$DIR/recrawls")
      spark.range(N_DHOSTS.toLong)
        .flatMap(h => hostdocRows(h))
        .toDF("url", "host", "text")
        .write.mode("overwrite").parquet(s"$DIR/hostdocs")
      spark.range(N_LINKPAGES)
        .map(i => (s"https://lhost${i % 12}.example.org/p/$i", linkpageHtml(i)))
        .toDF("url", "html_str")
        .write.mode("overwrite").parquet(s"$DIR/linkpages")
      spark.range(N_CHOSTS.toLong)
        .flatMap(h => crawllogRows(h))
        .toDF("host", "url")
        .write.mode("overwrite").parquet(s"$DIR/crawllog")
      spark.range(N_DIRTY)
        .map(i => (s"https://dirty.example.org/t/$i", dirtyText(i)))
        .toDF("url", "text")
        .write.mode("overwrite").parquet(s"$DIR/dirtydocs")
      spark.range(N_MIXED)
        .map(i => (s"https://mixed.example.org/m/$i", mixedText(i)))
        .toDF("url", "text")
        .write.mode("overwrite").parquet(s"$DIR/mixeddocs")
      spark.createDataFrame(redirectEdges()).toDF("src", "dst")
        .write.mode("overwrite").parquet(s"$DIR/redirects")
      spark.createDataFrame(hostEdges()).toDF("src", "dst")
        .write.mode("overwrite").parquet(s"$DIR/hostedges")
      spark.createDataFrame(rawHosts().map(Tuple1(_))).toDF("host")
        .write.mode("overwrite").parquet(s"$DIR/rawhosts")
      spark.createDataFrame(crawledUrls()).toDF("host", "url")
        .write.mode("overwrite").parquet(s"$DIR/crawled")
      spark.createDataFrame(l10nUrls().map(Tuple1(_))).toDF("url")
        .write.mode("overwrite").parquet(s"$DIR/l10nurls")
      spark.createDataFrame(canonEdges()).toDF("src", "kind", "dst")
        .write.mode("overwrite").parquet(s"$DIR/canonedges")
      spark.createDataFrame(idnHosts().map(Tuple1(_))).toDF("host")
        .write.mode("overwrite").parquet(s"$DIR/idnhosts")
      spark.range(N_NEWS)
        .map(i => (s"https://news.example.org/n/$i", newsText(i)))
        .toDF("url", "text")
        .write.mode("overwrite").parquet(s"$DIR/newsdocs")
      spark.range(N_TYPO)
        .map(i => (s"https://typo.example.org/t/$i", typoText(i)))
        .toDF("url", "text")
        .write.mode("overwrite").parquet(s"$DIR/typodocs")
      spark.range(N_MHOSTS.toLong)
        .flatMap(h => mirrorRows(h.toInt))
        .toDF("url", "host", "text")
        .write.mode("overwrite").parquet(s"$DIR/mirrordocs")
      spark.createDataFrame(commEdges()).toDF("src", "dst")
        .write.mode("overwrite").parquet(s"$DIR/commedges")
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

  def feeds(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/feeds")
  }

  def recrawls(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/recrawls")
  }

  def hostdocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/hostdocs")
  }

  def linkpages(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/linkpages")
  }

  def crawllog(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/crawllog")
  }

  def dirtydocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/dirtydocs")
  }

  def mixeddocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/mixeddocs")
  }

  def redirects(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/redirects")
  }

  def hostedges(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/hostedges")
  }

  def rawhosts(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/rawhosts")
  }

  def crawled(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/crawled")
  }

  def l10nurls(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/l10nurls")
  }

  def canonedges(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/canonedges")
  }

  def idnhosts(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/idnhosts")
  }

  def newsdocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/newsdocs")
  }

  def typodocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/typodocs")
  }

  def mirrordocs(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/mirrordocs")
  }

  def commedges(spark: SparkSession): DataFrame = {
    ensure(spark)
    spark.read.parquet(s"$DIR/commedges")
  }
}
