package graft.operators

import graft.functions.Entities
import graft.sources.StructuredCorpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Structured-data extraction — the two page-embedded data surfaces a
  * web-extraction pipeline harvests beyond running text:
  *
  *   - schema.org JSON-LD blocks (`<script type="application/ld+json">`):
  *     article metadata (headline, date, author) that news/article curation
  *     keys on;
  *   - data tables (`<table class=…>` grids): relational facts flattened to
  *     (table, row, col, cell) — the table-to-rows pass a training pipeline
  *     runs before table-aware serialization.
  *
  * Both scanners follow the house lexical rules (Links/Meta): single pass,
  * comments skipped, attributes quoted or bare in any order, entity decode +
  * whitespace collapse on cell text. Script bodies are RAWTEXT — no entity
  * decode, verbatim up to the case-insensitive `</script>`.
  *
  * Scale shape: per-row procedural scans (flatMap) — embarrassingly
  * parallel, zero exchanges before the caller's own ordering; JSON parsing
  * is Catalyst `from_json` (codegen'd, null-safe on malformed bodies).
  */
object Structured {

  // ---- shared lexical helpers ---------------------------------------------

  /** Parse attributes starting at `j0` (just past the tag name); returns
    * (attrs, index-just-past-'>'). Mirrors Meta's rules: quoted or bare
    * values, names lowercased, self-closing slash ignored.
    */
  private def parseAttrs(s: String, j0: Int): (List[(String, String)], Int) = {
    val n = s.length
    var j = j0
    var attrs = List.empty[(String, String)]
    var done = false
    while (!done && j < n) {
      while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
      if (j >= n) done = true
      else {
        val ch = s.charAt(j)
        if (ch == '>') { j += 1; done = true }
        else if (ch == '/') j += 1
        else {
          val as = j
          while (
            j < n && {
              val a = s.charAt(j)
              a != '=' && a != '>' && a != '/' && !Character.isWhitespace(a)
            }
          ) j += 1
          val aname = s.substring(as, j).toLowerCase
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          var avalue = ""
          if (j < n && s.charAt(j) == '=') {
            j += 1
            while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
            if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j)
              val vs = j + 1
              var k = vs
              while (k < n && s.charAt(k) != q) k += 1
              avalue = s.substring(vs, math.min(k, n))
              j = math.min(k + 1, n)
            } else {
              val vs = j
              while (j < n && !Character.isWhitespace(s.charAt(j)) && s.charAt(j) != '>') j += 1
              avalue = s.substring(vs, j)
            }
          }
          if (aname.nonEmpty) attrs = (aname -> avalue) :: attrs
        }
      }
    }
    (attrs.reverse, j)
  }

  /** Index just past a case-insensitive close tag `</name ...>` at or after
    * `from`; also returns the tag's start. n if absent.
    */
  private def findClose(s: String, from: Int, name: String): (Int, Int) = {
    val n = s.length
    var i = from
    while (i < n) {
      i = s.indexOf("</", i)
      if (i < 0) return (n, n)
      val j = i + 2
      if (j + name.length <= n && s.regionMatches(true, j, name, 0, name.length)) {
        var k = j + name.length
        while (k < n && s.charAt(k) != '>') k += 1
        return (i, math.min(k + 1, n))
      }
      i = j
    }
    (n, n)
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder
    var pending = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') { if (sb.length > 0) pending = true }
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  // ---- JSON-LD scripts -----------------------------------------------------

  /** Raw bodies of `<script type="application/ld+json">` blocks in document
    * order. Comments skipped; other script types skipped wholesale (rawtext
    * — their content can contain markup-lookalikes).
    */
  def jsonLdBodies(html: String): Vector[String] = {
    val s = html
    val n = s.length
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return out.toVector
      if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt + 4); i = if (e < 0) n else e + 3
      } else if (lt + 7 <= n && s.regionMatches(true, lt + 1, "script", 0, 6) &&
        (lt + 7 == n || !Character.isLetterOrDigit(s.charAt(lt + 7)))) {
        val (attrs, bodyStart) = parseAttrs(s, lt + 7)
        val (bodyEnd, past) = findClose(s, bodyStart, "script")
        val typ = attrs.collectFirst { case ("type", v) => v.trim.toLowerCase }.getOrElse("")
        if (typ == "application/ld+json") out += s.substring(bodyStart, bodyEnd)
        i = past
      } else i = lt + 1
    }
    out.toVector
  }

  /** (table, row, col, cell) grid of every `<table>` whose class attribute
    * carries the `data` token. Cells are th/td in row order, entity-decoded,
    * whitespace-collapsed; nested markup inside a cell contributes its text.
    * Data tables are assumed non-nested (the generator guarantees it; a
    * nested `<table` inside a data cell would end the cell's table at the
    * first close tag).
    */
  def dataTableCells(html: String): Vector[(Int, Int, Int, String)] = {
    val s = html
    val n = s.length
    val out = ArrayBuffer.empty[(Int, Int, Int, String)]
    var tbl = 0
    var i = 0
    while (i < n) {
      val lt = s.indexOf("<table", i)
      if (lt < 0) return out.toVector
      if (lt + 6 < n && !Character.isLetterOrDigit(s.charAt(lt + 6))) {
        val (attrs, inner) = parseAttrs(s, lt + 6)
        val classes = attrs.collectFirst { case ("class", v) => v }.getOrElse("")
          .split("\\s+").toSet
        val (tEnd, past) = findClose(s, inner, "table")
        if (classes.contains("data")) {
          val body = s.substring(inner, tEnd)
          var r = 0
          var j = 0
          while (j < body.length) {
            val tr = body.indexOf("<tr", j)
            if (tr < 0) j = body.length
            else {
              val (_, rowStart) = parseAttrs(body, tr + 3)
              val (rowEnd, rowPast) = findClose(body, rowStart, "tr")
              val row = body.substring(rowStart, rowEnd)
              var c = 0
              var k = 0
              while (k < row.length) {
                val th = row.indexOf("<th", k)
                val td = row.indexOf("<td", k)
                val cell = if (th < 0) td else if (td < 0) th else math.min(th, td)
                if (cell < 0) k = row.length
                else {
                  val name = if (cell == th) "th" else "td"
                  val (_, cs) = parseAttrs(row, cell + 3)
                  val (ce, cPast) = findClose(row, cs, name)
                  val raw = row.substring(cs, ce).replaceAll("<[^>]*>", " ")
                  out += ((tbl, r, c, collapseWs(Entities.decodeAll(raw))))
                  c += 1
                  k = cPast
                }
              }
              r += 1
              j = rowPast
            }
          }
          tbl += 1
        }
        i = past
      } else i = lt + 6
    }
    out.toVector
  }

  // ---- queries ---------------------------------------------------------------

  private val LD_SCHEMA = StructType(Seq(
    StructField("@type", StringType),
    StructField("headline", StringType),
    StructField("datePublished", StringType),
    StructField("author", StructType(Seq(StructField("name", StringType)))),
    StructField("wordCount", LongType)
  ))

  /** Article metadata from JSON-LD blocks: one row per ld+json script, in
    * document order, fields null-safe via from_json.
    */
  def exJsonld(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    StructuredCorpus.htmlStrs(spark)
      .as[(String, String)]
      .flatMap { case (url, html) =>
        jsonLdBodies(html).zipWithIndex.map { case (b, p) => (url, p.toLong, b) }
      }
      .toDF("url", "pos", "body")
      .withColumn("j", from_json(col("body"), LD_SCHEMA))
      .select(
        col("url"), col("pos"),
        col("j.@type").as("ld_type"),
        col("j.headline").as("headline"),
        col("j.datePublished").as("date_published"),
        col("j.author.name").as("author"),
        col("j.wordCount").as("word_count")
      )
      .orderBy("url", "pos")
  }

  val exJsonldSql: String = {
    val H = StructuredCorpus.HTML_PQ
    """WITH m AS (
      |  SELECT url,
      |         regexp_extract_all(html_str,
      |           '<script type="application/ld\+json">(.*?)</script>', 1) bs
      |  FROM """.stripMargin + H + """),
      |e AS (
      |  SELECT url, CAST(i - 1 AS BIGINT) pos, bs[i] body
      |  FROM m, unnest(generate_series(1, len(bs))) AS u(i))
      |SELECT url, pos,
      |       json_extract_string(body, '$."@type"') ld_type,
      |       json_extract_string(body, '$.headline') headline,
      |       json_extract_string(body, '$.datePublished') date_published,
      |       json_extract_string(body, '$.author.name') author,
      |       CAST(json_extract(body, '$.wordCount') AS BIGINT) word_count
      |FROM e ORDER BY url, pos""".stripMargin
  }

  /** Data-table grids flattened to (url, tbl, r, c, cell); r=0 is the header
    * row.
    */
  def exTables(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    StructuredCorpus.htmlStrs(spark)
      .as[(String, String)]
      .flatMap { case (url, html) =>
        dataTableCells(html).map { case (t, r, c, cell) =>
          (url, t.toLong, r.toLong, c.toLong, cell)
        }
      }
      .toDF("url", "tbl", "r", "c", "cell")
      .orderBy("url", "tbl", "r", "c")
  }

  val exTablesSql: String = {
    val H = StructuredCorpus.HTML_PQ
    """WITH t AS (
      |  SELECT url,
      |         regexp_extract_all(html_str, '<table class="data">(.*?)</table>', 1) ts
      |  FROM """.stripMargin + H + """),
      |t2 AS (
      |  SELECT url, CAST(ti - 1 AS BIGINT) tbl, ts[ti] tb
      |  FROM t, unnest(generate_series(1, len(ts))) AS u(ti)),
      |r2 AS (
      |  SELECT url, tbl, CAST(ri - 1 AS BIGINT) r, rs[ri] rw
      |  FROM (SELECT url, tbl, regexp_extract_all(tb, '<tr>(.*?)</tr>', 1) rs FROM t2),
      |       unnest(generate_series(1, len(rs))) AS u(ri)),
      |c2 AS (
      |  SELECT url, tbl, r, CAST(ci - 1 AS BIGINT) c, cs[ci] cell
      |  FROM (SELECT url, tbl, r, regexp_extract_all(rw, '<t[hd]>(.*?)</t[hd]>', 1) cs FROM r2),
      |       unnest(generate_series(1, len(cs))) AS u(ci))
      |SELECT url, tbl, r, c, cell FROM c2 ORDER BY url, tbl, r, c""".stripMargin
  }

  // ---- rel=canonical clustering ----------------------------------------------

  /** First `<link rel="canonical" href=…>` target in the page, or "" when
    * none is declared. General lexical scan (attrs any order/quoting, rel is
    * a token list, comments skipped).
    */
  def canonicalHref(html: String): String = {
    val s = html
    val n = s.length
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return ""
      if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt + 4); i = if (e < 0) n else e + 3
      } else if (lt + 5 <= n && s.regionMatches(true, lt + 1, "link", 0, 4) &&
        (lt + 5 == n || !Character.isLetterOrDigit(s.charAt(lt + 5)))) {
        val (attrs, past) = parseAttrs(s, lt + 5)
        val rel = attrs.collectFirst { case ("rel", v) => v }.getOrElse("")
        val href = attrs.collectFirst { case ("href", v) => v }.getOrElse("")
        if (rel.toLowerCase.split("\\s+").contains("canonical") && href.nonEmpty)
          return href
        i = past
      } else if (lt + 8 <= n && s.regionMatches(true, lt + 1, "/head", 0, 5)) {
        return "" // canonical is a head element; stop at </head>
      } else i = lt + 1
    }
    ""
  }

  /** Canonical-URL clustering — the duplicate-group signal the site itself
    * declares (tracking-param / mobile / recrawl variants all point at one
    * canonical): every url resolves to its declared canonical (itself when
    * none), clusters are counted, and `is_canon` marks the cluster
    * representative a dedup pass would keep. At 100 TB this is the CHEAP
    * first dedup pass — one url-keyed extraction plus one canonical-keyed
    * count, no similarity join at all.
    */
  def exCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val resolved = StructuredCorpus.htmlStrs(spark)
      .as[(String, String)]
      .map { case (url, html) =>
        val c = canonicalHref(html)
        (url, if (c.isEmpty) url else c)
      }
      .toDF("url", "canonical")
    val sizes = resolved.groupBy("canonical").agg(count(lit(1)).as("cluster_n"))
    resolved
      .join(sizes, "canonical")
      .select(
        col("url"), col("canonical"), col("cluster_n"),
        when(col("url") === col("canonical"), 1L).otherwise(0L).as("is_canon")
      )
      .orderBy("url")
  }

  val exCanonicalSql: String = {
    val H = StructuredCorpus.HTML_PQ
    """WITH res AS (
      |  SELECT url,
      |         CASE WHEN regexp_extract(html_str,
      |                '<link rel="canonical" href="([^"]*)">', 1) = ''
      |              THEN url
      |              ELSE regexp_extract(html_str,
      |                '<link rel="canonical" href="([^"]*)">', 1) END canonical
      |  FROM """.stripMargin + H + """),
      |sz AS (SELECT canonical, count(*) cluster_n FROM res GROUP BY canonical)
      |SELECT url, canonical, cluster_n,
      |       CAST(CASE WHEN url = canonical THEN 1 ELSE 0 END AS BIGINT) is_canon
      |FROM res JOIN sz USING (canonical) ORDER BY url""".stripMargin
  }

  // ---- sitemap parse -----------------------------------------------------------

  private val SITEMAP_SCHEMA = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType),
      StructField("priority", StringType)
    ))))
  ))

  /** sitemap.xml → crawl-frontier rows: (host, ord, loc, lastmod, priority)
    * per `<url>` entry, in sitemap order. The parse is Spark 4's native
    * `from_xml` (typed schema, null-safe); priority stays a STRING — it is
    * a declared label, not a number to do float math on.
    */
  def exSitemap(spark: SparkSession, sfDir: String): DataFrame =
    StructuredCorpus.sitemaps(spark)
      .select(col("host"), from_xml(col("sitemap_xml"), SITEMAP_SCHEMA).as("p"))
      .select(col("host"), posexplode(col("p.url")).as(Seq("ord", "u")))
      .select(
        col("host"), col("ord").cast("long").as("ord"),
        col("u.loc").as("loc"), col("u.lastmod").as("lastmod"),
        col("u.priority").as("priority")
      )
      .orderBy("host", "ord")

  val exSitemapSql: String = {
    val S = StructuredCorpus.SITEMAPS_PQ
    """WITH m AS (
      |  SELECT host, regexp_extract_all(sitemap_xml, '<url>(.*?)</url>', 1) es
      |  FROM """.stripMargin + S + """),
      |e AS (
      |  SELECT host, CAST(i - 1 AS BIGINT) ord, es[i] entry
      |  FROM m, unnest(generate_series(1, len(es))) AS u(i))
      |SELECT host, ord,
      |       regexp_extract(entry, '<loc>(.*?)</loc>', 1) loc,
      |       regexp_extract(entry, '<lastmod>(.*?)</lastmod>', 1) lastmod,
      |       regexp_extract(entry, '<priority>(.*?)</priority>', 1) priority
      |FROM e ORDER BY host, ord""".stripMargin
  }

  // ---- contract surface ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ex_jsonld" -> (exJsonld _),
    "ex_tables" -> (exTables _),
    "ex_canonical" -> (exCanonical _),
    "ex_sitemap" -> (exSitemap _)
  )

  def oracles: Map[String, String] = Map(
    "ex_jsonld" -> exJsonldSql,
    "ex_tables" -> exTablesSql,
    "ex_canonical" -> exCanonicalSql,
    "ex_sitemap" -> exSitemapSql
  )
}
