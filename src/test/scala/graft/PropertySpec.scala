package graft

import graft.functions.{Charset, Entities}
import graft.operators.{Classify, HtmlBlocks, PdfRuns, ScalarExtract}
import graft.sources.Corpus
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5.2: property-based robustness + determinism. Uses plain
  * ScalaCheck generators sampled under fixed seeds (the
  * scalatestplus bridge is not in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val anyString: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf('<', '>', '&', '/', '"', '\'', ';', '#', 'a', 'p',
      ' ', '\n', '\t', ' ', '\ud83d', '\ude00', 'é', '中')).map(_.mkString),
    1 -> Gen.stringOf(Gen.choose(Char.MinValue, Char.MaxValue))
  )

  private val anyBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("chain resolution property: pointer doubling equals a brute walk on " +
    "random functional graphs (chains, cycles, merges, self-feeding tails)") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val cap = 1 << graft.operators.CrawlOps.REDIRECT_ROUNDS
    // random functional graphs: node i -> (a*i + b) % n over a RANDOM
    // subset of nodes — produces merging chains, rho shapes, and cycles of
    // arbitrary length (some beyond the doubling capacity: those must flag)
    val cases = samples(for {
      n <- Gen.choose(5, 60)
      a <- Gen.choose(1, 97)
      b <- Gen.choose(0, 97)
      keep <- Gen.choose(30, 100)
    } yield (n, a, b, keep), 6)
    cases.foreach { case (n, a, b, keep) =>
      val edges = (0 until n)
        .filter(i => (i * 31 + 7) % 100 < keep)
        .map(i => (s"n$i", s"n${(a * i + b) % n}"))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val em = edges.toMap
        val out = graft.operators.CrawlOps
          .resolveChains(edges.toDF("src", "dst")).collect()
        assert(out.length == em.size, s"case ($n,$a,$b,$keep)")
        out.foreach { r =>
          val src = r.getAs[String]("src")
          var cur = src; var hops = 0L
          while (em.contains(cur) && hops < cap) { cur = em(cur); hops += 1 }
          if (em.contains(cur)) {
            assert(r.getAs[Long]("is_cycle") == 1L, s"($n,$a,$b,$keep) $src")
            assert(r.getAs[String]("final_url") == "" &&
              r.getAs[Long]("n_hops") == -1L)
          } else {
            assert(r.getAs[String]("final_url") == cur, s"($n,$a,$b,$keep) $src")
            assert(r.getAs[Long]("n_hops") == hops, s"($n,$a,$b,$keep) $src")
          }
        }
      }
    }
  }

  test("cdc chunker: lossless on arbitrary strings; boundaries equal a brute-force recompute") {
    // independent boundary implementation: direct 6-term polynomial per
    // position (no rolling update) — the same second-implementation the
    // DuckDB oracle uses
    def bruteEnds(t: String): Vector[Int] = {
      val K = 6
      (K - 1 until t.length).filter { p =>
        var h = 0L
        var j = p - K + 1
        while (j <= p) { h = h * 257L + t.charAt(j); j += 1 }
        h % 64L == 13L
      }.map(_ + 1).toVector
    }
    samples(anyString, 300).foreach { s =>
      val ch = graft.operators.Dedup.cdcChunks(s)
      assert(ch.mkString == s, "lossless")
      assert(ch.forall(_.nonEmpty), "nonempty")
      if (s.length >= 6) {
        val ends = ch.scanLeft(0)(_ + _.length).drop(1)
        val expected = {
          val b = bruteEnds(s)
          if (b.lastOption.contains(s.length)) b else b :+ s.length
        }
        assert(ends.toVector == expected, s"boundary mismatch on ${s.take(40)}…")
      } else if (s.nonEmpty) assert(ch == Vector(s))
    }
  }

  test("tokenizer never crashes and is deterministic on arbitrary strings") {
    samples(anyString, 300).foreach { s =>
      val a = HtmlBlocks.blocks(s)
      val b = HtmlBlocks.blocks(s)
      assert(a == b)
      a.foreach { blk =>
        assert(blk.textLen == blk.text.length)
        assert(blk.linkChars <= blk.textLen)
        assert(blk.text == blk.text.trim)
        assert(!blk.text.contains("  "))
      }
    }
  }

  test("tokenizer never crashes on tag-dense soup") {
    val soup = Gen.listOf(Gen.oneOf(
      "<p>", "</p>", "<div class='x y'>", "</div>", "<a href=/x>", "</a>",
      "<!--", "-->", "<script>", "</script>", "&amp;", "&#x41;", "&broken",
      "text ", "<li>", "<br/>", "<td>", "<![CDATA[", "]]>", "<", ">", "\"", "'"
    )).map(_.mkString)
    samples(soup, 300).foreach(s => HtmlBlocks.blocks(s))
  }

  test("structured head/body scanners terminate and never throw on soup") {
    import graft.operators.Structured
    // the scanners are hand-rolled index loops — the property is progress
    // (no hang) and totality (no throw) on adversarial tag soup, including
    // unclosed rawtext, truncated attrs, and nested lookalikes
    val soup = Gen.listOf(Gen.oneOf(
      "<head>", "</head>", "<meta ", "property=", "name=", "content=",
      "\"og:title\"", "'robots'", "robots", "refresh", "http-equiv=",
      "<link ", "rel=", "hreflang=", "href=", "alternate", "amphtml",
      "<img ", "src=", "alt=", "width=", "height=", "<figure>", "</figure>",
      "<figcaption>", "</figcaption>", "<time ", "datetime=", "</time>",
      "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
      "<title>", "</title>", "=", ">", "<", "\"", "'", " ", "x", "1", ";url=",
      "<pre>", "</pre>", "<code", "</code>", "language-", "class=",
      "<ul>", "</ul>", "<ol>", "</ol>", "<li>", "</li>", "<a ", "license", "next",
      "<blockquote", "</blockquote>", "cite=", "<dl>", "</dl>",
      "<dt>", "</dt>", "<dd>", "</dd>"
    )).map(_.mkString)
    samples(soup, 400).foreach { s =>
      Structured.ogCard(s)
      Structured.hreflangAlts(s)
      Structured.robotsMeta(s)
      Structured.metaRefresh(s)
      Structured.ampHref(s)
      Structured.publishedTimeMeta(s)
      Structured.timeDatetime(s)
      Structured.imageHarvest(s)
      Structured.jsonLdBodies(s)
      Structured.dataTableCells(s)
      Structured.canonicalHref(s)
      Structured.codeBlocks(s)
      Structured.listItems(s)
      Structured.licenseOf(s)
      Structured.nextHref(s)
      Structured.blockquotes(s)
      Structured.dlItems(s)
      Structured.mdBlocks(s)
    }
    samples(anyString, 300).foreach { s =>
      Structured.ogCard(s); Structured.imageHarvest(s); Structured.timeDatetime(s)
    }
  }

  test("entity decode never crashes; known entities round-trip") {
    samples(anyString, 300).foreach(Entities.decodeAll)
    Entities.named.foreach { case (k, v) =>
      assert(Entities.decodeAll(s"&$k;") == v)
    }
  }

  test("normalizeWs is idempotent and produces no doubled spaces") {
    samples(anyString, 300).foreach { s =>
      val n = Charset.normalizeWs(s)
      assert(Charset.normalizeWs(n) == n)
      assert(!n.contains("  ") && n == n.trim)
    }
  }

  test("charset decode / sniff never crash on arbitrary bytes") {
    samples(anyBytes, 300).foreach { b =>
      Charset.decode(b)
      Charset.sniffKind(b)
    }
  }

  test("pdf parser never crashes on arbitrary bytes (with %PDF- prefix too)") {
    samples(anyBytes, 200).foreach { b =>
      PdfRuns.parse(b)
      PdfRuns.parse("%PDF-1.4\n".getBytes ++ b)
    }
  }

  test("pdf parser: truncations and mutations of VALID fixtures never throw, classify deterministically") {
    // SURVEY §5.2: the adversarial case is not random bytes but a REAL pdf
    // damaged in transit — cut mid-xref, mid-stream, or bit-flipped. The
    // parser must return Some(runs) or None (-> pdf_unsupported), never
    // throw, and the same bytes must classify the same way every time.
    val fixtures = Seq(
      Corpus.pdfBytes(Corpus.pdfContent(7L, 1L, "en"), flate = false, badFilter = false),
      Corpus.pdfBytes(Corpus.pdfContent(7L, 2L, "en"), flate = true, badFilter = false),
      Corpus.pdfBytes(Seq(Corpus.pdfContent(7L, 3L, "en", 0),
        Corpus.pdfContent(7L, 3L, "en", 1)), flate = true, badFilter = false))
    val gen = for {
      f <- Gen.choose(0, fixtures.size - 1)
      cut <- Gen.choose(0, fixtures(f).length)
      nMut <- Gen.choose(0, 8)
      muts <- Gen.listOfN(nMut, Gen.zip(Gen.choose(0, math.max(cut - 1, 0)), Gen.choose(0, 255)))
    } yield {
      val b = java.util.Arrays.copyOfRange(fixtures(f), 0, cut)
      muts.foreach { case (pos, v) => if (b.nonEmpty) b(pos % b.length) = v.toByte }
      b
    }
    samples(gen, 400).foreach { b =>
      val r1 = PdfRuns.parse(b)
      val r2 = PdfRuns.parse(b)
      assert(r1 == r2, "pdf parse not deterministic on damaged input")
      r1.foreach(runs => runs.foreach(r => assert(r.text != null)))
    }
    // untouched fixtures still parse (the generator really is damaging
    // working inputs, not dead ones)
    fixtures.foreach(f => assert(PdfRuns.parse(f).nonEmpty))
  }

  test("scalar extraction is total and deterministic over the corpus space") {
    val gen = Gen.zip(Gen.choose(0L, 100000L), Gen.choose(1L, 1000L))
    samples(gen, 200).foreach { case (i, seed) =>
      val p = Corpus.page(seed, i)
      val a = ScalarExtract.extract(p)
      val b = ScalarExtract.extract(p)
      assert(a == b)
      assert(a.nDropped >= 0 && a.nBlocks >= 0)
      a.spans.zipWithIndex.foreach { case (sp, k) =>
        assert(sp.lineId == k + 1)
        assert(sp.end >= sp.start)
      }
      if (a.spans.nonEmpty) {
        assert(a.spans.head.start == 0)
        assert(a.spans.last.end == a.text.codePointCount(0, a.text.length))
      }
    }
  }

  test("classification invariants: kept subset of candidates, order-stable") {
    samples(Gen.choose(0L, 50000L), 200).foreach { i =>
      val p = Corpus.page(Corpus.DEFAULT_SEED, i)
      if (Charset.sniffKind(p.html) == "html") {
        val blocks = HtmlBlocks.blocks(Charset.decode(p.html))
        val kept = Classify.classifyHtml(blocks)
        assert(kept.map(_.seq) == kept.map(_.seq).sorted)
        assert(kept.forall(b => (b.flags & Model.FLAG_BOILER) == 0))
      }
    }
  }

  test("TopKPerKey equals the window formulation on random data (property)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = SparkFixture.spark
    import spark.implicits._
    val rowGen = for {
      key <- Gen.choose(0, 7)
      v <- Gen.choose(-1000L, 1000L)
      id <- Gen.choose(0L, 500L) // deliberately non-unique: (v, id) ties exist
    } yield (key, v, id)
    for (trial <- 0 until 3) {
      val rows = samples(Gen.listOfN(400, rowGen), 1).head
        // dedup (key, v, id) triples so the total-order requirement holds
        .distinct
      val df = rows.toDF("key", "v", "id").repartition(5)
      val k = trial + 1
      val custom = graft.plans.TopK
        .perKey(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), k)
        .orderBy("key", "v", "id").collect()
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val window = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .drop("rn").orderBy("key", "v", "id").collect()
      assert(custom.length == window.length, s"trial=$trial k=$k")
      custom.zip(window).foreach { case (a, b) => assert(a == b, s"trial=$trial k=$k") }
    }
  }

  test("line dedup equals the brute-force reference on random corpora (property)") {
    import org.apache.spark.sql.functions._
    val spark = SparkFixture.spark
    import spark.implicits._
    // small line alphabet forces heavy cross-doc duplication; empty lines,
    // single-line docs, and all-dup docs all occur
    val lineGen = Gen.oneOf("alpha", "beta b", "g", "", "alpha", "d d d", "e")
    val docGen = for {
      n <- Gen.choose(0, 8)
      ls <- Gen.listOfN(n, lineGen)
    } yield ls.mkString("\n")
    for (trial <- 0 until 3) {
      val docs = samples(Gen.listOfN(40, docGen), 1).head.zipWithIndex
        .map { case (t, i) => (f"u$i%03d", t) }
      // brute-force reference: global first occurrence by (url, pos) order
      val seen = scala.collection.mutable.Set[String]()
      val ref = docs.sortBy(_._1).map { case (u, t) =>
        val ls = t.split("\n", -1).zipWithIndex.filter(_._1.nonEmpty)
        val kept = ls.filter { case (l, _) => seen.add(l) }
        (u, ls.length.toLong, kept.length.toLong,
          (ls.length - kept.length).toLong, kept.map(_._1).mkString("\n"))
      }
      val got = graft.operators.Dedup.lineDedupOver(docs.toDF("url", "text").repartition(7))
        .orderBy("url").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      assert(got.toSeq == ref, s"trial=$trial")
    }
  }

  test("WARC record framing round-trips arbitrary payload bytes; truncation fails cleanly") {
    import graft.sources.Warc
    val rnd = new scala.util.Random(4242)
    val pages = (0 until 60).map { i =>
      val payload = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(payload) // arbitrary bytes incl. CRLFCRLF sequences
      graft.Page(
        s"https://ex$i.example.org/p$i",
        new java.sql.Timestamp(1700000000000L + i * 1337L),
        payload,
        null,
        if (i % 5 == 0) null else s"l${i % 7}")
    }
    val bytes = pages.flatMap(p => Warc.record(p).toSeq).toArray
    val back = Warc.parse(bytes).toSeq
    assert(back.size == pages.size)
    pages.zip(back).foreach { case (a, b) =>
      assert(a.url == b.url && a.warc_ts == b.warc_ts && a.lang == b.lang)
      assert(java.util.Arrays.equals(a.html, b.html), a.url)
    }
    // every truncation point fails with the framing require, never
    // zero-padded payloads or a raw ArrayIndexOutOfBoundsException
    Seq(1, 2, 3, 5, 17, 101).foreach { cut =>
      val trunc = bytes.dropRight(cut)
      val r = try { Warc.parse(trunc).toSeq; "ok" }
      catch {
        case _: IllegalArgumentException => "framing"
        case e: Throwable                => e.getClass.getSimpleName
      }
      assert(r == "framing", s"cut=$cut -> $r")
    }
    // CRLF in a header value must be rejected at write time
    intercept[IllegalArgumentException] {
      Warc.record(pages.head.copy(url = "https://x/\r\nWARC-Type: evil"))
    }
  }
}
