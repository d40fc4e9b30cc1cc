package graft

import graft.operators.PdfChrome
import org.scalatest.funsuite.AnyFunSuite

/** Pins for PDF page-chrome detection (`ex_pdfchrome`): every planted
  * chrome class surfaces per document with exactly its page-hit count, the
  * boundary stamp is kept by ≥, the one-page stamp never surfaces, body
  * lines never surface (same y-band across pages but different templates),
  * and the two-run footer assembled in x order.
  */
class PdfChromeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ex_pdfchrome: planted chrome classes, boundary, and decoys") {
    val rows = PdfChrome.exPdfchrome(spark, "").collect()
    val byUrl = rows.groupBy(_.getAs[String]("url"))
    assert(byUrl.size == PdfChrome.N_DOCS + 1) // + the all-chrome witness

    byUrl.foreach { case (url, rs) =>
      val i = url.substring(url.lastIndexOf('/') + 1).toLong
      if (i == PdfChrome.WITNESS) {
        // witness: only title + footer exist and BOTH are chrome on all pages
        assert(rs.length == 2, s"$url: ${rs.mkString(";")}")
        assert(rs.forall(_.getAs[Long]("n_hit") == 3L), url)
      } else {
      val nPages = 3 + (i % 3).toInt
      val boundary = math.max(2, (2 * nPages + 2) / 3)
      val tpls = rs.map(r => r.getAs[String]("tpl") -> r.getAs[Long]("n_hit")).toMap

      // exactly three chrome classes — title, draft stamp, footer
      assert(rs.length == 3, s"$url: ${rs.mkString(";")}")
      // the x-ordered two-run footer normalized to "page #" on every page
      assert(tpls.get("page #").contains(nPages.toLong), url)
      // the full-run title on every page
      assert(tpls.exists { case (t, n) => t.endsWith(" report") && n == nPages },
        url)
      // the boundary stamp: exactly ceil(2n/3) pages, kept by >=
      assert(tpls.get("draft copy").contains(boundary.toLong), url)
      // the one-page stamp and all body lines never surface
      assert(!tpls.contains("internal only"), url)
      assert(!tpls.keys.exists(_.contains(" body ")), url)
      rs.foreach(r => assert(r.getAs[Long]("n_pages") == nPages.toLong))
      }
    }
  }

  test("ex_pdfclean: chrome never survives, body always does, counts " +
    "reconcile, reading order holds") {
    val cleaned = PdfChrome.exPdfclean(spark, "").collect()
    assert(cleaned.nonEmpty)
    // the all-chrome witness: every page yields NULL text_clean (not ""),
    // zero kept lines — the cross-engine empty-vs-NULL divergence pin
    val witness = cleaned.filter(
      _.getAs[String]("url").endsWith(s"/${PdfChrome.WITNESS}"))
    assert(witness.length == 3)
    witness.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("text_clean")), r.toString)
      assert(r.getAs[Long]("n_kept") == 0L && r.getAs[Long]("n_lines") == 2L)
    }
    cleaned.filterNot(witness.contains).foreach { r =>
      val url = r.getAs[String]("url")
      val text = r.getAs[String]("text_clean")
      val nLines = r.getAs[Long]("n_lines")
      val nKept = r.getAs[Long]("n_kept")
      // chrome classes are gone
      assert(!text.contains(" report"), url)
      assert(!text.contains("draft copy"), url)
      assert(!text.contains("page "), url)
      // kept = body lines, plus the one-page 'internal only' stamp on page 0
      // (one page < the 2-page floor, so it is NOT chrome and must survive)
      val kept = text.split("\n").toSeq
      assert(kept.length.toLong == nKept && nKept < nLines)
      val (stamps, body) = kept.partition(_ == "internal only")
      assert(body.forall(_.contains(" body ")), url)
      assert(stamps.nonEmpty == (r.getAs[Int]("page") == 0), url)
      // reading order top-to-bottom: the body ladder tags ascend (la, lb, …)
      val tags = body.map(_.split(" ").last)
      assert(tags == tags.sorted, s"$url reading order broke: $tags")
    }
  }
}
