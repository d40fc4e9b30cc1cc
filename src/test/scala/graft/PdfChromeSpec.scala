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
    assert(byUrl.size == PdfChrome.N_DOCS)

    byUrl.foreach { case (url, rs) =>
      val i = url.substring(url.lastIndexOf('/') + 1).toLong
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
