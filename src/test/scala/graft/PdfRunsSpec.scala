package graft

import graft.operators.{Classify, PdfRuns}
import graft.sources.Corpus
import org.scalatest.funsuite.AnyFunSuite

class PdfRunsSpec extends AnyFunSuite {

  private def pdf(content: String, flate: Boolean = true, bad: Boolean = false) =
    Corpus.pdfBytes(content, flate, bad)

  test("flate and raw streams both parse; text ordered by y desc then x") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 300 700 Tm (right top) Tj
        |1 0 0 1 72 700 Tm (left top) Tj
        |1 0 0 1 72 650 Tm (second line) Tj
        |ET""".stripMargin
    for (flate <- Seq(true, false)) {
      val runs = PdfRuns.parse(pdf(content, flate)).get
      assert(runs.size == 3)
      val lines = Classify.linesFromPdfRuns(runs)
      assert(lines.map(_.text) == Vector("left top right top", "second line"))
    }
  }

  test("Td/TD/T* relative positioning and quote operator") {
    val content =
      """BT /F1 10 Tf 14 TL 72 700 Td (a) Tj
        |0 -14 Td (b) Tj
        |T* (c) Tj
        |(d) '
        |ET""".stripMargin
    val runs = PdfRuns.parse(pdf(content)).get
    assert(runs.map(_.text) == Vector("a", "b", "c", "d"))
    assert(runs.map(_.y) == Vector(700, 686, 672, 658))
    val (text, _) = Classify.assemble(Classify.linesFromPdfRuns(runs))
    assert(text == "a\nb\nc\nd")
  }

  test("TJ arrays concatenate strings, kerning numbers ignored") {
    val content = "BT 72 700 Td [(he) -20 (llo) 5 ( wor) (ld)] TJ ET"
    val runs = PdfRuns.parse(pdf(content)).get
    assert(runs.map(_.text) == Vector("hello world"))
  }

  test("escapes: parens, backslash, octal; hex strings") {
    val content = """BT 72 700 Td (a\(b\)c \\ d \101) Tj 72 650 Td <68657821> Tj ET"""
    val runs = PdfRuns.parse(pdf(content)).get
    assert(runs.map(_.text) == Vector("a(b)c \\ d A", "hex!"))
  }

  test("unsupported filter -> None (pdf_unsupported)") {
    assert(PdfRuns.parse(pdf("BT (x) Tj ET", bad = true)).isEmpty)
  }

  test("no streams / truncated / garbage -> None, never throws") {
    assert(PdfRuns.parse("%PDF-1.4\nnothing here".getBytes).isEmpty)
    val full = pdf("BT 72 700 Td (x) Tj ET")
    for (cut <- Seq(10, 60, full.length / 2)) {
      PdfRuns.parse(java.util.Arrays.copyOf(full, cut)) // must not throw
    }
    PdfRuns.parse("%PDF-stream\nstreamendstream".getBytes)
  }

  test("corpus PDFs round-trip through the parser deterministically") {
    val c = Corpus.pdfContent(42L, 7L, "en")
    val a = PdfRuns.parse(pdf(c)).get
    val b = PdfRuns.parse(pdf(c)).get
    assert(a == b)
    assert(a.nonEmpty)
    val (text, spans) = Classify.assemble(Classify.linesFromPdfRuns(a))
    assert(text.nonEmpty && spans.nonEmpty)
    assert(spans.head.start == 0)
    // offsets contiguous
    spans.sliding(2).foreach {
      case Seq(x, y) => assert(y.start == x.end + 1)
      case _         => ()
    }
  }
}
