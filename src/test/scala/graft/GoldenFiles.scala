package graft

import graft.operators.ScalarExtract
import graft.sources.Corpus
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** One-off generator for the committed golden files (FIXTURES.md §1):
  * `src/test/resources/golden/<md5(url)>.txt` — raw UTF-8 bytes of the
  * scalar oracle's `ExtractedDoc.text` for the first [[N]] corpus pages
  * (all templates/charsets/langs/payload kinds are covered in that prefix).
  *
  * Unlike the in-memory oracle comparison, the committed files pin the
  * semantics against ACCIDENTAL CO-EVOLUTION: a change that alters the
  * scalar oracle and the distributed pipeline identically still diffs
  * against these bytes. Regenerate (deliberately, reviewing the diff) with:
  *
  *   sbt "Test/runMain graft.GoldenFiles"
  */
object GoldenFiles {
  val DIR = "src/test/resources/golden"
  val N = 150L

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(DIR)
    Files.createDirectories(dir)
    var written = 0
    (0L until N).foreach { i =>
      val p = Corpus.page(Corpus.DEFAULT_SEED, i)
      val doc = ScalarExtract.extract(p)
      // empty texts get no file: Spark's binaryFile source drops zero-byte
      // files (no splits), so the join test treats empty-mine + missing-file
      // as the match and any empty/non-empty flip still fails loudly
      if (doc.text.nonEmpty) {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(p.url.getBytes(UTF_8))
        val hex = md.map(b => f"${b & 0xff}%02x").mkString
        Files.write(dir.resolve(s"$hex.txt"), doc.text.getBytes(UTF_8))
        written += 1
      }
    }
    println(s"wrote $written golden files (non-empty texts of $N docs) -> $DIR")
  }
}
