package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5.2 continuation for the round-4 operators: randomized
  * round-trips and brute-reference equalities beyond the fixed staged
  * witnesses (same plain-ScalaCheck-under-fixed-seeds device as
  * PropertySpec).
  */
class Round4PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("bmp property: random dimensions and pixels round-trip pixel-exactly " +
    "in both row orders") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 24)
      topDown <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (w, h, topDown, seed)
    samples(gen, 120).foreach { case (w, h, topDown, seed) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, Multimodal.pngPixel(seed, seed + 1, x, y))
      val (dw, dh, px) = Multimodal.bmpDecode(Multimodal.bmpBytes(img, topDown))
      assert((dw, dh) == (w, h))
      var k = 0
      for (y <- 0 until h; x <- 0 until w) {
        assert(px(k) == (img.getRGB(x, y) & 0xffffff),
          s"pixel ($x,$y) of ${w}x$h topDown=$topDown")
        k += 1
      }
    }
  }

  test("srt property: random cue structures serialize and re-parse to the " +
    "same spans and texts") {
    val cueGen = for {
      n <- Gen.choose(1, 8)
      start <- Gen.choose(0L, 4L * 3600000)
      durs <- Gen.listOfN(n, Gen.choose(1L, 30000L))
      gaps <- Gen.listOfN(n, Gen.choose(0L, 5000L))
      lines <- Gen.listOfN(n, Gen.choose(1, 3))
    } yield (start, durs, gaps, lines)
    samples(cueGen, 100).foreach { case (start, durs, gaps, lines) =>
      def fmt(ms: Long): String = {
        val h = ms / 3600000; val m = ms / 60000 % 60
        val s = ms / 1000 % 60; val f = ms % 1000
        f"$h%02d:$m%02d:$s%02d,$f%03d"
      }
      var t = start
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      val doc = durs.zip(gaps).zip(lines).zipWithIndex.map {
        case (((d, g), nl), i) =>
          val text = (0 until nl).map(j => s"line $i $j").mkString("\n")
          val block = s"${i + 1}\n${fmt(t)} --> ${fmt(t + d)}\n$text"
          expected += ((t, t + d, text))
          t += d + g
          block
      }.mkString("\n\n")
      val parsed = Multimodal.srtParse(9L, doc)
      assert(parsed.map(c => (c._3, c._4, c._7)) == expected.toSeq)
      assert(parsed.map(_._2) == (1 to durs.length))
    }
  }

  test("symspell property: the deletion-index pipeline equals a brute " +
    "levenshtein pair scan on random vocabularies") {
    val spark = SparkFixture.spark
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'e')).map(_.mkString))
    val vocabGen = for {
      n <- Gen.choose(8, 30)
      ws <- Gen.listOfN(n, word)
      tfs <- Gen.listOfN(n, Gen.oneOf(1L, 5L, 150L, 900L))
    } yield ws.zip(tfs).toMap.toSeq // dedup words, last tf wins
    samples(vocabGen, 25).foreach { vocab =>
      val df = vocab.toDF("t", "tf")
      val got = TextAnalysis.symspellMap(df, 10L, 100L).collect()
        .map(r => r.getAs[String]("rare") -> r.getAs[String]("canon")).toMap
      val want = vocab.filter(_._2 < 10).flatMap { case (r, _) =>
        val cands = vocab.filter { case (c, tf) => tf >= 100 && lev(r, c) == 1 }
        if (cands.isEmpty) None
        else Some(r -> cands.minBy { case (c, tf) => (-tf, c) }._1)
      }.toMap
      assert(got == want, s"vocab=$vocab")
    }
  }
}
