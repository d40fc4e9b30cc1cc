package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the hand-rolled BMP container (`mm_bmp`): pixel-exact round
  * trips in both row orders, real padding coverage, and deterministic
  * refusal of damaged/out-of-profile bytes (the PdfRuns damage discipline:
  * classify, never crash deeper in).
  */
class BmpSpec extends AnyFunSuite {

  private def img(id: Long, w: Int, h: Int) = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, Multimodal.pngPixel(7L, id, x, y))
    im
  }

  private def pixels(im: java.awt.image.BufferedImage): Array[Int] = {
    val out = new Array[Int](im.getWidth * im.getHeight)
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      out(y * im.getWidth + x) = im.getRGB(x, y) & 0xffffff
    out
  }

  test("bmp: encode→decode is pixel-exact in both row orders, across " +
    "every padding residue") {
    // widths 16..19 cover all four (w*3 mod 4) padding residues
    for (w <- 16 to 19; topDown <- Seq(false, true)) {
      val im = img(w.toLong, w, 11)
      val (dw, dh, px) = Multimodal.bmpDecode(Multimodal.bmpBytes(im, topDown))
      assert((dw, dh) == (w, 11))
      assert(px.sameElements(pixels(im)),
        s"pixel mismatch at w=$w topDown=$topDown")
    }
  }

  test("bmp: damage and out-of-profile bytes refuse deterministically") {
    val good = Multimodal.bmpBytes(img(3L, 17, 9), topDown = false)
    def reject(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.bmpDecode(b))
      assert(e.getMessage.contains("bmp:"), s"$what: ${e.getMessage}")
    }
    reject(good.take(20), "truncated header")
    reject(good.dropRight(5), "truncated pixel data")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    reject(badMagic, "bad magic")
    val bpp16 = good.clone(); bpp16(28) = 16.toByte
    reject(bpp16, "16bpp")
    val rle = good.clone(); rle(30) = 1.toByte
    reject(rle, "compressed")
    // adversarial geometry: declared dimensions whose Int products overflow
    // (w*3, w*h) must fail the bounds require, not wrap into a negative
    // rowBytes / array size (the pre-fix crash path)
    def putW(v: Int): Array[Byte] = { val b = good.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(18, v); b }
    reject(putW(0x40000000), "overflow width")
    reject(putW(Int.MaxValue), "max width")
    val minH = good.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    reject(minH, "Int.MinValue height")
    val bigBoth = putW(1 << 16)
    java.nio.ByteBuffer.wrap(bigBoth).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, 1 << 16)
    reject(bigBoth, "w*h exceeds pixel cap")
    // every truncation length parses-or-refuses without crashing elsewhere
    (0 until good.length by 7).foreach { n =>
      try Multimodal.bmpDecode(good.take(n))
      catch { case _: IllegalArgumentException => () }
    }
  }
}
