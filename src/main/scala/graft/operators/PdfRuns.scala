package graft.operators

import graft.functions.Charset
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Minimal PDF text extractor (SURVEY.md §2.3 D5): positioned text runs from
  * content streams. Deliberately bounded scope (deterministic everywhere):
  *
  *   - Streams: raw (no /Filter) or /FlateDecode (java.util.zip.Inflater).
  *     Any other filter is skipped; a PDF with no decodable content stream is
  *     `pdf_unsupported` (None).
  *   - Text operators: BT/ET, Tf (font size), TL, Td, TD, Tm, T*, Tj, TJ,
  *     ' and ". Literal strings with \-escapes (incl. octal) and <hex>
  *     strings. Bytes decode as windows-1252 (ASCII superset) — no embedded
  *     CMaps/ToUnicode in scope.
  *   - Coordinates: the text-line origin (x, y) at each show-text operator,
  *     rounded to integer PDF units. No width advance between shows — the
  *     y/x sort-and-merge downstream (Classify.linesFromPdfRuns) restores
  *     reading order.
  *
  * Never throws: any structural surprise -> None (pdf_unsupported).
  */
object PdfRuns {

  def parse(bytes: Array[Byte]): Option[Vector[RawBlock]] = {
    try {
      val streams = contentStreams(bytes)
      if (streams.isEmpty) return None
      val runs = ArrayBuffer.empty[RawBlock]
      var seq = 0
      streams.foreach { data =>
        val s = new String(data, java.nio.charset.Charset.forName("windows-1252"))
        seq = interpret(s, runs, seq)
      }
      Some(runs.toVector)
    } catch { case NonFatal(_) => None }
  }

  /** Decoded bytes of every decodable stream object in the file. */
  private def contentStreams(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    val n = bytes.length
    var i = 0
    val kw = "stream".getBytes("US-ASCII")
    val endKw = "endstream".getBytes("US-ASCII")
    while (i < n) {
      val p = indexOf(bytes, kw, i)
      if (p < 0) { i = n }
      else if (p >= 3 && bytes(p - 3) == 'e' && bytes(p - 2) == 'n' && bytes(p - 1) == 'd') {
        i = p + kw.length // this was "endstream"
      } else {
        // stream data starts after CRLF or LF
        var ds = p + kw.length
        if (ds < n && bytes(ds) == '\r') ds += 1
        if (ds < n && bytes(ds) == '\n') ds += 1
        val de = indexOf(bytes, endKw, ds)
        if (de < 0) { i = n }
        else {
          // trailing EOL before endstream belongs to the marker, not the data
          var realEnd = de
          if (realEnd > ds && bytes(realEnd - 1) == '\n') realEnd -= 1
          if (realEnd > ds && bytes(realEnd - 1) == '\r') realEnd -= 1
          val dict = dictBefore(bytes, p)
          val data = java.util.Arrays.copyOfRange(bytes, ds, realEnd)
          if (!dict.contains("/Filter")) out += data
          else if (dict.contains("/FlateDecode")) inflate(data).foreach(out += _)
          // other filters: skipped
          i = de + endKw.length
        }
      }
    }
    out.toVector
  }

  /** ASCII view of up to 512 bytes before the `stream` keyword — enough to
    * see the stream dictionary's /Filter entry in any sane PDF.
    */
  private def dictBefore(bytes: Array[Byte], p: Int): String = {
    val from = math.max(0, p - 512)
    val sb = new java.lang.StringBuilder(p - from)
    var i = from
    while (i < p) {
      val c = bytes(i) & 0xff
      sb.append(if (c >= 0x20 && c <= 0x7e) c.toChar else ' ')
      i += 1
    }
    val s = sb.toString
    val objAt = s.lastIndexOf(" obj")
    if (objAt >= 0) s.substring(objAt) else s
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      val maxIters = 1 << 16
      var guard = 0
      while (!inf.finished() && guard < maxIters) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) guard = maxIters // truncated
        else out.write(buf, 0, k)
        guard += 1
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case NonFatal(_) => None }
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    val n = hay.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && hay(i + j) == needle(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  // ---- content-stream interpreter ----

  private def interpret(s: String, out: ArrayBuffer[RawBlock], seq0: Int): Int = {
    var seq = seq0
    val n = s.length
    var i = 0
    var x = 0.0
    var y = 0.0
    var lineX = 0.0 // text-line origin (Td/TD/Tm/T* move this)
    var lineY = 0.0
    var leading = 0.0
    var fontSize = 12.0
    var inText = false
    // operand stack: numbers and strings since the last operator
    val nums = ArrayBuffer.empty[Double]
    val strs = ArrayBuffer.empty[String]

    def emit(text: String): Unit = {
      val norm = Charset.normalizeWs(text)
      if (norm.nonEmpty && inText) {
        var words = 1
        var k = 0
        while (k < norm.length) { if (norm.charAt(k) == ' ') words += 1; k += 1 }
        out += RawBlock(
          seq = seq,
          tag = "pdf",
          depth = 0,
          text = norm,
          textLen = norm.length,
          linkChars = 0,
          wordCount = words,
          parentSeq = 0,
          flags = 0,
          x = math.round(x).toInt,
          y = math.round(y).toInt,
          w = math.round(fontSize * norm.length / 2).toInt,
          h = math.round(fontSize).toInt
        )
        seq += 1
      }
    }

    def op(name: String): Unit = {
      name match {
        case "BT" =>
          inText = true; x = 0; y = 0; lineX = 0; lineY = 0
        case "ET" => inText = false
        case "Tf" => if (nums.nonEmpty) fontSize = nums.last
        case "TL" => if (nums.nonEmpty) leading = nums.last
        case "Td" =>
          if (nums.length >= 2) {
            lineX += nums(nums.length - 2); lineY += nums.last
            x = lineX; y = lineY
          }
        case "TD" =>
          if (nums.length >= 2) {
            leading = -nums.last
            lineX += nums(nums.length - 2); lineY += nums.last
            x = lineX; y = lineY
          }
        case "Tm" =>
          if (nums.length >= 6) {
            lineX = nums(nums.length - 2); lineY = nums.last
            x = lineX; y = lineY
          }
        case "T*" =>
          lineY -= leading; x = lineX; y = lineY
        case "Tj" => if (strs.nonEmpty) emit(strs.last)
        case "TJ" => if (strs.nonEmpty) emit(strs.mkString)
        case "'" =>
          lineY -= leading; x = lineX; y = lineY
          if (strs.nonEmpty) emit(strs.last)
        case "\"" =>
          lineY -= leading; x = lineX; y = lineY
          if (strs.nonEmpty) emit(strs.last)
        case _ => () // drawing/state operators: ignored
      }
      nums.clear(); strs.clear()
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '(') {
        val (str, ni) = literalString(s, i)
        strs += str; i = ni
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val (str, ni) = hexString(s, i)
        strs += str; i = ni
      } else if (c == '<' || c == '>') { // dict delimiters inside BT? skip
        i += 1
      } else if (c == '[' || c == ']') {
        i += 1 // TJ arrays: strings collected, numbers (kerning) ignored via nums
      } else if (c == '/') {
        i += 1
        while (i < n && !isDelim(s.charAt(i))) i += 1 // name: ignored
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val st = i
        i += 1
        while (i < n && (s.charAt(i) == '.' || (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
        try nums += java.lang.Double.parseDouble(s.substring(st, i))
        catch { case _: NumberFormatException => () }
      } else if (Character.isWhitespace(c)) {
        i += 1
      } else {
        // operator token
        val st = i
        while (i < n && !isDelim(s.charAt(i)) && !Character.isWhitespace(s.charAt(i))) i += 1
        if (i > st) op(s.substring(st, i)) else i += 1
      }
    }
    seq
  }

  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%' || Character.isWhitespace(c)

  /** PDF literal string starting at '(': handles \-escapes, octal, nesting. */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var code = 0
            var k = i + 1
            while (k < n && k < i + 4 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              code = code * 8 + (s.charAt(k) - '0')
              k += 1
            }
            sb.append((code & 0xff).toChar)
            i = k
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) sb.append(c)
        i += 1
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** PDF hex string starting at '<'. */
  private def hexString(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    val n = s.length
    var hi = -1
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar) // odd count: pad with 0
    (sb.toString, if (i < n) i + 1 else n)
  }
}
