package graft.functions

/** HTML character-reference decoding — the subset of WHATWG HTML §13.5 the
  * engine supports, fixed and documented so the scalar oracle and the
  * distributed pipeline share one definition (determinism, BASELINE.json:14).
  *
  * Supported: the common named entities below, decimal `&#123;` and hex
  * `&#x1F;` numeric references (with or without the trailing `;` for numeric
  * ones, per the spec's error-tolerant path). Unknown named entities are left
  * verbatim (`&foobar;` stays literal), matching browser behavior for
  * unrecognized names.
  */
object Entities {
  val named: Map[String, String] = Map(
    "amp" -> "&",
    "lt" -> "<",
    "gt" -> ">",
    "quot" -> "\"",
    "apos" -> "'",
    "nbsp" -> " ",
    "copy" -> "©",
    "reg" -> "®",
    "trade" -> "™",
    "deg" -> "°",
    "middot" -> "·",
    "laquo" -> "«",
    "raquo" -> "»",
    "ldquo" -> "“",
    "rdquo" -> "”",
    "lsquo" -> "‘",
    "rsquo" -> "’",
    "ndash" -> "–",
    "mdash" -> "—",
    "hellip" -> "…",
    "times" -> "×",
    "divide" -> "÷",
    "plusmn" -> "±",
    "frac12" -> "½",
    "sup2" -> "²",
    "sup3" -> "³",
    "euro" -> "€",
    "pound" -> "£",
    "yen" -> "¥",
    "cent" -> "¢",
    "sect" -> "§",
    "para" -> "¶",
    "bull" -> "•",
    "dagger" -> "†",
    "Dagger" -> "‡",
    "permil" -> "‰",
    "prime" -> "′",
    "Prime" -> "″",
    "larr" -> "←",
    "rarr" -> "→",
    "uarr" -> "↑",
    "darr" -> "↓",
    "harr" -> "↔",
    "aacute" -> "á",
    "eacute" -> "é",
    "iacute" -> "í",
    "oacute" -> "ó",
    "uacute" -> "ú",
    "ntilde" -> "ñ",
    "uuml" -> "ü",
    "ouml" -> "ö",
    "auml" -> "ä",
    "szlig" -> "ß",
    "agrave" -> "à",
    "egrave" -> "è",
    "ccedil" -> "ç",
    "Aacute" -> "Á",
    "Eacute" -> "É",
    "Uuml" -> "Ü",
    "Ouml" -> "Ö",
    "Auml" -> "Ä"
  )

  /** Decode one character reference starting at `i` (which must point at the
    * '&'). Returns (decodedString, nextIndex). If no valid reference is found,
    * returns ("&", i + 1) — the ampersand is literal text.
    */
  def decodeAt(s: String, i: Int): (String, Int) = {
    val n = s.length
    if (i + 1 >= n) return ("&", i + 1)
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val start = j
      var code = 0L
      while (
        j < n && code <= 0x10ffffL && {
          val c = s.charAt(j)
          if (hex) isHex(c) else c >= '0' && c <= '9'
        }
      ) {
        code = code * (if (hex) 16 else 10) + hexVal(s.charAt(j))
        j += 1
      }
      if (j == start) return ("&", i + 1) // no digits: literal
      val end = if (j < n && s.charAt(j) == ';') j + 1 else j
      val cp =
        if (code == 0 || code > 0x10ffff || (code >= 0xd800 && code <= 0xdfff))
          0xfffd
        else code.toInt
      (new String(Character.toChars(cp)), end)
    } else {
      // named: longest match up to 32 chars, terminated by ';'
      var j = i + 1
      while (j < n && j - i <= 32 && isAlnum(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == ';') {
        val name = s.substring(i + 1, j)
        named.get(name) match {
          case Some(v) => (v, j + 1)
          case None    => ("&", i + 1)
        }
      } else ("&", i + 1)
    }
  }

  /** Decode all character references in a string. */
  def decodeAll(s: String): String = {
    val idx = s.indexOf('&')
    if (idx < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, idx)
    var i = idx
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val (d, ni) = decodeAt(s, i)
        sb.append(d)
        i = ni
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  private def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
}
