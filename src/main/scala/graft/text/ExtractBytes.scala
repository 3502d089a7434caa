package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level twin of [[Extract]]: UTF-8 in → UTF-8 out, no transcoding.
  *
  * [[Extract.text]] is the pinned byte-identical contract (String-based,
  * 5 steps, shared with the fixture generator). On the hot path its
  * decode → 3 String passes → re-encode chain was ~17% of pipeline executor
  * CPU (round-4 JFR). This twin runs steps 2–5 directly on the UTF-8 bytes:
  * every structural character the scanners test ('<', '>', '&', ';', '-',
  * '/', '!', CR, LF, space, tab) is a single ASCII byte, and UTF-8
  * continuation/lead bytes are all >= 0x80, so a byte walk sees exactly the
  * characters the char walk saw; the only multi-byte cases are handled
  * explicitly (U+00A0 line-space = C2 A0, \b word-chars and entity bodies
  * decode their code point locally).
  *
  * Fidelity strategy: the byte path runs ONLY on strictly valid UTF-8
  * (RFC 3629 — [[isValidUtf8]]), where `decodeUtf8` is an exact byte↔char
  * bijection; anything malformed falls back to the pinned String path, so
  * U+FFFD replacement semantics are inherited rather than re-implemented.
  * ExtractBytesSpec asserts `textU8(b) == fromString(Extract.text(b))` on
  * the fixture corpus, HTML-ish unicode fuzz, and malformed-byte fuzz.
  */
object ExtractBytes {

  /** Strict RFC-3629 UTF-8 validation: correct continuation counts, no
    * overlongs, no surrogates, max U+10FFFF — exactly the inputs
    * java.nio's decoder maps without any U+FFFD replacement. */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    val n = b.length
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) i += 1
      else if (b0 >= 0xC2 && b0 <= 0xDF) {
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (b0 >= 0xE0 && b0 <= 0xEF) {
        if (i + 2 >= n) return false
        val b1 = b(i + 1) & 0xFF
        val lo = if (b0 == 0xE0) 0xA0 else 0x80
        val hi = if (b0 == 0xED) 0x9F else 0xBF
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (b0 >= 0xF0 && b0 <= 0xF4) {
        if (i + 3 >= n) return false
        val b1 = b(i + 1) & 0xFF
        val lo = if (b0 == 0xF0) 0x90 else 0x80
        val hi = if (b0 == 0xF4) 0x8F else 0xBF
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80)
          return false
        i += 4
      } else return false
    }
    true
  }

  private final class Builder(capacity: Int) {
    var a = new Array[Byte](math.max(capacity, 16))
    var len = 0
    def add(b: Byte): Unit = {
      if (len == a.length) a = java.util.Arrays.copyOf(a, len * 2)
      a(len) = b; len += 1
    }
    def addRange(src: Array[Byte], from: Int, until: Int): Unit = {
      val m = until - from
      if (len + m > a.length)
        a = java.util.Arrays.copyOf(a, math.max(len + m, len * 2))
      System.arraycopy(src, from, a, len, m)
      len += m
    }
  }

  private def indexOf(s: Array[Byte], n: Int, from: Int, target: Byte): Int = {
    var i = math.max(from, 0)
    while (i < n) { if (s(i) == target) return i; i += 1 }
    -1
  }

  /** ASCII-ci region match against a lowercase ASCII literal (the exact
    * folding of Pattern.CASE_INSENSITIVE without UNICODE_CASE; non-ASCII
    * bytes never fold to ASCII, same as the char version). */
  private def asciiCi(s: Array[Byte], n: Int, from: Int, lit: String): Boolean = {
    if (from < 0 || from + lit.length > n) return false
    var k = 0
    while (k < lit.length) {
      val c = s(from + k) & 0xFF
      val f = if (c >= 'A' && c <= 'Z') c + 32 else c
      if (f != lit.charAt(k).toInt) return false
      k += 1
    }
    true
  }

  /** java.util.regex \b word-char at byte position i (a char start): '_' or
    * Character.isLetterOrDigit of the CHAR — a 4-byte (supplementary) char
    * is two surrogates in the String walk, and surrogates are never
    * letter-or-digit, so it is non-word here too. */
  private def isWordCharAt(s: Array[Byte], n: Int, i: Int): Boolean = {
    val b0 = s(i) & 0xFF
    if (b0 < 0x80)
      b0 == '_' || Character.isLetterOrDigit(b0.toChar)
    else if (b0 < 0xE0) {
      val cp = ((b0 & 0x1F) << 6) | (s(i + 1) & 0x3F)
      Character.isLetterOrDigit(cp.toChar)
    } else if (b0 < 0xF0) {
      val cp = ((b0 & 0x0F) << 12) | ((s(i + 1) & 0x3F) << 6) | (s(i + 2) & 0x3F)
      Character.isLetterOrDigit(cp.toChar)
    } else false
  }

  /** Step 2 — script/style/comment removal, byte-for-byte the char scanner
    * of Extract.stripNoise. */
  private def stripNoise(s: Array[Byte], n: Int): (Array[Byte], Int) = {
    var p = indexOf(s, n, 0, '<')
    if (p < 0) return (s, n)
    var out: Builder = null
    var last = 0
    while (p >= 0) {
      var end = -1
      val name =
        if (asciiCi(s, n, p + 1, "script")) "script"
        else if (asciiCi(s, n, p + 1, "style")) "style"
        else null
      if (name != null) {
        val nameEnd = p + 1 + name.length
        if (nameEnd < n && !isWordCharAt(s, n, nameEnd)) {
          val openEnd = indexOf(s, n, nameEnd, '>')
          if (openEnd >= 0) {
            var q = openEnd + 1
            while (end < 0 && q >= 0) {
              q = indexOf(s, n, q, '<')
              if (q >= 0) {
                if (q + 1 < n && s(q + 1) == '/' && asciiCi(s, n, q + 2, name)) {
                  val gt = indexOf(s, n, q + 2 + name.length, '>')
                  if (gt >= 0) end = gt + 1
                  else q = -1
                } else q += 1
              }
            }
          }
        }
      }
      if (end < 0 && p + 3 < n && s(p + 1) == '!' && s(p + 2) == '-' && s(p + 3) == '-') {
        // indexOf("-->", p + 4)
        var q = p + 4
        var close = -1 // -1 searching, -2 failed, >=0 found
        while (close == -1 && q + 2 < n) {
          q = indexOf(s, n, q, '-')
          if (q < 0 || q + 2 >= n) close = -2
          else if (s(q + 1) == '-' && s(q + 2) == '>') close = q
          else q += 1
        }
        if (close >= 0) end = close + 3
      }
      if (end >= 0) {
        if (out == null) out = new Builder(n)
        out.addRange(s, last, p)
        last = end
        p = if (end < n) indexOf(s, n, end, '<') else -1
      } else p = indexOf(s, n, p + 1, '<')
    }
    if (out == null) (s, n)
    else { out.addRange(s, last, n); (out.a, out.len) }
  }

  /** Step 3 — tag removal/newline substitution (Extract.stripTags). */
  private def stripTags(s: Array[Byte], n: Int): (Array[Byte], Int) = {
    var p = indexOf(s, n, 0, '<')
    if (p < 0) return (s, n)
    val out = new Builder(n)
    var last = 0
    while (p >= 0) {
      val gt = indexOf(s, n, p + 1, '>')
      if (gt < 0) p = -1
      else {
        out.addRange(s, last, p)
        if (isBlockTag(s, n, p + 1, gt)) out.add('\n')
        last = gt + 1
        p = indexOf(s, n, gt + 1, '<')
      }
    }
    out.addRange(s, last, n)
    (out.a, out.len)
  }

  private def charWidth(b0: Int): Int =
    if (b0 < 0x80) 1 else if (b0 < 0xE0) 2 else if (b0 < 0xF0) 3 else 4

  private def isBlockTag(s: Array[Byte], n: Int, start: Int, gt: Int): Boolean = {
    var i = start
    if (i < gt && s(i) == '/') i += 1
    var j = i
    while (j < gt && isWordCharAt(s, n, j)) j += charWidth(s(j) & 0xFF)
    val len = j - i
    // byte-length vs the char version's char-length: a run containing a
    // non-ASCII char can never equal an (all-ASCII) block name in either
    // walk, and for pure-ASCII runs the lengths coincide
    if (len < 1 || len > 10) return false
    var b = 0
    while (b < Extract.BlockNames.length) {
      val bn = Extract.BlockNames(b)
      if (bn.length == len && asciiCi(s, n, i, bn)) return true
      b += 1
    }
    false
  }

  /** Steps 4+5 fused (Extract.decodeAndNormalize): entity decode feeding the
    * line/space state machine. Entity bodies are decoded to a (tiny, rare)
    * String and matched with EXACTLY the char version's logic — numeric
    * parsing must inherit Integer.parseInt quirks (unicode digits, signs),
    * and the 8-char distance limit counts CHARS, so the walk counts char
    * starts while scanning for ';'. */
  private def decodeAndNormalize(s: Array[Byte], n: Int): (Array[Byte], Int) = {
    val out = new Builder(n)
    var pendingSpace = false
    var wroteChar = false
    var wroteLine = false
    var pendingNewline = false

    def emitNewline(): Unit = {
      if (wroteChar) pendingNewline = true
      wroteChar = false
      pendingSpace = false
    }
    def emitSpace(): Unit = pendingSpace = wroteChar
    def emitRegularFirst(b: Byte): Unit = {
      if (!wroteChar && wroteLine && pendingNewline) { out.add('\n'); pendingNewline = false }
      if (pendingSpace) { out.add(' '); pendingSpace = false }
      out.add(b)
      wroteChar = true
      wroteLine = true
    }
    /** Route a decoded entity char through the same classification emit()
      * applied to it in the char version. */
    def emitChar(c: Char): Unit = {
      if (c == '\n' || c == '\r') emitNewline()
      else if (c == ' ' || c == '\t' || c == '\u00A0') emitSpace()
      else if (c < 0x80) emitRegularFirst(c.toByte)
      else if (c < 0x800) {
        emitRegularFirst((0xC0 | (c >> 6)).toByte)
        out.add((0x80 | (c & 0x3F)).toByte)
      } else {
        emitRegularFirst((0xE0 | (c >> 12)).toByte)
        out.add((0x80 | ((c >> 6) & 0x3F)).toByte)
        out.add((0x80 | (c & 0x3F)).toByte)
      }
    }

    var i = 0
    while (i < n) {
      val b0 = s(i) & 0xFF
      if (b0 == '&') {
        // first ';' — usable only when its char distance from '&' is <= 8
        var semi = -1
        var d = 0
        var j = i + 1
        while (semi < 0 && j < n && d <= 8) {
          if ((s(j) & 0xC0) != 0x80) {
            d += 1
            if (s(j) == ';' && d <= 8) semi = j
          }
          j += 1
        }
        var advanced = false
        if (semi > i) {
          val body = new String(s, i + 1, semi - i - 1, java.nio.charset.StandardCharsets.UTF_8)
          val rep = Extract.entityReplacement(body)
          if (rep != null) {
            var k = 0
            while (k < rep.length) { emitChar(rep.charAt(k)); k += 1 }
            i = semi + 1
            advanced = true
          }
        }
        if (!advanced) { emitRegularFirst('&'); i += 1 }
      } else if (b0 == '\r') {
        if (i + 1 < n && s(i + 1) == '\n') i += 1
        emitNewline(); i += 1
      } else if (b0 == '\n') { emitNewline(); i += 1 }
      else if (b0 == ' ' || b0 == '\t') { emitSpace(); i += 1 }
      else if (b0 == 0xC2) {
        if (i + 1 < n && (s(i + 1) & 0xFF) == 0xA0) { emitSpace(); i += 2 }
        else {
          // 0xC2 leading a non-NBSP char: regular 2-byte char
          emitRegularFirst(s(i))
          if (i + 1 < n) out.add(s(i + 1))
          i += 2
        }
      } else {
        // batch the whole run of regular bytes up to the next special byte:
        // per-char state transitions after the first are identity (flags
        // already non-pending), so one flush + one arraycopy is equivalent
        emitRegularFirst(s(i))
        var r = i + 1
        while (r < n && {
          val b = s(r) & 0xFF
          b != '&' && b != '\r' && b != '\n' && b != ' ' && b != '\t' && b != 0xC2
        }) r += 1
        out.addRange(s, i + 1, r)
        i = r
      }
    }
    (out.a, out.len)
  }

  /** The pinned end-to-end extraction, UTF-8 bytes → UTF8String. */
  def textU8(html: Array[Byte]): UTF8String = {
    if (html == null) return UTF8String.fromString("")
    if (!isValidUtf8(html)) return UTF8String.fromString(Extract.text(html))
    val (a1, n1) = stripNoise(html, html.length)
    val (a2, n2) = stripTags(a1, n1)
    val (a3, n3) = decodeAndNormalize(a2, n2)
    UTF8String.fromBytes(a3, 0, n3)
  }
}
