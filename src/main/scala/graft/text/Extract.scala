package graft.text

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer
import java.util.regex.Pattern

/** Deterministic, total, locale-free HTML-to-text extraction.
  *
  * This function is the byte-identical contract of SURVEY.md §7.2: the fixture
  * generator computes the `text` column of the `webpages` table with THIS
  * function, and `ByteIdenticalSpec` asserts the pipeline recomputes it exactly
  * (UTF-8 byte equality per url). The reference snapshot is empty (SURVEY.md
  * §0), so this pinned spec is normative.
  *
  * Pinned algorithm (order matters):
  *  1. Decode UTF-8 with U+FFFD replacement for malformed input (total on any
  *     byte array).
  *  2. Remove, case-insensitively and non-greedily, in ONE left-to-right
  *     pass: <script...>...</script>, <style...>...</style>, <!-- ... -->
  *     (leftmost alternative wins; an unclosed construct does not match and
  *     falls through to step 3's tag handling).
  *  3. ONE left-to-right tag pass: each "<" up to the next ">" is replaced by
  *     "\n" when the tag name is block-level (p div br li ul ol h1..h6 tr
  *     table section article header footer blockquote), by "" otherwise.
  *  4. Decode exactly these entities: &amp; &lt; &gt; &quot; &#39;
  *     &nbsp; (to a plain space), plus numeric &#NNN; / &#xHH; for code points
  *     in [1, 0xFFFF] excluding the surrogate range — anything else is left
  *     verbatim (fixed whitelist: determinism over fidelity).
  *  5. Normalize whitespace: CR/CRLF -> LF; within each line collapse runs of
  *     space/tab/U+00A0 to one space and trim; drop empty lines; join with
  *     "\n".
  */
object Extract {
  // one pass for all removable noise; backreference keeps script/style paired
  private val NoiseRe = Pattern.compile(
    "(?is)<(script|style)\\b[^>]*>.*?</\\1[^>]*>|<!--.*?-->")
  // one pass for every remaining tag; per-match block test decides "\n" vs ""
  private val TagRe = Pattern.compile("(?s)<[^>]*>")
  private val BlockRe = Pattern.compile(
    "(?is)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|blockquote)\\b[^>]*>")

  /** Step 1 — total UTF-8 decode. */
  def decodeUtf8(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    try dec.decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => "" } // unreachable with REPLACE; belt+braces
  }

  /** Steps 2–3 — strip markup (two passes total). */
  def stripMarkup(html: String): String = {
    val noNoise = NoiseRe.matcher(html).replaceAll("")
    val m = TagRe.matcher(noNoise)
    val sb = new java.lang.StringBuilder(noNoise.length)
    var last = 0
    while (m.find()) {
      sb.append(noNoise, last, m.start())
      if (BlockRe.matcher(m.group()).matches()) sb.append('\n')
      last = m.end()
    }
    sb.append(noNoise, last, noNoise.length)
    sb.toString
  }

  /** Step 4 — fixed-whitelist entity decode (single pass, no re-decode). */
  def decodeEntities(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        var advanced = false
        if (semi > i && semi - i <= 8) { // longest accepted body fits in 7 chars
          val body = s.substring(i + 1, semi)
          val rep: String = body match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "nbsp" => " "
            case b if b.length >= 2 && b.charAt(0) == '#' =>
              val numStr = b.substring(1)
              val cp: Int =
                try {
                  if ((numStr.charAt(0) == 'x' || numStr.charAt(0) == 'X') && numStr.length > 1)
                    Integer.parseInt(numStr.substring(1), 16)
                  else Integer.parseInt(numStr, 10)
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 1 && cp <= 0xFFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) cp.toChar.toString
              else null
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1; advanced = true }
        }
        if (!advanced) { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isLineSpace(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\u00A0'

  /** Step 5 — whitespace normalization. */
  def normalizeWhitespace(s: String): String = {
    val unified = s.replace("\r\n", "\n").replace('\r', '\n')
    val out = new java.lang.StringBuilder(unified.length)
    var lineStart = 0
    var wroteLine = false
    val n = unified.length
    var i = 0
    while (i <= n) {
      if (i == n || unified.charAt(i) == '\n') {
        // normalize unified[lineStart, i): collapse space runs, trim, drop if empty
        var j = lineStart
        var pendingSpace = false
        var wroteChar = false
        while (j < i) {
          val ch = unified.charAt(j)
          if (isLineSpace(ch)) pendingSpace = wroteChar // leading spaces dropped
          else {
            if (!wroteChar && wroteLine) out.append('\n') // first char of a non-empty line
            if (pendingSpace) { out.append(' '); pendingSpace = false }
            out.append(ch); wroteChar = true
          }
          j += 1
        }
        if (wroteChar) wroteLine = true
        lineStart = i + 1
      }
      i += 1
    }
    out.toString
  }

  /** Steps 4+5 fused into one scan (exactly equivalent to
    * normalizeWhitespace(decodeEntities(s)) — FusedExtractSpec asserts it):
    * entities decode into the whitespace state machine directly, saving one
    * full string copy per page on the hot path. */
  def decodeAndNormalize(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var wroteChar = false   // a non-space char written on the current line
    var wroteLine = false   // any non-empty line written so far
    var pendingNewline = false

    def emit(ch: Char): Unit = {
      if (ch == '\n' || ch == '\r') {
        if (wroteChar) pendingNewline = true
        wroteChar = false
        pendingSpace = false
      } else if (isLineSpace(ch)) {
        pendingSpace = wroteChar
      } else {
        if (!wroteChar && wroteLine && pendingNewline) { out.append('\n'); pendingNewline = false }
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(ch)
        wroteChar = true
        wroteLine = true
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        var advanced = false
        if (semi > i && semi - i <= 8) {
          val body = s.substring(i + 1, semi)
          val rep: String = body match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "nbsp" => " "
            case b if b.length >= 2 && b.charAt(0) == '#' =>
              val numStr = b.substring(1)
              val cp: Int =
                try {
                  if ((numStr.charAt(0) == 'x' || numStr.charAt(0) == 'X') && numStr.length > 1)
                    Integer.parseInt(numStr.substring(1), 16)
                  else Integer.parseInt(numStr, 10)
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 1 && cp <= 0xFFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) cp.toChar.toString
              else null
            case _ => null
          }
          if (rep != null) {
            var k = 0
            while (k < rep.length) { emit(rep.charAt(k)); k += 1 }
            i = semi + 1; advanced = true
          }
        }
        if (!advanced) { emit(c); i += 1 }
      } else if (c == '\r') {
        // CR and CRLF both normalize to one line break
        if (i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        emit('\n'); i += 1
      } else { emit(c); i += 1 }
    }
    out.toString
  }

  /** The pinned end-to-end extraction. Total: never throws on any input. */
  def text(html: Array[Byte]): String =
    decodeAndNormalize(stripMarkup(decodeUtf8(html)))
}
