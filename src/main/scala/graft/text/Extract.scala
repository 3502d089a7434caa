package graft.text

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

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
  /** The pinned step-2/3 semantics in java.util.regex form. The production
    * path below is a hand-rolled scanner with EXACTLY these semantics
    * (StripEquivalenceSpec fuzzes the two against each other) — the regex
    * engine's per-page cost dominated the pipeline's CPU profile:
    *   noise:  (?is)<(script|style)\b[^>]*>.*?</\1[^>]*>|<!--.*?-->
    *   tag:    (?s)<[^>]*>   → "\n" when BLOCK, "" otherwise
    *   block:  (?is)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|
    *                   header|footer|blockquote)\b[^>]*>
    * Scanner fidelity notes: \b is java.util.regex's default ASCII word
    * boundary; (?i) without UNICODE_CASE folds ASCII ONLY (so e.g. U+017F
    * 'ſ' does NOT match 's' — asciiCi below preserves that). */
  private[text] val BlockNames = Array(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "section", "article", "header", "footer", "blockquote")

  /** java.util.regex's \b word-char test WITHOUT UNICODE_CHARACTER_CLASS:
    * quirk — it is Unicode letters/digits plus '_' (Pattern.Bound uses
    * Character.isLetterOrDigit), even though \w stays ASCII-only. */
  private def isWordChar(c: Char): Boolean =
    c == '_' || Character.isLetterOrDigit(c)

  /** ASCII-only case-insensitive region match against a lowercase literal —
    * the exact folding of Pattern.CASE_INSENSITIVE without UNICODE_CASE. */
  private def asciiCi(s: String, from: Int, lit: String): Boolean = {
    if (from < 0 || from + lit.length > s.length) return false
    var k = 0
    while (k < lit.length) {
      val c = s.charAt(from + k)
      val f = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (f != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Step 1 — total UTF-8 decode. */
  def decodeUtf8(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    try dec.decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => "" } // unreachable with REPLACE; belt+braces
  }

  /** Steps 2–3 — strip markup (two passes total; fusing them would change
    * edge semantics — noise removal can create new tag adjacencies that the
    * tag pass must then see, e.g. "<" + "<!--x-->" + "b>"). */
  def stripMarkup(html: String): String =
    stripTags(stripNoise(html))

  /** Step 2 — one left-to-right pass removing script/style elements and
    * comments; leftmost alternative wins, an unclosed construct falls
    * through (its interior is then scanned too, exactly like the regex). */
  private def stripNoise(s: String): String = {
    val n = s.length
    var p = s.indexOf('<')
    if (p < 0) return s
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (p >= 0) {
      var end = -1 // exclusive end of a noise match starting at p, or -1
      // alt 1: <(script|style)\b[^>]*>.*?</\1[^>]*>
      val name =
        if (asciiCi(s, p + 1, "script")) "script"
        else if (asciiCi(s, p + 1, "style")) "style"
        else null
      if (name != null) {
        val nameEnd = p + 1 + name.length
        // \b: next char must exist and be non-word ([^>]*> needs a '>' later
        // anyway, so end-of-input fails either way)
        if (nameEnd < n && !isWordChar(s.charAt(nameEnd))) {
          val openEnd = s.indexOf('>', nameEnd)
          if (openEnd >= 0) {
            // non-greedy close: EARLIEST "</name" (ascii-ci) with a '>' after
            var q = openEnd + 1
            while (end < 0 && q >= 0) {
              q = s.indexOf('<', q)
              if (q >= 0) {
                if (q + 1 < n && s.charAt(q + 1) == '/' &&
                    asciiCi(s, q + 2, name)) {
                  val gt = s.indexOf('>', q + 2 + name.length)
                  if (gt >= 0) end = gt + 1
                  else q = -1 // no '>' anywhere later: alt 1 fails outright
                } else q += 1
              }
            }
          }
        }
      }
      // alt 2: <!--.*?-->
      if (end < 0 && s.regionMatches(p, "<!--", 0, 4)) {
        val close = s.indexOf("-->", p + 4)
        if (close >= 0) end = close + 3
      }
      if (end >= 0) {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, last, p)
        last = end
        p = if (end < n) s.indexOf('<', end) else -1
      } else p = s.indexOf('<', p + 1)
    }
    if (sb == null) s else { sb.append(s, last, n); sb.toString }
  }

  /** Step 3 — one left-to-right pass: every "<...>" (interior '>'-free)
    * becomes "\n" when the tag word is block-level, "" otherwise; a '<'
    * with no later '>' stays verbatim. */
  private def stripTags(s: String): String = {
    val n = s.length
    var p = s.indexOf('<')
    if (p < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var last = 0
    while (p >= 0) {
      val gt = s.indexOf('>', p + 1)
      if (gt < 0) p = -1 // no closing '>' left: no further tags possible
      else {
        sb.append(s, last, p)
        if (isBlockTag(s, p + 1, gt)) sb.append('\n')
        last = gt + 1
        p = s.indexOf('<', gt + 1)
      }
    }
    sb.append(s, last, n)
    sb.toString
  }

  /** Block test over the tag interior s[start, gt): optional '/', then a
    * maximal ASCII word run that must equal a block name (the regex \b makes
    * the alternation equivalent to whole-word set membership). */
  private def isBlockTag(s: String, start: Int, gt: Int): Boolean = {
    var i = start
    if (i < gt && s.charAt(i) == '/') i += 1
    var j = i
    while (j < gt && isWordChar(s.charAt(j))) j += 1
    val len = j - i
    if (len < 1 || len > 10) return false // longest name: "blockquote"
    var b = 0
    while (b < BlockNames.length) {
      val bn = BlockNames(b)
      if (bn.length == len && asciiCi(s, i, bn)) return true
      b += 1
    }
    false
  }

  /** The step-4 whitelist: replacement for an entity body (the text between
    * '&' and ';'), or null when the body is not accepted and the '&' stays
    * verbatim. Shared verbatim by decodeEntities, decodeAndNormalize and the
    * byte path (ExtractBytes) so the three can never diverge — note the
    * deliberate Integer.parseInt quirks (unicode digits, leading signs) are
    * part of the pinned semantics. */
  private[text] def entityReplacement(body: String): String = body match {
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
          val rep = entityReplacement(s.substring(i + 1, semi))
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
          val rep = entityReplacement(s.substring(i + 1, semi))
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
