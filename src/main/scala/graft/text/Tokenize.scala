package graft.text

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled scanners for the pinned sentence/token boundaries
  * (TextModel.SentenceSplitRegex / TokenSplitRegex) — regex-free, exactly
  * equivalent to the java.util.regex forms they replace
  * (TokenizeEquivalenceSpec fuzzes both against Pattern.split):
  *
  *  - [[splitSentences]] == Pattern.compile("(?<=[.!?])\\s+").split(s, -1)
  *    (Spark's split(col, re) keeps trailing empties — limit -1 — unlike
  *    Java String.split's default).
  *  - [[tokensOf]] over a lowercased string == the non-empty elements of
  *    Pattern.compile("[^\\p{L}\\p{Nd}]+").split(s, -1), i.e. the maximal
  *    runs of Unicode letter/decimal-digit CODE POINTS (supplementary-plane
  *    letters are one token char, like the regex treats them).
  *
  * Kept Spark-free so the fixture generator and tests can share it; the
  * Catalyst wrappers live in graft.plans.TokenizeExprs. */
object Tokenize {

  // \s without UNICODE_CHARACTER_CLASS is ASCII-only: [ \t\n\f\r]
  private def isSentWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isBoundary(c: Char): Boolean = c == '.' || c == '!' || c == '?'

  /** Sentence split: a separator is a maximal ASCII-whitespace run whose
    * first char immediately follows '.', '!' or '?'. Matches can never be
    * adjacent (each needs a non-ws char before it), so empties only appear
    * as the single trailing element Pattern.split(-1) would keep. */
  def splitSentences(s: String): Array[String] = {
    val n = s.length
    val out = new ArrayBuffer[String](8)
    var start = 0
    var i = 1
    while (i < n) {
      if (isSentWs(s.charAt(i)) && isBoundary(s.charAt(i - 1))) {
        out += s.substring(start, i)
        i += 1
        while (i < n && isSentWs(s.charAt(i))) i += 1
        start = i
        i += 1 // a match cannot start AT `start` (preceded by whitespace)
      } else i += 1
    }
    out += s.substring(start, n)
    out.toArray
  }

  /** \p{L} | \p{Nd} for ASCII, precomputed from the Character predicates
    * themselves (the table IS the definition for cp < 128). The token scan
    * classifies every code point of every sentence, and the generic
    * Character.isLetter/isDigit dispatch pair on that path was 8.5% of
    * executor CPU in the round-4 JFR profile — webtext is overwhelmingly
    * ASCII, so the classification becomes one bounds-checked load. */
  private[graft] val AsciiTokenCp: Array[Boolean] =
    Array.tabulate(128)(c => Character.isLetter(c) || Character.isDigit(c))

  /** \p{L} | \p{Nd} on a code point (java.util.regex category semantics). */
  def isTokenCp(cp: Int): Boolean =
    if (cp < 128) AsciiTokenCp(cp)
    else Character.isLetter(cp) || Character.isDigit(cp)

  /** Maximal letter/digit code-point runs of an (already lowercased) string. */
  def tokensOf(lowered: String): Array[String] = {
    val n = lowered.length
    val out = new ArrayBuffer[String](16)
    var i = 0
    var start = -1
    while (i < n) {
      val cp = lowered.codePointAt(i)
      if (isTokenCp(cp)) { if (start < 0) start = i }
      else if (start >= 0) { out += lowered.substring(start, i); start = -1 }
      i += Character.charCount(cp)
    }
    if (start >= 0) out += lowered.substring(start, n)
    out.toArray
  }
}
