package graft.kg

import graft.text.TextModel
import scala.util.hashing.MurmurHash3
import scala.collection.mutable.ArrayBuffer

/** Hashed dependency-path + lexical featurization (SURVEY.md §2 A8).
  *
  * The reference pipeline featurizes candidate entity pairs with dependency-path
  * and lexical-context features and hashes them into a sparse vector
  * (BASELINE.json:6 "batched dependency-path + lexical featurization",
  * "feature hashing"). A CoreNLP-class parser is unavailable offline, so the
  * dependency path is a pinned deterministic pseudo-parse (SURVEY.md §7.4.1):
  * the path is the chain of verb-like tokens between the two mentions, where
  * "verb-like" = member of a closed auxiliary set OR length>=4 ending in
  * s/ed/ing. This is the one recorded semantic deviation from the reference's
  * true parse-based features.
  *
  * Feature classes (every feature string is prefixed with the direction tag
  * "F|" — mention-1 precedes mention-2 — or "R|", so a reversed candidate pair
  * shares no feature ids with the forward pair):
  *   btw:<w>        unigrams strictly between the mentions        [weighted]
  *   btw2:<w1>_<w2> bigrams strictly between the mentions          [weighted]
  *   dep:<chain>    pseudo-dependency path (between verb chain)    [weighted]
  *   gap:<n>        bucketed token gap (capped at 10)
  *   tp:<T1>_<T2>   entity-type pair
  *   bef:<w>/aft:<w> up to 2 context tokens before/after the span
  *
  * [weighted] marks the classes the fixture generator assigns non-zero weights
  * to (Weights.WeightedClasses) — context-independent, so the designed P/R
  * margin of FIXTURES.md 2.4 holds in any sentence context.
  */
object Featurize {

  private val AuxVerbs = Set(
    "is", "are", "was", "were", "be", "been", "has", "have", "had", "may",
    "can", "could", "might", "must", "should", "would", "will", "does", "did")

  def isVerbLike(tok: String): Boolean =
    AuxVerbs.contains(tok) ||
      (tok.length >= 4 && (tok.endsWith("s") || tok.endsWith("ed") || tok.endsWith("ing")))

  /** Raw (pre-hash) feature strings for an ordered candidate (m1, m2) in a
    * tokenized sentence. Pure and total. */
  def raw(tokens: IndexedSeq[String], m1: Mention, m2: Mention): IndexedSeq[String] = {
    val out = new ArrayBuffer[String](32)
    val forward = m1.begin <= m2.begin
    val dir = if (forward) "F|" else "R|"
    val (left, right) = if (forward) (m1, m2) else (m2, m1)
    val lo = math.min(math.max(left.end, 0), tokens.length)
    val hi = math.min(math.max(right.begin, 0), tokens.length)

    // between unigrams + bigrams
    var i = lo
    while (i < hi) {
      out += dir + "btw:" + tokens(i)
      if (i + 1 < hi) out += dir + "btw2:" + tokens(i) + "_" + tokens(i + 1)
      i += 1
    }
    // pseudo-dependency path: chain of verb-like tokens between the mentions
    val chain = new java.lang.StringBuilder()
    i = lo
    while (i < hi) {
      val t = tokens(i)
      if (isVerbLike(t)) { if (chain.length > 0) chain.append('>'); chain.append(t) }
      i += 1
    }
    if (chain.length > 0) out += dir + "dep:" + chain.toString
    // gap bucket
    out += dir + "gap:" + math.min(math.max(hi - lo, 0), 10)
    // type pair
    out += dir + "tp:" + m1.entType + "_" + m2.entType
    // context windows (up to 2 before the left span, 2 after the right span)
    var k = math.max(left.begin - 2, 0)
    while (k < left.begin && k < tokens.length) { out += dir + "bef:" + tokens(k); k += 1 }
    k = right.end
    val kEnd = math.min(right.end + 2, tokens.length)
    while (k < kEnd) { if (k >= 0) out += dir + "aft:" + tokens(k); k += 1 }
    out.toIndexedSeq
  }

  /** Murmur3(seed=42) feature-hash into [0, 2^18) (TextModel constants). */
  def hash(feature: String): Long = {
    val h = MurmurHash3.stringHash(feature, TextModel.FeatureSeed)
    java.lang.Math.floorMod(h.toLong, TextModel.FeatureBuckets.toLong)
  }

  /** Hashed feature ids (with multiplicity — the scorer sums per occurrence). */
  def ids(tokens: IndexedSeq[String], m1: Mention, m2: Mention): Array[Long] =
    raw(tokens, m1, m2).map(hash).toArray

  /** Per-sentence featurization session: all position-dependent feature
    * hashes (between-unigram/bigram, context windows, verb-likeness) are
    * precomputed ONCE per sentence and reused across every candidate pair —
    * sentences with m mentions score m·(m-1) pairs, so per-pair string
    * building would redo the same hashing O(m²·gap) times. Emits EXACTLY the
    * ids (and order) of `ids(...)` (FeaturizeSessionSpec asserts equality on
    * the fixture corpus). */
  final class Session(tokens: IndexedSeq[String]) {
    private val n = tokens.length
    // [dir 0=F 1=R][pos]
    private val uniH = Array.ofDim[Long](2, n)
    private val biH = Array.ofDim[Long](2, math.max(n - 1, 0))
    private val befH = Array.ofDim[Long](2, n)
    private val aftH = Array.ofDim[Long](2, n)
    private val verb = new Array[Boolean](n)
    private val dirs = Array("F|", "R|")
    locally {
      var i = 0
      while (i < n) {
        val t = tokens(i)
        var d = 0
        while (d < 2) {
          uniH(d)(i) = hash(dirs(d) + "btw:" + t)
          befH(d)(i) = hash(dirs(d) + "bef:" + t)
          aftH(d)(i) = hash(dirs(d) + "aft:" + t)
          if (i + 1 < n) biH(d)(i) = hash(dirs(d) + "btw2:" + t + "_" + tokens(i + 1))
          d += 1
        }
        verb(i) = isVerbLike(t)
        i += 1
      }
    }

    /** Hashed feature ids for an ordered pair — same ids, same order, same
      * multiplicity as Featurize.ids(tokens, m1, m2). */
    def ids(m1: Mention, m2: Mention): Array[Long] = {
      val forward = m1.begin <= m2.begin
      val d = if (forward) 0 else 1
      val dir = dirs(d)
      val (left, right) = if (forward) (m1, m2) else (m2, m1)
      val lo = math.min(math.max(left.end, 0), n)
      val hi = math.min(math.max(right.begin, 0), n)
      // primitive buffer (an ArrayBuffer[Long] would box every id — measurable
      // allocator churn at m² pairs per sentence); exact content bound:
      // (hi-lo) uni + (hi-lo-1) bi + dep + gap + tp + 2 bef + 2 aft
      val buf = new Array[Long](2 * math.max(hi - lo, 0) + 7)
      var m = 0
      var i = lo
      while (i < hi) {
        buf(m) = uniH(d)(i); m += 1
        if (i + 1 < hi) { buf(m) = biH(d)(i); m += 1 }
        i += 1
      }
      val chain = new java.lang.StringBuilder()
      i = lo
      while (i < hi) {
        if (verb(i)) { if (chain.length > 0) chain.append('>'); chain.append(tokens(i)) }
        i += 1
      }
      if (chain.length > 0) { buf(m) = hash(dir + "dep:" + chain.toString); m += 1 }
      buf(m) = hash(dir + "gap:" + math.min(math.max(hi - lo, 0), 10)); m += 1
      buf(m) = hash(dir + "tp:" + m1.entType + "_" + m2.entType); m += 1
      var k = math.max(left.begin - 2, 0)
      while (k < left.begin && k < n) { buf(m) = befH(d)(k); m += 1; k += 1 }
      k = right.end
      val kEnd = math.min(right.end + 2, n)
      while (k < kEnd) { if (k >= 0) { buf(m) = aftH(d)(k); m += 1 }; k += 1 }
      if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m)
    }
  }

  /** The context-independent weighted classes of a forward planted instance of
    * `template` — used by the fixture generator to derive the weight table
    * (FIXTURES.md 2.4) with the SAME featurizer the pipeline runs. */
  def templateFeatures(templateTokens: IndexedSeq[String]): IndexedSeq[String] = {
    val subj = Mention(0L, "s", "X", 0, 1)
    val obj = Mention(1L, "o", "Y", templateTokens.length + 1, templateTokens.length + 2)
    val toks = ("subjtok" +: templateTokens) :+ "objtok"
    raw(toks, subj, obj).filter(f =>
      f.startsWith("F|btw:") || f.startsWith("F|btw2:") || f.startsWith("F|dep:"))
      .distinct
  }
}
