package graft.kg

import org.apache.spark.unsafe.types.UTF8String

/** Open-addressed, UTF8String-keyed dictionary probe for the A6 greedy scan
  * (built once per executor JVM from the broadcast model).
  *
  * One structure answers both questions the scan asks at a position — "is
  * this token a bigram head (and does the next token complete it)?" and "is
  * it a unigram surface?" — with ONE hash + probe. The java.util.HashMap
  * twins this replaces cost the round-4 JFR ~20% of executor CPU: two maps
  * probed per position (two O(len) hashCodes), plus equals chains through
  * collision/tree bins (ByteArrayMethods.arrayEquals was the single hottest
  * frame). Here the table is power-of-2 sized at load <= 0.25 with linear
  * probing, so a miss — the overwhelmingly common case for webtext tokens —
  * usually terminates on the first empty slot without a single byte
  * comparison, and bigram completions are a short linear scan of the head's
  * (second-token, entry) columns, only reached when the head matched.
  */
final class TokenDict private (
    mask: Int,
    keys: Array[UTF8String],
    uniV: Array[DictEntry],
    biSecond: Array[Array[UTF8String]],
    biV: Array[Array[DictEntry]]) extends Serializable {

  /** Slot of `t`, or -1 when the token is neither a unigram surface nor a
    * bigram head. */
  def find(t: UTF8String): Int = {
    var idx = TokenDict.slotHash(t) & mask
    while (true) {
      val k = keys(idx)
      if (k == null) return -1
      if ((k eq t) || k.equals(t)) return idx
      idx = (idx + 1) & mask
    }
    -1 // unreachable: load < 1 guarantees an empty slot
  }

  /** Unigram entry at a found slot (null when the token only heads bigrams). */
  def uniAt(slot: Int): DictEntry = uniV(slot)

  /** Bigram entry completed by `next` at a found slot, or null. */
  def biAt(slot: Int, next: UTF8String): DictEntry = {
    val ks = biSecond(slot)
    if (ks == null) null
    else {
      var j = 0
      while (j < ks.length) {
        if (ks(j).equals(next)) return biV(slot)(j)
        j += 1
      }
      null
    }
  }
}

object TokenDict {

  /** One-load slot hash: getPrefix (first <= 8 bytes, zero-padded, one
    * unaligned read) multiply-mixed with the byte length. Replaces the
    * O(len) murmur UTF8String.hashCode on the probe path — the A6 scan
    * probes EVERY token of every sentence and almost always misses, and
    * that murmur was the bulk of scanMentionsU8's 8.8% of executor CPU
    * (round-4 JFR). At load <= 0.25 a miss still usually ends on the first
    * empty slot; tokens sharing an 8-byte prefix AND length chain linearly,
    * which equals() resolves exactly. Same function at build and probe time
    * (the table is rebuilt per JVM, never serialized, so the hash never has
    * to be stable across JVMs). */
  private[kg] def slotHash(t: UTF8String): Int = {
    val x = (t.getPrefix ^ (t.numBytes.toLong * 0xC2B2AE3D27D4EB4FL)) * 0x9E3779B97F4A7C15L
    (x >>> 32).toInt
  }

  /** Build from the model's String-keyed maps (driver or executor side; the
    * probe itself is rebuilt lazily per JVM, never serialized). */
  def build(uni: Map[String, DictEntry],
            biNested: Map[String, Map[String, DictEntry]]): TokenDict = {
    val heads = (uni.keySet ++ biNested.keySet).toArray
    var cap = 8
    while (cap < heads.length * 4) cap <<= 1
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val uniV = new Array[DictEntry](cap)
    val biSecond = new Array[Array[UTF8String]](cap)
    val biV = new Array[Array[DictEntry]](cap)
    heads.foreach { h =>
      val k = UTF8String.fromString(h)
      var idx = slotHash(k) & mask
      while (keys(idx) != null) idx = (idx + 1) & mask
      keys(idx) = k
      uniV(idx) = uni.getOrElse(h, null)
      biNested.get(h).foreach { inner =>
        val seconds = inner.toArray
        biSecond(idx) = seconds.map(p => UTF8String.fromString(p._1))
        biV(idx) = seconds.map(_._2)
      }
    }
    new TokenDict(mask, keys, uniV, biSecond, biV)
  }
}
