package graft.kg

import scala.collection.mutable

/** Token-level Aho–Corasick automaton for dictionary mention scanning
  * (SURVEY.md §2 A6 perf mode).
  *
  * The default KgModel.scanMentions handles the fixture dictionary's 1/2-gram
  * surfaces with two hash maps; this automaton generalizes to arbitrary-length
  * token surfaces in one O(sentence) pass. Built once on the driver from the
  * dictionary, broadcast, shared by all tasks.
  *
  * `scanGreedy` reproduces exactly the pinned greedy longest-match semantics
  * of KgModel.scanMentions (AhoSpec asserts equality on the fixture corpus):
  * collect all matches, then sweep by (begin asc, length desc) keeping a
  * match iff it starts at/after the consumption cursor.
  */
final class TokenAho private (
    children: Array[Map[String, Int]],
    fail: Array[Int],
    out: Array[List[(Int, DictEntry)]] // (surfaceTokenLen, entry)
) extends Serializable {

  /** All dictionary matches as (begin, end, entry), token-span [begin, end). */
  def matches(tokens: scala.collection.IndexedSeq[String]): IndexedSeq[(Int, Int, DictEntry)] = {
    val res = mutable.ArrayBuffer.empty[(Int, Int, DictEntry)]
    var state = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      var s = state
      while (s != 0 && !children(s).contains(t)) s = fail(s)
      state = children(s).getOrElse(t, 0)
      out(state).foreach { case (len, e) => res += ((i - len + 1, i + 1, e)) }
      i += 1
    }
    res.toIndexedSeq
  }

  /** Greedy longest-match selection (pinned semantics). */
  def scanGreedy(tokens: scala.collection.IndexedSeq[String]): IndexedSeq[Mention] = {
    val all = matches(tokens).sortBy { case (b, e, _) => (b, -(e - b)) }
    val outB = mutable.ArrayBuffer.empty[Mention]
    var cursor = 0
    all.foreach { case (b, e, entry) =>
      if (b >= cursor) {
        outB += Mention(entry.entityId, entry.canonical, entry.entType, b, e)
        cursor = e
      }
    }
    outB.toIndexedSeq
  }
}

object TokenAho {

  /** Build from dictionary entries; on duplicate surfaces the highest-prior
    * (then lowest entity id) entry wins — same rule as KgModel.fromData. */
  def build(entries: Seq[DictEntry]): TokenAho = {
    val bySurface = entries.groupBy(_.surface).map { case (_, grp) =>
      grp.minBy(e => (-e.prior, e.entityId))
    }.toSeq.sortBy(_.surface)

    val children = mutable.ArrayBuffer[mutable.Map[String, Int]](mutable.Map.empty)
    val outAcc = mutable.ArrayBuffer[List[(Int, DictEntry)]](Nil)

    bySurface.foreach { e =>
      val toks = e.surface.split(' ')
      var node = 0
      toks.foreach { t =>
        node = children(node).getOrElseUpdate(t, {
          children += mutable.Map.empty
          outAcc += Nil
          children.length - 1
        })
      }
      outAcc(node) = (toks.length, e) :: outAcc(node)
    }

    // BFS fail links; output links merge the fail target's outputs so nested
    // suffix matches surface too
    val fail = Array.fill(children.length)(0)
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (tok, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(tok)) f = fail(f)
        fail(v) = if (children(f).get(tok).exists(_ != v)) children(f)(tok) else 0
        outAcc(v) = outAcc(v) ++ outAcc(fail(v))
        queue.enqueue(v)
      }
    }
    new TokenAho(children.map(_.toMap).toArray, fail, outAcc.toArray)
  }
}
