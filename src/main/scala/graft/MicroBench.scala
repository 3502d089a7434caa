package graft

import graft.fixtures.Gen
import graft.kg.{Featurize, KgModel}
import graft.text.{Extract, TextModel}

/** Single-thread micro-benchmark of the per-page hot path (no Spark):
  * decode+strip+entities+whitespace, sentence/token split, mention scan,
  * featurize+score — to see where pipeline CPU actually goes.
  * `sbt "runMain graft.MicroBench [nPages]"` */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val pages = (0 until n).map { i =>
      val plan = Gen.pagePlan(i.toLong)
      Gen.renderHtml(plan)
    }.toArray
    val uni = graft.fixtures.Vocab.dictEntries.filterNot(_.surface.contains(' '))
      .map(e => e.surface -> e).toMap
    val bi = graft.fixtures.Vocab.dictEntries.filter(_.surface.contains(' '))
      .map(e => e.surface -> e).toMap
    val model = {
      val w = Array.fill(graft.fixtures.Vocab.predicates.length)(
        new Array[Double](TextModel.FeatureBuckets))
      val idx = graft.fixtures.Vocab.predicates.sortBy(_.pred).zipWithIndex
        .map { case (p, i) => p.pred -> i }.toMap
      Gen.weightRows.foreach { case (p, f, wt) => w(idx(p))(f.toInt) += wt }
      new KgModel(uni, bi, graft.fixtures.Vocab.predicates.sortBy(_.pred), w, Gen.Tau)
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$label%-22s ${ms}%9.1f ms   (${ms * 1e6 / n}%8.1f ns/page, checksum $out)")
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round (n=$n) ---")
      var texts: Array[String] = null
      time("extract") {
        texts = pages.map(Extract.text)
        texts.map(_.length.toLong).sum
      }
      var sents: Array[Array[String]] = null
      time("sentence-split") {
        sents = texts.map(graft.text.Tokenize.splitSentences)
        sents.map(_.length.toLong).sum
      }
      var toks: Array[Array[IndexedSeq[String]]] = null
      time("tokenize") {
        toks = sents.map(_.map(s =>
          graft.text.Tokenize.tokensOf(s.toLowerCase(java.util.Locale.ROOT))
            .toIndexedSeq))
        toks.map(_.map(_.length.toLong).sum).sum
      }
      time("scan+featurize+score") {
        var acc = 0L
        toks.foreach(_.foreach { t =>
          val ms = model.scanMentions(t)
          if (ms.length >= 2) acc += model.scoreRelations(t, ms).length
        })
        acc
      }
      // component split inside extract
      var stripped: Array[String] = null
      time("  decodeUtf8") { pages.map(Extract.decodeUtf8).map(_.length.toLong).sum }
      time("  stripMarkup") {
        stripped = pages.map(p => Extract.stripMarkup(Extract.decodeUtf8(p)))
        stripped.map(_.length.toLong).sum
      }
      time("  entities+ws") {
        stripped.map(s => Extract.normalizeWhitespace(Extract.decodeEntities(s)))
          .map(_.length.toLong).sum
      }
    }
  }
}
