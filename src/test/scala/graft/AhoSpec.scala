package graft

import graft.fixtures.Vocab
import graft.kg.{DictEntry, KgModel, Stages, TokenAho}
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick mention mode (SURVEY.md §2 A6 perf mode): identical output to
  * the map-scan on the fixture corpus, plus arbitrary-length surfaces the
  * 1/2-gram map-scan cannot handle. */
class AhoSpec extends AnyFunSuite with SharedSpark {

  test("AC greedy scan == map greedy scan on every fixture sentence") {
    import spark.implicits._
    val dir = SparkKit.sf0001
    val model = KgModel.load(spark, dir)
    val aho = TokenAho.build(Vocab.dictEntries)
    val sentences = Stages.tokenized(Stages.sentences(Stages.pageText(
      Stages.partitioned(spark.read.parquet(s"$dir/webpages.parquet"), Seq("en"), 8))))
      .select($"tokens").as[Seq[String]].collect()
    assert(sentences.nonEmpty)
    var mentionsSeen = 0
    sentences.foreach { toks =>
      val t = toks.toIndexedSeq
      val viaMap = model.value.scanMentions(t)
      val viaAho = aho.scanGreedy(t)
      assert(viaAho == viaMap, s"mismatch on $t")
      mentionsSeen += viaMap.length
    }
    assert(mentionsSeen > 0)
  }

  test("AC handles >2-gram surfaces and nested/suffix overlaps") {
    val dict = Seq(
      DictEntry("acute myeloid leukemia", 1L, "DISEASE", "aml", 1.0),
      DictEntry("myeloid leukemia", 2L, "DISEASE", "ml", 1.0),
      DictEntry("leukemia", 3L, "DISEASE", "leuk", 1.0),
      DictEntry("acute", 4L, "MOD", "acute", 1.0))
    val aho = TokenAho.build(dict)
    val toks = IndexedSeq("severe", "acute", "myeloid", "leukemia", "cases")
    // all matches, including nested suffixes
    val all = aho.matches(toks).map { case (b, e, d) => (b, e, d.canonical) }.toSet
    assert(all == Set((1, 4, "aml"), (2, 4, "ml"), (3, 4, "leuk"), (1, 2, "acute")))
    // greedy longest-match keeps only the 3-gram
    val greedy = aho.scanGreedy(toks).map(m => (m.begin, m.end, m.canonical))
    assert(greedy == IndexedSeq((1, 4, "aml")))
  }

  test("duplicate surfaces resolve by prior then entity id (same rule as the map)") {
    val dict = Seq(
      DictEntry("foo", 10L, "GENE", "low", 0.1),
      DictEntry("foo", 5L, "CHEM", "high", 0.9))
    val aho = TokenAho.build(dict)
    val m = aho.scanGreedy(IndexedSeq("foo"))
    assert(m.map(_.canonical) == IndexedSeq("high"))
  }
}
