package graft

import graft.kg.{KgModel, MentionJoin, Mention, Stages}
import org.scalatest.funsuite.AnyFunSuite

/** The two mention-detection modes (broadcast-map greedy scan vs broadcast
  * hash join + in-row greedy reconciliation, SURVEY.md §2 A6 modes a/b) must
  * produce identical mentions on the fixture corpus. */
class MentionEquivalenceSpec extends AnyFunSuite with SharedSpark {

  test("scan mode == join mode on sf0.001") {
    import spark.implicits._
    val dir = SparkKit.sf0001
    val webpages = spark.read.parquet(s"$dir/webpages.parquet")
    val model = KgModel.load(spark, dir)
    val dict = spark.read.parquet(s"$dir/entity_dict.parquet")

    val tokenized = Stages.tokenized(Stages.sentences(
      Stages.pageText(Stages.partitioned(webpages, Seq("en"), 8)))).cache()

    val viaJoin = MentionJoin.mentions(spark, tokenized, dict)
      .select($"url", $"sent_idx", $"mentions")
      .as[(String, Int, Seq[Mention])]
      .collect()
      .filter(_._3.nonEmpty)
      .map { case (u, s, ms) => (u, s) -> ms }
      .toMap

    val viaScan = tokenized
      .select($"url", $"sent_idx", $"tokens")
      .as[(String, Int, Seq[String])]
      .collect()
      .map { case (u, s, toks) => (u, s) -> model.value.scanMentions(toks.toIndexedSeq) }
      .filter(_._2.nonEmpty)
      .toMap

    tokenized.unpersist()
    assert(viaScan.nonEmpty, "fixture must contain mentions")
    assert(viaJoin.keySet == viaScan.keySet)
    for ((k, ms) <- viaScan)
      assert(viaJoin(k).toList == ms.toList, s"mention mismatch at $k")
  }
}
