package graft

import graft.fixtures.{Gen, Vocab}
import graft.kg.{Eval, KgModel, Pipeline, Train}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine distant-supervision training (SURVEY.md §3.1 step 2): the P/R
  * gate must hold with LEARNED weights, not just the designed fixture
  * weights — train on pages [0, 600), evaluate on the held-out pages
  * [600, 900) so the gate measures generalization, not memorization.
  */
class TrainSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val trainN = 600L
  private val evalFrom = 600L
  private val evalUntil = 900L

  private lazy val trained = {
    val dictModel = KgModel.fromData(spark, Vocab.dictEntries, Vocab.predicates, Nil, 0.0)
    Train.fromCorpus(spark, Gen.webpagesDF(spark, 0L, trainN), dictModel,
      Vocab.predicates, Gen.goldDF(spark, 0L, trainN), numParts = 8)
  }

  test("distant-supervision labeling finds positives and negatives per predicate") {
    assert(trained.perPred.size == Vocab.predicates.size)
    trained.perPred.foreach { s =>
      assert(s.nCand > 0, s"${s.pred}: no candidates")
      assert(s.nPos > 0, s"${s.pred}: no positive labels")
      assert(s.nPos < s.nCand, s"${s.pred}: all candidates positive")
      assert(s.nWeights > 0, s"${s.pred}: LR learned no weights")
    }
    info(trained.perPred.map(s => s"${s.pred}: ${s.nPos}/${s.nCand} pos, " +
      s"${s.nWeights} weights").mkString("; "))
  }

  test("P/R >= 0.95 on held-out pages with LEARNED weights at tau = 0") {
    val learned = KgModel.fromData(spark, Vocab.dictEntries, Vocab.predicates,
      trained.weightRows, trained.tau)
    val triples = Pipeline.triples(spark, Gen.webpagesDF(spark, evalFrom, evalUntil),
      learned, Pipeline.Config(fixturesDir = "", outDir = "", numParts = 8))
    val gold = Gen.goldDF(spark, evalFrom, evalUntil)
    val pr = Eval.pr(triples, gold)
    info(s"learned-weights held-out P=${pr.precision} R=${pr.recall} " +
      s"(emitted=${pr.emitted}, gold=${pr.gold}, matched=${pr.matched})")
    assert(pr.precision >= 0.95, s"precision ${pr.precision} < 0.95")
    assert(pr.recall >= 0.95, s"recall ${pr.recall} < 0.95")
  }

  test("learned weights put positive mass on template features, not filler") {
    val w = trained.weightRows
    // every predicate's strongest-weight feature should be strongly positive
    val byPred = w.groupBy(_._1)
    byPred.foreach { case (p, rows) =>
      val maxW = rows.map(_._3).max
      assert(maxW > 0.1, s"$p: max learned weight $maxW suspiciously small")
    }
  }

  test("training is deterministic given the same corpus") {
    val dictModel = KgModel.fromData(spark, Vocab.dictEntries, Vocab.predicates, Nil, 0.0)
    val t2 = Train.fromCorpus(spark, Gen.webpagesDF(spark, 0L, 100L), dictModel,
      Vocab.predicates, Gen.goldDF(spark, 0L, 100L), numParts = 4)
    val t3 = Train.fromCorpus(spark, Gen.webpagesDF(spark, 0L, 100L), dictModel,
      Vocab.predicates, Gen.goldDF(spark, 0L, 100L), numParts = 4)
    assert(t2.perPred == t3.perPred)
  }
}
