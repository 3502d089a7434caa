package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-set evaluation (SURVEY.md §2 A15): precision/recall of emitted
  * (subj, pred, obj) triples vs the fixture gold table — the correctness gate
  * of BASELINE.json:2,14 (P >= 0.95 and R >= 0.95), asserted by
  * PipelinePRSpec under `sbt -batch test`.
  */
object Eval {
  final case class PR(precision: Double, recall: Double, emitted: Long,
                      gold: Long, matched: Long)

  def pr(emitted: DataFrame, gold: DataFrame): PR = {
    val keys = Seq("subj", "pred", "obj")
    val e = emitted.select(keys.map(col): _*).distinct().cache()
    val g = gold.select(keys.map(col): _*).distinct().cache()
    val nE = e.count()
    val nG = g.count()
    val m = e.join(g, keys, "left_semi").count()
    e.unpersist(); g.unpersist()
    PR(
      precision = if (nE == 0) 0.0 else m.toDouble / nE,
      recall = if (nG == 0) 0.0 else m.toDouble / nG,
      emitted = nE, gold = nG, matched = m)
  }
}
