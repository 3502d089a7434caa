package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Round-6 evidence dumper: writes `plans/r06/<query>_<suffix>.txt` with the
  * explain("formatted") output of each named harness query (default: every
  * query touched by the round-6 optimizations). Run once from the round-5
  * baseline checkout with suffix `before` and once from HEAD with `after`.
  *
  * sbt "runMain graft.tools.PlanDumpR06 <suffix> [q1,q2,...]"
  */
object PlanDumpR06 {
  val touched = Seq(
    "q_dedup_embed", "q_embed_topk", "q_embed_lsh_topk", "q_embed_ivf_topk",
    "q_dedup_components", "q_dedup_jaccard", "q_dedup_jaccard_capped",
    "q_dedup_minhash", "q_dedup_minhash_pairs", "q_dedup_simhash",
    "q_fingerprint", "q_sample_hash", "q_lang_id")

  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "after"
    val names = if (args.length > 1) args(1).split(',').toSeq else touched
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r06"))
    for (q <- names) {
      // q_dedup_components runs its loop eagerly and returns a checkpoint
      // scan (plan-opaque); dump ONE lazy propagation round over its pairs
      // input instead — that is the per-iteration plan the loop executes.
      val df =
        if (q == "q_dedup_components")
          graft.ops.Dedup.auditRoundPlan(graft.ops.Dedup.jaccardPairs(
            spark.read.parquet(s"$sfDir/documents.parquet")
              .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0),
            "doc_id", "text", "source", shingleN = 1, minJaccardPct = 50))
        else graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r06/${q}_$suffix.txt"), txt)
      println(s"[PlanDumpR06] wrote plans/r06/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
