package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: execute a harness query and print its FINAL adaptive plan
  * (post-execution), to confirm runtime exchange/stage reuse claims.
  * sbt "runMain graft.tools.DebugReuse q_dedup_minhash_pairs" */
object DebugReuse {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    // collect() executes df's OWN QueryExecution, so executedPlan below is
    // the post-execution adaptive plan (isFinalPlan=true) with any reuse
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    println("=== final adaptive plan (truncated) ===")
    println(finalPlan.take(6000))
    println("=== reuse nodes ===")
    println("ReusedExchange mentions: " +
      finalPlan.sliding("ReusedExchange".length).count(_ == "ReusedExchange"))
    // evidence mode: write the executed (isFinalPlan=true) plan to a file
    sys.env.get("SPARK_GRAFT_PLAN_OUT").foreach { out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), finalPlan)
      println(s"[DebugReuse] wrote $out")
    }
    spark.stop()
  }
}
