package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only: print the formatted plan and timed stages of one harness query.
  * sbt "runMain graft.tools.DebugPlan q_dedup_embed [sfDir]" */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    println("=== formatted plan ===")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println("=== final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
