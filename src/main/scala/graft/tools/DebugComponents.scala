package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev-only: time the FULL q_dedup_components evaluation (loop + count),
  * with per-rep job counts. */
object DebugComponents {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    for (r <- 1 to 8) {
      if (r == 3) spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      if (r == 5) { spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
                    spark.conf.set("spark.sql.adaptive.enabled", "false") }
      if (r == 7) { spark.conf.set("spark.sql.adaptive.enabled", "true")
                    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
                    spark.conf.set("spark.sql.shuffle.partitions", "1") }
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val pairsDf = graft.ops.Dedup.jaccardPairs(
        spark.read.parquet(sfDir + "/documents.parquet")
          .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0),
        "doc_id", "text", "source", shingleN = 1, minJaccardPct = 50)
      val (df, rounds) = graft.ops.Dedup.componentsWithRounds(pairsDf)
      val tMid = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let listener drain
      println(f"[DebugComponents] rep$r: construct=${(tMid - t0) / 1e9}%.3f s " +
        f"count=${(t1 - tMid) / 1e9}%.3f s rows=$n jobs=${jobs.get() - j0} " +
        s"rounds=$rounds aqe=${spark.conf.get("spark.sql.adaptive.enabled")} " +
        s"pf=${spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")}")
    }
    spark.stop()
  }
}
