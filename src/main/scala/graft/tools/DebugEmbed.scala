package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, HashMode, Similarity}

/** Dev-only: decompose q_dedup_embed cost. */
object DebugEmbed {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(name: String)(f: => Unit): Unit =
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[DebugEmbed] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    // 1. bucket+norm projection only
    val b = emb.select(col("vec_id").as("vid"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("n"),
      Similarity.lshBucket(col("embedding"), 64, 4, HashMode.PortableMd5).as("bucket"))
    time("bucket+norm only") { b.write.format("noop").mode("overwrite").save() }
    // 2. bucket distribution
    b.groupBy(col("bucket")).count().orderBy(desc("count")).show(20)
    // 3. join only, no cosine
    val joined = b.as("a").join(b.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
    time("join only") { joined.select(col("a.vid"), col("b.vid")).write.format("noop").mode("overwrite").save() }
    println("[DebugEmbed] pairs=" + joined.count())
    // 4. full
    val full = Dedup.embeddingPairs(emb, "vec_id", "embedding",
      dims = 64, planes = 4, minCosine = 0.35, mode = HashMode.PortableMd5)
    time("full") { full.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
