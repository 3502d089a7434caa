package graft

import graft.fixtures.Gen
import graft.kg.{KgModel, Pipeline, Stages}
import org.apache.spark.sql.SparkSession

/** Scaling benchmark for the north rule (BASELINE.json:2,14): run the full
  * KG pipeline end-to-end (first action → output-table commit) on the same
  * webtext fixture at two parallelism levels and report throughput at both
  * plus efficiency = (thr_4N / thr_N) / 4. No real cluster exists in the
  * sandbox, so cluster sizes N and 4N are substituted by local[cpus] levels
  * (driver-sanctioned, SURVEY.md §0).
  *
  *   sbt "runMain graft.PipelineBench <cpus> <sf> [runs]"
  *
  * Prints one JSON line per run plus a median summary; BENCH/BASELINE.md
  * aggregates the two levels.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val sf = if (args.length > 1) args(1).toDouble else 0.1
    val runs = if (args.length > 2) args(2).toInt else 3
    // "norepart": extract on input splits instead of the explicit url-hash
    // exchange (quantifies the repartition's cost; SURVEY.md §4.2.1)
    val repartitionInput = !(args.length > 3 && args(3) == "norepart")
    val fixDir = s"/root/repo/fixtures/sf$sf"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pipeline-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Gen.generate(spark, fixDir, Gen.pageCount(sf)) // idempotent
    val model = KgModel.load(spark, fixDir)
    val webpages = spark.read.parquet(s"$fixDir/webpages.parquet")
    val nPages = webpages.count() // warm file listing/footers out of the timed path

    val parts = math.max(4 * cpus, 32)
    var triplesOut = 0L
    def oneRun(r: Int, timed: Boolean): Double = {
      val out = java.nio.file.Files.createTempDirectory(s"bench-$cpus-$r").toString
      val t0 = System.nanoTime()
      val rels = Stages.extractRelations(webpages, model, Seq("en"), parts, repartitionInput)
      val triples = Stages.mergeTriples(Stages.partialTriples(rels))
      triples.write.mode("overwrite").parquet(s"$out/triples")
      val sec = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(s"$out/triples").count()
      triplesOut = n
      if (timed)
        println(f"""{"bench":"pipeline","cpus":$cpus,"sf":$sf,"run":$r,"pages":$nPages,"triples":$n,"sec":$sec%.3f,"triples_per_sec":${n / sec}%.1f}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      sec
    }
    oneRun(0, timed = false) // warmup: JIT + codegen compile excluded
    val secs = (1 to runs).map(oneRun(_, timed = true))
    val med = secs.sorted.apply((secs.length - 1) / 2)
    println(f"""{"bench":"pipeline-median","cpus":$cpus,"sf":$sf,"pages":$nPages,"triples":$triplesOut,"median_sec":$med%.3f,"triples_per_sec":${triplesOut / med}%.1f}""")
    spark.stop()
  }
}
