package graft

import graft.kg.Pipeline
import org.apache.spark.sql.SparkSession

/** spark-submit entry point (BASELINE.json:6 "run end-to-end via
  * spark-submit"):
  *
  *   spark-submit --class graft.Main relation_extractionspark.jar \
  *     <webpagesPath> <fixturesDir> <outDir> [numParts] [langs]
  *
  * On a cluster, master/executors come from spark-submit; in the sandbox the
  * builder defaults to local[*]. Rerunning after a failure resumes from the
  * per-partition checkpoint manifest in <outDir>.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Main <webpagesPath> <fixturesDir> <outDir> [numParts] [langs]")
    val webpagesPath = args(0)
    val fixturesDir = args(1)
    val outDir = args(2)
    val numParts = if (args.length > 3) args(3).toInt else 64
    val langs = if (args.length > 4) args(4).split(',').toSeq else Seq("en")

    val builder = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate silently degrades to SORT-based aggregation after
      // 128 distinct keys per task (the Spark default, sized for huge agg
      // buffers). Our min_str buffers are single short strings and phase-1
      // canonicalization has thousands of keys per partition, so the planned
      // hash agg was running mostly as a sort (visible as UnsafeKVExternalSorter
      // in a JFR profile; wall-neutral at bench scale, but the hash path is the
      // intended shape and 1M keys x ~100 B buffers stays ~100 MB per task —
      // beyond that the key-count fallback IS the spill mechanism, kept on.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // declarative twin of `--conf spark.sql.extensions=graft.GraftExtensions`
      // (graft functions + BandJoinRule land in every session of this app;
      // idempotent with the conf form — injection registrations are
      // create-or-replace and the optimizer rule is idempotent by pattern)
      .withExtensions(graft.plans.GraftExtensions)
    val spark = (if (sys.env.contains("SPARK_MASTER") || sys.props.contains("spark.master"))
      builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stats = Pipeline.run(spark, webpagesPath,
      Pipeline.Config(fixturesDir, outDir, langs, numParts))
    println(s"[graft.Main] parts=${stats.partsProcessed}+${stats.partsSkipped} " +
      s"pages=${stats.pages} triples=${stats.triples} wall_ms=${stats.wallMs}")
    spark.stop()
  }
}
