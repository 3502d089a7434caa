package graft

import graft.kg.Pipeline
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The continuous-ingest twin must equal the batch pipeline: triples from a
  * corpus streamed in as arriving files — across multiple microbatches and a
  * stream restart — are identical to one batch run over the same corpus
  * (the algebraic-merge argument in StreamingPipeline's scaladoc, made
  * empirical). */
class StreamingPipelineSpec extends AnyFunSuite with SharedSpark {

  private def stage(df: org.apache.spark.sql.DataFrame, dir: Path, prefix: String): Unit = {
    val tmp = Files.createTempDirectory("stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).forEach { f =>
      Files.copy(f, dir.resolve(s"$prefix-${f.getFileName}"),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("streamed ingest across waves + restart == batch pipeline") {
    val inDir = Files.createTempDirectory("stream_in")
    val outDir = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val model = KgTestModel.model(spark)
    val cfg = Pipeline.Config(fixturesDir = "", outDir = outDir, numParts = 8)

    val webpages = spark.read.parquet(s"${SparkKit.sf0001}/webpages.parquet")
    val waveKey = pmod(xxhash64(col("url")), lit(3L))

    // wave 1: two thirds of the corpus, split into >1 microbatch
    stage(webpages.filter(waveKey < 2), inDir, "wave1a")
    stage(webpages.filter(waveKey === 0), inDir, "wave1b") // overlap is fine: distinct files, union of pages below
    val q = StreamingPipeline.start(spark, inDir.toString, model, cfg, ckpt,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()

    // wave 2 lands AFTER a stop — the restarted stream must pick up only the
    // new files (checkpointed file log), not reprocess wave 1
    stage(webpages.filter(waveKey === 2), inDir, "wave2")
    val q2 = StreamingPipeline.start(spark, inDir.toString, model, cfg, ckpt,
      maxFilesPerTrigger = 1)
    try q2.processAllAvailable() finally q2.stop()

    // batch reference over the SAME logical corpus (wave1a ∪ wave1b ∪ wave2
    // = pages with key<2 twice-staged for key 0 + key 2) — the streamed
    // input duplicates key-0 pages (two distinct files), so the reference
    // must too: canonicalization is over page OCCURRENCES, not urls
    val batchInput = webpages.filter(waveKey < 2)
      .union(webpages.filter(waveKey === 0))
      .union(webpages.filter(waveKey === 2))
    val expected = Pipeline.triples(spark, batchInput, model, cfg)
      .collect().map(_.toSeq).toSet
    val streamed = StreamingPipeline.finalizeTriples(spark, outDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == expected,
      s"streamed != batch: only-streamed=${(streamed -- expected).take(3)} " +
        s"only-batch=${(expected -- streamed).take(3)}")
    assert(streamed.nonEmpty, "empty result would be a vacuous pass")

    // the restart processed only wave2's file: batch_id partitions exist
    // from both runs, and re-running with no new files adds nothing
    val q3 = StreamingPipeline.start(spark, inDir.toString, model, cfg, ckpt,
      maxFilesPerTrigger = 1)
    try q3.processAllAvailable() finally q3.stop()
    val streamedAgain = StreamingPipeline.finalizeTriples(spark, outDir)
      .collect().map(_.toSeq).toSet
    assert(streamedAgain == expected, "idle restart must not change triples")
  }
}
