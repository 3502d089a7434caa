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

  test("kill-mid-microbatch replay: same batch_id overwrite is idempotent") {
    // The sharpest edge of the exactly-once claim: a batch whose DATA landed
    // (possibly torn) but whose checkpoint COMMIT did not. Simulated
    // deterministically by deleting the last commits/<N> marker — Structured
    // Streaming then re-runs batch N from offsets/<N> (same batch_id, same
    // files) on restart — and by tearing that batch's partial output first.
    // Dynamic partition overwrite must REPLACE batch_id=N wholesale, not
    // append to the torn remains.
    val inDir = Files.createTempDirectory("replay_in")
    val outDir = Files.createTempDirectory("replay_out").toString
    val ckpt = Files.createTempDirectory("replay_ckpt")
    val model = KgTestModel.model(spark)
    val cfg = Pipeline.Config(fixturesDir = "", outDir = outDir, numParts = 8)

    val webpages = spark.read.parquet(s"${SparkKit.sf0001}/webpages.parquet")
    val waveKey = pmod(xxhash64(col("url")), lit(3L))
    (0L until 3L).foreach(k => stage(webpages.filter(waveKey === k), inDir, s"f$k"))

    val q = StreamingPipeline.start(spark, inDir.toString, model, cfg,
      ckpt.toString, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    val expected = StreamingPipeline.finalizeTriples(spark, outDir)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)

    // crash simulation: drop the newest commit marker...
    val commits = Files.list(ckpt.resolve("commits")).iterator()
    var last = -1L
    commits.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.forall(_.isDigit)) last = math.max(last, n.toLong)
    }
    assert(last >= 2, s"expected >=3 committed batches, got ${last + 1}")
    Files.delete(ckpt.resolve("commits").resolve(last.toString))
    // the local FS keeps a checksum sidecar; a leftover .N.crc fails the
    // replayed commit's rename
    Files.deleteIfExists(ckpt.resolve("commits").resolve(s".$last.crc"))
    // ...and tear that batch's landed partials (half-written output)
    val partDir = Paths.get(StreamingPipeline.partialsPath(outDir), s"batch_id=$last")
    val torn = Files.list(partDir).filter(_.toString.endsWith(".parquet")).findFirst()
    assert(torn.isPresent, s"no data files under $partDir")
    Files.delete(torn.get())

    // restart: batch `last` replays under the SAME batch_id and must rebuild
    // its partition wholesale; no new batch ids may appear
    val q2 = StreamingPipeline.start(spark, inDir.toString, model, cfg,
      ckpt.toString, maxFilesPerTrigger = 1)
    try q2.processAllAvailable() finally q2.stop()
    val replayed = StreamingPipeline.finalizeTriples(spark, outDir)
      .collect().map(_.toSeq).toSet
    assert(replayed == expected,
      s"replay changed triples: missing=${(expected -- replayed).take(3)} " +
        s"extra=${(replayed -- expected).take(3)}")
    val batchDirs = Files.list(Paths.get(StreamingPipeline.partialsPath(outDir)))
      .filter(_.getFileName.toString.startsWith("batch_id=")).count()
    assert(batchDirs == last + 1, s"replay must not mint new batch ids ($batchDirs)")
  }
}
