package graft

import graft.kg.{Checkpoint, Pipeline, Stages}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

/** Single-pass lineage (SURVEY.md §2 A14): a checkpointed Pipeline.run must
  * scan the webpages INPUT exactly once — page counts and the present-part
  * commit rule ride marker rows persisted with the partials, not extra input
  * scans (at 100 TB an extra scan is an extra pass over the corpus). */
class LineageSpec extends AnyFunSuite with SharedSpark {

  private def awaitQuietBus(total: AtomicInteger): Unit = {
    var last = -1
    var stable = 0
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (stable < 3 && System.nanoTime() < deadline) {
      val t = total.get()
      if (t == last) stable += 1 else { stable = 0; last = t }
      Thread.sleep(200)
    }
  }

  test("Pipeline.run scans the webpages input exactly once") {
    val dir = SparkKit.sf0001
    val pagesPath = s"$dir/webpages.parquet"
    val out = java.nio.file.Files.createTempDirectory("lineage").toString
    val inputScans = new AtomicInteger(0)
    val total = new AtomicInteger(0)
    val listener = new QueryExecutionListener {
      private def hits(qe: QueryExecution): Int =
        qe.analyzed.collect {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation
                if fs.location.rootPaths.exists(_.toString.contains("webpages.parquet")) => 1
            case _ => 0
          }
        }.sum
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        hits(qe) match { case h => inputScans.addAndGet(h) }
        total.incrementAndGet()
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
        total.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      awaitQuietBus(total) // drain events from earlier suites on the shared session
      inputScans.set(0)
      Pipeline.run(spark, pagesPath, Pipeline.Config(dir, out, numParts = 4))
      awaitQuietBus(total)
      assert(inputScans.get() == 1,
        s"Pipeline.run must read the input exactly once, saw ${inputScans.get()} scans")
    } finally spark.listenerManager.unregister(listener)
  }

  test("page markers: persisted counts equal the in-scope page count per part") {
    val dir = SparkKit.sf0001
    val pagesPath = s"$dir/webpages.parquet"
    val out = java.nio.file.Files.createTempDirectory("lineage-markers").toString
    Pipeline.run(spark, pagesPath, Pipeline.Config(dir, out, numParts = 4))

    val partials = spark.read.schema(Pipeline.partialsSchema)
      .parquet(Pipeline.partialsPath(out))
    // markers never leak into the merged output
    val triples = spark.read.parquet(Pipeline.triplesPath(out))
    assert(triples.filter(col("subj").isNull).count() == 0L)

    // per-part in-scope marker counts == independent recount of the input
    val markerCounts = partials.filter(col("subj").isNull &&
        col("pred") === Stages.PageMarkerIn)
      .groupBy("part_id").agg(sum("n").as("n_pages"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(pagesPath)
      .filter(col("lang") === "en" && col("html").isNotNull)
      .groupBy(pmod(xxhash64(col("url")), lit(4L)).cast("int").as("part_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(markerCounts == expected, s"$markerCounts != $expected")

    // manifest page totals come from the markers
    val manifest = spark.read.parquet(Checkpoint.manifestPath(out))
    val manifestPages = manifest.select("part_id", "n_pages")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    expected.foreach { case (p, n) => assert(manifestPages(p) == n) }
  }
}
