package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition checkpoint manifest (SURVEY.md §2 A13–A14).
  *
  * The unit of work is `part_id = pmod(xxhash64(url), P)`. A part is committed
  * by appending a manifest row AFTER its partial-triples partition directory
  * is fully written; resume recomputes only part_ids absent from the manifest
  * (left-anti semantics). Partial writes of a crashed part are safe because
  * partial output is written with dynamic partition overwrite — a rerun
  * replaces exactly the partitions it recomputes, making commits idempotent.
  * Manifest rows double as per-partition lineage: input pages, distinct
  * triples, evidence mentions, an order-independent checksum, and the shared
  * wall-clock of the run that committed the part (run-level, not per-part —
  * parts of one run are processed concurrently).
  *
  * All existence probes go through the Hadoop FileSystem API, so the manifest
  * protocol works unchanged when outDir is HDFS/S3 under spark-submit (a
  * java.io.File probe would silently report "absent" there and reprocess —
  * or worse, finalize over nothing).
  */
object Checkpoint {
  final case class ManifestRow(
      part_id: Int, status: String, n_pages: Long, n_triples: Long,
      n_evidence: Long, checksum: Long, wall_ms: Long)

  def manifestPath(outDir: String) = s"$outDir/_manifest"

  /** Hadoop-FS existence probe (works for local, HDFS, S3A, ... paths). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def committedParts(spark: SparkSession, outDir: String): Set[Int] = {
    if (!pathExists(spark, manifestPath(outDir))) Set.empty
    else {
      import spark.implicits._
      spark.read.parquet(manifestPath(outDir))
        .filter(col("status") === "done")
        .select($"part_id").as[Int].collect().toSet
    }
  }

  def commit(spark: SparkSession, outDir: String, rows: Seq[ManifestRow]): Unit = {
    import spark.implicits._
    if (rows.nonEmpty)
      rows.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(manifestPath(outDir))
  }

  /** Per-part lineage stats from a partial-triples frame (one pass; marker
    * rows already filtered out by the caller). `todo` seeds the row set: every
    * attempted part gets a 'done' row even when it held zero in-scope pages or
    * produced zero triples — otherwise an empty part would be missing from the
    * manifest and recomputed on EVERY resume. `pagesByPart` comes from the
    * persisted page-marker rows (Pipeline.run), so no input re-scan is needed.
    * wall_ms is the shared run wall clock (see object scaladoc). */
  def partStats(todo: Seq[Int], partials: DataFrame, pagesByPart: Map[Int, Long],
                wallMs: Long): Seq[ManifestRow] = {
    val byPart = partials
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_triples"), sum(col("n")).as("n_evidence"),
        // xor-fold: order-independent, overflow-free content checksum
        bit_xor(xxhash64(col("subj"), col("pred"), col("obj"), col("n"))).as("checksum"))
      .collect()
      .map(r => r.getAs[Int]("part_id") ->
        (r.getAs[Long]("n_triples"), r.getAs[Long]("n_evidence"), r.getAs[Long]("checksum")))
      .toMap
    todo.map { p =>
      val (t, e, c) = byPart.getOrElse(p, (0L, 0L, 0L))
      ManifestRow(p, "done", pagesByPart.getOrElse(p, 0L), t, e, c, wallMs)
    }
  }
}
