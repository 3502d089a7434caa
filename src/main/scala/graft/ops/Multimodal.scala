package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extraction
  * runs batched per partition.
  *
  * SANDBOX STUB NOTE: no image/audio codec libraries exist in this container,
  * so `decodeBatch` extracts a deterministic byte-level feature (a 16-bin byte
  * histogram over the first 4 KiB) as a stand-in for a real decoder. The
  * Spark-side plumbing — schema, metadata, partition-batched UDF shape,
  * column pruning — is real and tested; swapping in a real decoder means
  * replacing ONLY the body of `decodeOne`.
  */
object Multimodal {

  /** Typed metadata derivable without decoding (pure Catalyst; binary
    * built-ins, pushdown-friendly). */
  def withMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(binCol).as("payload"),
      struct(
        length(col(binCol)).cast("long").as("n_bytes"),
        hex(substring(col(binCol), 1, 4)).as("magic"),
        crc32(col(binCol)).as("crc")).as("meta"))

  final case class MediaFeature(media_id: Long, n_bytes: Long,
                                content_sha256: String, histogram: Array[Double])

  /** The per-item "decoder" (STUB — see object scaladoc). Total. Emits the
    * byte-histogram stand-in feature plus a content sha256 (hex) — the digest
    * is the externally-checkable submetric (DuckDB computes the same sha256,
    * so q_media_features carries an exact oracle on real decode-path output). */
  def decodeOne(id: Long, payload: Array[Byte]): MediaFeature = {
    val hist = new Array[Double](16)
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val n = math.min(bytes.length, 4096)
    var i = 0
    while (i < n) { hist((bytes(i) & 0xF0) >> 4) += 1.0; i += 1 }
    if (n > 0) { var b = 0; while (b < 16) { hist(b) /= n; b += 1 } }
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val sha = digest.map(b => f"${b & 0xff}%02x").mkString
    MediaFeature(id, bytes.length.toLong, sha, hist)
  }

  /** Batched feature extraction: mapPartitions over (id, payload) in fixed
    * batch sizes — the same execution shape a vectorized decode (Arrow /
    * pandas-UDF style) uses: amortized per-batch setup, bounded memory. */
  def decodeBatch(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](pairEnc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder context would be initialized here
          batch.iterator.map { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
  }
}
