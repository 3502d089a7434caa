package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extraction
  * runs batched per partition.
  *
  * Image payloads are REALLY decoded with the JDK's built-in `javax.imageio`
  * (PNG/JPEG/GIF/BMP — ships with JDK 17, zero external codecs): decoded
  * width/height plus a 16-bin luminance histogram over every pixel.
  * MultimodalDecodeSpec checks the decode against fixture PNGs with PLANTED
  * dimensions and pixel grids (PNG is lossless, so pixel recovery is exact).
  * Non-image payloads (magic sniff miss, or a corrupt image stream) fall back
  * to a deterministic byte-level feature — a 16-bin byte histogram over the
  * first 4 KiB — with null dimensions; the sha256 submetric rides the same
  * path either way and carries the DuckDB oracle (q_media_features).
  */
object Multimodal {

  // ImageIO's default ImageInputStream spills to a disk cache; decoding
  // in-memory byte arrays should stay allocation-only on executors
  javax.imageio.ImageIO.setUseCache(false)

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

  /** width/height are decoded (None for non-image payloads); histogram is
    * 16-bin luminance over pixels for images, 16-bin byte histogram over the
    * first 4 KiB otherwise — both L1-normalized. */
  final case class MediaFeature(media_id: Long, n_bytes: Long,
                                content_sha256: String,
                                width: Option[Int], height: Option[Int],
                                histogram: Array[Double])

  /** Cheap magic sniff for the formats the JDK decodes — avoids handing every
    * non-image payload (the common case in a mixed corpus) to ImageIO's
    * reader-discovery scan. */
  private def looksLikeImage(b: Array[Byte]): Boolean = b.length >= 4 && (
    (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Pixel-count cap before any decode allocation: a crafted/corrupt header
    * declaring huge dimensions must not make ImageIO allocate w*h pixels on
    * an executor (untrusted-corpus OOM). Dimensions are read from the
    * ImageReader HEADER first; over-cap payloads take the byte-histogram
    * fallback. Conf-tunable via spark.graft.multimodal.maxPixels. */
  val MaxPixelsDefault: Long = 64L * 1024 * 1024

  /** The per-item decoder. Total: decode failures (truncated/corrupt image
    * bytes) degrade to the byte-level fallback, never throw. The sha256 hex
    * digest is the externally-checkable submetric (DuckDB computes the same
    * sha256, so q_media_features carries an exact oracle on real decode-path
    * output); decoded dimensions are checked against planted fixture metadata
    * by MultimodalDecodeSpec. */
  def decodeOne(id: Long, payload: Array[Byte]): MediaFeature =
    decodeOne(id, payload, MaxPixelsDefault)

  def decodeOne(id: Long, payload: Array[Byte], maxPixels: Long): MediaFeature = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val sha = digest.map(b => f"${b & 0xff}%02x").mkString
    val img =
      if (!looksLikeImage(bytes)) null
      else try {
        // header-first: never hand the stream to a full decode before the
        // declared dimensions pass the pixel cap
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              val w = r.getWidth(0)
              val h = r.getHeight(0)
              if (w <= 0 || h <= 0 || w.toLong * h.toLong > maxPixels) null
              else r.read(0)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => null } // corrupt stream -> fallback
    val hist = new Array[Double](16)
    if (img != null) {
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum >> 4) += 1.0
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h.toLong).toDouble // long math: w*h can pass 2^31
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      MediaFeature(id, bytes.length.toLong, sha, Some(w), Some(h), hist)
    } else {
      val n = math.min(bytes.length, 4096)
      var i = 0
      while (i < n) { hist((bytes(i) & 0xF0) >> 4) += 1.0; i += 1 }
      if (n > 0) { var b = 0; while (b < 16) { hist(b) /= n; b += 1 } }
      MediaFeature(id, bytes.length.toLong, sha, None, None, hist)
    }
  }

  /** Batched feature extraction: mapPartitions over (id, payload) in fixed
    * batch sizes — the same execution shape a vectorized decode (Arrow /
    * pandas-UDF style) uses: amortized per-batch setup, bounded memory. */
  def decodeBatch(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val maxPixels = spark.conf.get("spark.graft.multimodal.maxPixels",
      MaxPixelsDefault.toString).toLong
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](pairEnc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder context would be initialized here
          batch.iterator.map { case (id, bytes) => decodeOne(id, bytes, maxPixels) }
        }
      }
  }
}
