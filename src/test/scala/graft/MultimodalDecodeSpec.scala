package graft

import graft.fixtures.Gen
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode (VERDICT r4 Next #4): Multimodal.decodeOne runs the
  * JDK's ImageIO on fixture PNGs with PLANTED dimensions and pixel grids —
  * decoded width/height must equal the planted metadata for every fixture
  * row, and the luminance histogram must match a direct computation over the
  * planted pixels (PNG is lossless). Corrupt and non-image payloads must
  * degrade to the byte-level fallback, never throw. */
class MultimodalDecodeSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("decoded dimensions == planted fixture metadata for every media row") {
    val dir = SparkKit.sf0001
    val media = spark.read.parquet(s"$dir/media.parquet")
    assert(media.count() == 64)
    val decoded = Multimodal.decodeBatch(
      spark, media.select($"media_id", $"payload").withColumn("payload", $"payload"),
      batchSize = 7).toDF()
    val joined = decoded.join(media.select($"media_id", $"width".as("planted_w"),
        $"height".as("planted_h")), "media_id")
    val bad = joined.filter(
      $"width".isNull || $"height".isNull ||
        $"width" =!= $"planted_w" || $"height" =!= $"planted_h").count()
    assert(bad == 0, "decoded dimensions differ from planted metadata")
  }

  test("luminance histogram matches a direct computation over planted pixels") {
    val (w, h, px) = Gen.mediaPlan(3L)
    val feat = Multimodal.decodeOne(3L, Gen.pngBytes(w, h, px))
    assert(feat.width.contains(w) && feat.height.contains(h))
    val want = new Array[Double](16)
    px.foreach { rgb =>
      val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
        (rgb & 0xFF) * 114) / 1000
      want(lum >> 4) += 1.0
    }
    (0 until 16).foreach(i => want(i) /= (w * h).toDouble)
    assert(feat.histogram.toSeq == want.toSeq)
    assert(math.abs(feat.histogram.sum - 1.0) < 1e-9)
  }

  test("corrupt image bytes and non-image payloads fall back, never throw") {
    val (w, h, px) = Gen.mediaPlan(5L)
    val truncated = Gen.pngBytes(w, h, px).take(10) // PNG magic, dead stream
    val f1 = Multimodal.decodeOne(5L, truncated)
    assert(f1.width.isEmpty && f1.height.isEmpty && f1.n_bytes == 10)
    val f2 = Multimodal.decodeOne(6L, "just some text".getBytes("UTF-8"))
    assert(f2.width.isEmpty && f2.height.isEmpty)
    assert(math.abs(f2.histogram.sum - 1.0) < 1e-9)
    val f3 = Multimodal.decodeOne(7L, null)
    assert(f3.n_bytes == 0 && f3.width.isEmpty)
  }

  test("header-declared huge dimensions fall back BEFORE any pixel allocation") {
    // Take a valid planted PNG and patch its IHDR to declare 1e9 x 1e9
    // pixels, re-fixing the IHDR CRC so the reader parses the header cleanly
    // and reports the huge dimensions — the pixel-count cap (not a CRC or
    // decode error) must route it to the byte-histogram fallback.
    val (w, h, px) = Gen.mediaPlan(9L)
    val png = Gen.pngBytes(w, h, px).clone()
    def putInt(off: Int, v: Int): Unit = {
      png(off) = (v >>> 24).toByte; png(off + 1) = (v >>> 16).toByte
      png(off + 2) = (v >>> 8).toByte; png(off + 3) = v.toByte
    }
    // layout: 8-byte sig, 4-byte len, "IHDR", 13 data bytes, 4-byte CRC
    putInt(16, 1000000000) // width
    putInt(20, 1000000000) // height
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 4 + 13) // over "IHDR" + data
    putInt(29, crc.getValue.toInt)
    val f = Multimodal.decodeOne(9L, png)
    assert(f.width.isEmpty && f.height.isEmpty,
      s"cap must reject 1e18 declared pixels, got ${f.width}x${f.height}")
    assert(f.n_bytes == png.length && f.content_sha256.nonEmpty)
    // a generous cap admits the same payload's real decode attempt path
    // (the patched stream then fails decode and still falls back safely)
    val g = Multimodal.decodeOne(9L, png, maxPixels = Long.MaxValue)
    assert(g.width.isEmpty || g.width.contains(1000000000))
  }
}
