package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

/** Multimodal binary-column plumbing: typed per-partition decode, frame
  * sampling, resize — schema and batch-shape are real, kernels are
  * deterministic stubs. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.withBinary(
    Seq((1L, "abcdefgh" * 10), (2L, "xyz")).toDF("id", "text"), "id", "text")

  test("withBinary + decodeMeta yields stable hashes and bounded dims") {
    val got = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L)._1 == 80 && got(2L)._1 == 3)
    got.values.foreach { case (_, w, h) =>
      assert(w >= 1 && w <= 1280 && h >= 1 && h <= 720)
    }
  }

  test("decodeImageMeta reads true dimensions from real PNG/JPEG bytes") {
    implicit val s = spark
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
      out.toByteArray
    }
    val ds = Seq(
      MediaRecord(1L, imageBytes("png", 17, 9)),
      MediaRecord(2L, imageBytes("jpg", 33, 21)),
      MediaRecord(3L, "not an image at all".getBytes("UTF-8"))).toDS()
    val got = Multimodal.decodeImageMeta(ds).collect()
      .map(m => m.id -> m).toMap
    assert(got(1L).width == 17 && got(1L).height == 9 && got(1L).decoded)
    assert(got(2L).width == 33 && got(2L).height == 21 && got(2L).decoded)
    assert(!got(3L).decoded)
  }

  test("decodeImageMeta fallback is bit-identical to the decodeMeta columns") {
    implicit val s = spark
    val typed = Multimodal.decodeImageMeta(
        media.select(col("id"), col("data")).as[MediaRecord])
      .collect().map(m => (m.id, m.nBytes, m.contentHash, m.width, m.height)).toSet
    val columnar = Multimodal.decodeMeta(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(typed == columnar)
  }

  test("decodeFeatures falls back to the byte histogram on non-images") {
    implicit val s = spark
    val ds = media.select(col("id"), col("data")).as[MediaRecord]
    val feats = Multimodal.decodeFeatures(ds).collect()
      .map(f => f.id -> f).toMap
    assert(feats.keySet == Set(1L, 2L))
    assert(feats.values.forall(!_.decoded)) // text payloads → fallback
    assert(feats(1L).features.length == 8)
    assert(math.abs(feats(1L).features.sum - 1.0) < 1e-9) // L1-normalized
    // ASCII letters land in bucket 3 ('a'=97/32=3) — deterministic fallback
    assert(feats(2L).features(3) == 1.0)
  }

  test("decodeFeatures computes real luminance histograms from pixels") {
    implicit val s = spark
    // 2×2 PNG: two black pixels (lum 0 → bucket 0), one white (255 → 7),
    // one pure red (lum = 299*255/1000 = 76 → bucket 2)
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0xffffff); img.setRGB(1, 1, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val got = Multimodal.decodeFeatures(
      Seq(MediaRecord(7L, out.toByteArray)).toDS()).collect().head
    assert(got.decoded)
    assert(got.features.toSeq == Seq(0.5, 0.0, 0.25, 0.0, 0.0, 0.0, 0.0, 0.25))
  }

  test("sampleFrames keeps every 2nd fixed-size frame with correct bytes") {
    val got = Multimodal.sampleFrames(media, frameSize = 32, every = 2)
      .select(col("id"), col("frame_idx"), length(col("frame")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((1L, 0, 32), (1L, 2, 16), (2L, 0, 3)))
  }

  test("resizeStub halves the payload") {
    val got = Multimodal.resizeStub(media, 50)
      .select(col("id"), length(col("data"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 40, 2L -> 1))
  }

  test("resizeImages scales real image dimensions and re-encodes as PNG") {
    implicit val s = spark
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x3366ff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val ds = Seq(
      MediaRecord(1L, pngBytes(40, 22)),
      MediaRecord(2L, "definitely not pixels".getBytes("UTF-8"))).toDS()
    val out = Multimodal.resizeImages(ds, 50).collect().map(m => m.id -> m).toMap
    assert(out(1L).resized)
    // round-trip the resized bytes through the metadata decoder: true dims
    val meta = Multimodal.decodeImageMeta(
      Seq(MediaRecord(1L, out(1L).data)).toDS()).collect().head
    assert(meta.decoded && meta.width == 20 && meta.height == 11)
    assert(!out(2L).resized)
  }

  test("resizeImages fallback is bit-identical to resizeStub") {
    implicit val s = spark
    val typed = Multimodal.resizeImages(
        media.select(col("id"), col("data")).as[MediaRecord], 50)
      .collect().map(m => (m.id, m.data.toSeq)).toSet
    val columnar = Multimodal.resizeStub(media, 50).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(typed == columnar)
  }
}
