package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as opaque `binary` columns + typed metadata;
  * decode/feature-extraction runs per-partition over the binary batches.
  *
  * All three image kernels are REAL for any format the JDK's
  * `javax.imageio` registry understands (PNG, JPEG, GIF, BMP, WBMP):
  * [[decodeImageMeta]] reads true width/height header-only,
  * [[resizeImages]] does a full decode→bilinear-scale→PNG-re-encode, and
  * [[decodeFeatures]] computes pixel-level luminance-histogram features.
  * Payloads no installed reader recognizes take deterministic
  * byte-level fallbacks (hash dims / prefix slice / byte histogram),
  * each flagged and bit-identical to the corresponding column stub. ML
  * codecs beyond the JDK (video, audio, learned encoders) aren't in the
  * container; the per-partition init slot in each `mapPartitions` kernel
  * is where such a codec/model load would go — the Spark side (schemas,
  * partitioning, typed batch iteration — the Scala analog of
  * pandas-batched UDFs) is what this module locks down.
  */
object Multimodal {

  /** Typed record for one media blob. */
  final case class MediaRecord(id: Long, data: Array[Byte])

  /** Decoded metadata. `decoded` is true when width/height came from a
    * real image header, false when from the hash fallback. */
  final case class MediaMeta(
      id: Long, nBytes: Long, contentHash: String, width: Int, height: Int,
      decoded: Boolean)

  /** Feature vector per media item (what a real feature extractor —
    * CLIP, mel-spectrogram, … — would yield). `decoded` is true when the
    * features came from real pixel data, false when from the byte-level
    * fallback. */
  final case class MediaFeatures(id: Long, features: Array[Double], decoded: Boolean)

  /** Attach a fake binary payload derived from a text column — stands in
    * for reading real image bytes; everything downstream treats it as
    * opaque binary. */
  def withBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("data"))

  /** Column-level metadata "decode": sizes, content hash, and pseudo
    * dimensions derived from the hash — pure codegen'd expressions for
    * pipelines that only need stable per-blob identifiers, not real
    * dimensions. [[decodeImageMeta]] is the real decode; its non-image
    * fallback reproduces these exact values. */
  def decodeMeta(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      length(col("data")).cast("long").as("n_bytes"),
      md5(col("data")).as("content_hash"),
      (Text.md5Long(col("data").cast("string")) % 1280 + 1).cast("int").as("width"),
      (Text.md5Long(concat(col("data").cast("string"), lit("h"))) % 720 + 1).cast("int").as("height"))

  /** Header-only image dimension read via the JDK ImageIO registry: the
    * matching `ImageReader` parses only the header (`getWidth/getHeight`
    * on an unread image index) — no pixel decode, so cost per blob is
    * O(header), not O(pixels). None when no installed reader recognizes
    * the payload. */
  private[multimodal] def imageDimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0)))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Per-partition typed image-metadata decode — REAL width/height for
    * anything `javax.imageio` can read (PNG/JPEG/GIF/BMP headers ship
    * with every JDK), deterministic hash fallback (bit-identical to
    * [[decodeMeta]]'s columns) otherwise, flagged via `decoded`. The
    * digest instance is allocated once per partition — the init-once
    * shape a heavier codec needs. */
  def decodeImageMeta(ds: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      def md5Hex(b: Array[Byte]): String =
        digest.digest(b).map(x => f"$x%02x").mkString
      // first 15 hex chars of md5 as a non-negative long — must stay in
      // lockstep with functions.Text.md5Long
      def md5Long15(b: Array[Byte]): Long =
        java.lang.Long.parseLong(md5Hex(b).substring(0, 15), 16)
      it.map { r =>
        val (w, h, real) = imageDimensions(r.data) match {
          case Some((w, h)) => (w, h, true)
          case None =>
            ((md5Long15(r.data) % 1280 + 1).toInt,
             (md5Long15(r.data ++ "h".getBytes("UTF-8")) % 720 + 1).toInt,
             false)
        }
        MediaMeta(r.id, r.data.length.toLong, md5Hex(r.data), w, h, real)
      }
    }
  }

  /** 8-bucket luminance histogram over real decoded pixels, L1-normalized
    * — deterministic integer Rec.601 luma (`(299r + 587g + 114b) / 1000`,
    * floor division) so results are identical across executor JVMs.
    * None when no installed ImageIO reader recognizes the payload. */
  private[multimodal] def pixelFeatures(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val hist = new Array[Double](8)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
              + 114 * (rgb & 0xFF)) / 1000
            hist(lum / 32) += 1.0
            x += 1
          }
          y += 1
        }
        val n = math.max(1.0, (img.getWidth.toLong * img.getHeight).toDouble)
        Some(hist.map(_ / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-partition typed feature extraction — REAL pixel-level features
    * (L1-normalized 8-bucket luminance histogram, [[pixelFeatures]]) for
    * anything `javax.imageio` can read, deterministic byte-histogram
    * fallback (the byte-level analog: 8 buckets of `byte / 32`,
    * L1-normalized — the original stub, bit-identical) otherwise, flagged
    * via `decoded`. Like [[resizeImages]] this pays full pixel decode per
    * blob — place it after metadata-level filtering. A heavier extractor
    * (CLIP, mel-spectrogram, …) would replace only the per-record body;
    * the per-partition init slot is where its model load belongs. */
  def decodeFeatures(ds: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init happens here (codec/model load in real life)
      def fallback(r: MediaRecord): Array[Double] = {
        // byte-level stand-in: 8-bucket byte histogram, L1-normalized
        val hist = new Array[Double](8)
        r.data.foreach(b => hist((b & 0xFF) / 32) += 1.0)
        val n = math.max(1.0, r.data.length.toDouble)
        hist.map(_ / n)
      }
      it.map { r =>
        pixelFeatures(r.data) match {
          case Some(f) => MediaFeatures(r.id, f, decoded = true)
          case None    => MediaFeatures(r.id, fallback(r), decoded = false)
        }
      }
    }
  }

  /** Video-style frame sampling: treat the binary as fixed-size frames,
    * keep every `every`-th frame. Pure column ops — the explode keeps
    * frame extraction distributed and the scan column-pruned. */
  def sampleFrames(df: DataFrame, frameSize: Int, every: Int): DataFrame = {
    val nFrames = ceil(length(col("data")).cast("double") / frameSize).cast("int")
    df.select(col("id"), col("data"), nFrames.as("n_frames"))
      .select(col("id"), col("data"),
        // guard zero-length media: sequence(0, -1) in Spark is the
        // DESCENDING [0, -1], which would emit phantom frames; empty
        // data emits NO frames (matching the oracle's empty range)
        explode(when(col("n_frames") >= 1,
          sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .filter(col("frame_idx") % every === 0)
      .select(col("id"), col("frame_idx"),
        col("data").substr(col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame"))
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub keeps a deterministic prefix proportional to the scale factor
    * (shape-preserving for pipeline tests). [[resizeImages]] is the real
    * path; its non-image fallback reproduces these exact bytes. */
  def resizeStub(df: DataFrame, scalePercent: Int): DataFrame =
    df.select(col("id"),
      col("data").substr(lit(1),
        greatest((length(col("data")) * scalePercent / 100).cast("int"), lit(1)))
        .as("data"))

  /** One resized blob; `resized` is true when a real decode→scale→encode
    * ran, false when the payload wasn't an image and the deterministic
    * prefix fallback (bit-identical to [[resizeStub]]) applied. */
  final case class MediaResized(id: Long, data: Array[Byte], resized: Boolean)

  /** Real image resize via the JDK: decode with the ImageIO registry,
    * bilinear-scale through `Graphics2D`, re-encode as PNG (the one
    * format every JDK writes losslessly — a deterministic output format
    * keeps results reproducible across executor JVMs). None when no
    * installed reader recognizes the payload. */
  private[multimodal] def resizeImage(
      bytes: Array[Byte], scalePercent: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = math.max(1, img.getWidth * scalePercent / 100)
        val h = math.max(1, img.getHeight * scalePercent / 100)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-partition typed image resize — REAL decode→scale→PNG-re-encode
    * for anything `javax.imageio` can read, deterministic prefix fallback
    * (bit-identical to [[resizeStub]]) otherwise, flagged via `resized`.
    * Unlike [[decodeImageMeta]] this pays full pixel decode per blob —
    * the cost profile of a real media pipeline stage — so it belongs
    * after any metadata-level filtering, not before. */
  def resizeImages(ds: Dataset[MediaRecord], scalePercent: Int)(
      implicit spark: SparkSession): Dataset[MediaResized] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        resizeImage(r.data, scalePercent) match {
          case Some(b) => MediaResized(r.id, b, resized = true)
          case None =>
            val keep = math.max(1, r.data.length * scalePercent / 100)
            MediaResized(r.id, r.data.take(keep), resized = false)
        }
      }
    }
  }
}
