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

  test("decodeFeatures runs per-partition over typed records") {
    implicit val s = spark
    val ds = media.select(col("id"), col("data")).as[MediaRecord]
    val feats = Multimodal.decodeFeatures(ds).collect()
      .map(f => f.id -> f.features).toMap
    assert(feats.keySet == Set(1L, 2L))
    assert(feats(1L).length == 8)
    assert(math.abs(feats(1L).sum - 1.0) < 1e-9) // L1-normalized histogram
    // ASCII letters land in buckets 3 ('a'=97/32=3) — deterministic stub
    assert(feats(2L)(3) == 1.0)
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
}
