package graft

import org.apache.spark.sql.functions._
import graft.similarity.{IndexStore, Similarity}

/** Persisted IVF-PQ index: the save/load/search round-trip must be
  * bit-identical to the direct [[Similarity.ivfPqTopK]] operator — that
  * is the whole contract (the serving path amortizes the corpus-side
  * build across query batches without changing a single result). */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  /** Deterministic synthetic embeddings: 2 well-separated buckets. */
  private def vecs(n: Int) = (0 until n).map { i =>
    val base = if (i % 2 == 0) 1.0 else -1.0
    (i.toLong, (i % 2).toString,
      (0 until dims).map(d => base + 0.01 * ((i * 7 + d * 3) % 11)).toArray)
  }.toDF("id", "bucket", "vec")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("saved index search is bit-identical to the direct operator") {
    for (residual <- Seq(false, true)) {
      val corpus = vecs(20)
      val queries = vecs(31).filter(col("id") % 3 === 0).select("id", "vec")
      val direct = Similarity.ivfPqTopK(
          queries, corpus, k = 3, dims = dims, subspaces = 4,
          codebookSize = 8, rankScale = 9, residual = residual)
        .select("left_id", "rank", "right_id", "adc")
        .orderBy("left_id", "rank").collect()
      val path = tmp(s"ivfpq_$residual")
      IndexStore.save(IndexStore.buildIvfPq(
        corpus, dims = dims, subspaces = 4, codebookSize = 8,
        residual = residual), path)
      val loaded = IndexStore.load(spark, path)
      assert(loaded.dims == dims && loaded.subspaces == 4 &&
        loaded.codebookSize == 8 && loaded.residual == residual)
      val fromIndex = IndexStore.search(queries, loaded, k = 3, rankScale = 9)
        .select("left_id", "rank", "right_id", "adc")
        .orderBy("left_id", "rank").collect()
      assert(direct.nonEmpty && fromIndex.toSeq == direct.toSeq,
        s"round-trip drift (residual=$residual)")
    }
  }

  test("search derives every knob from the persisted meta") {
    val path = tmp("ivfpq_meta")
    IndexStore.save(IndexStore.buildIvfPq(
      vecs(10), dims = dims, subspaces = 2, codebookSize = 4), path)
    val idx = IndexStore.load(spark, path)
    assert(idx.subspaces == 2 && idx.codebookSize == 4 && !idx.residual)
    // codes really are the compressed layout: subspaces ints per row
    val width = idx.codes.select(size(col("codes"))).distinct().collect()
    assert(width.map(_.getInt(0)).toSeq == Seq(2))
  }

  test("serveIvfPq batch parity: streaming-safe plan equals IndexStore.search") {
    implicit val sp = spark
    for ((residual, probes) <- Seq((false, 1), (true, 2))) {
      val corpus = vecs(24)
      val queries = vecs(33).filter(col("id") % 3 === 0).select("id", "vec")
      val idx = IndexStore.buildIvfPq(
        corpus, dims = dims, subspaces = 4, codebookSize = 8, residual = residual)
      val direct = IndexStore.search(queries, idx, k = 3, probes = probes, rankScale = 9)
        .select("left_id", "rank", "right_id", "adc")
        .orderBy("left_id", "rank").collect()
      val served = graft.streaming.AnnServing
        .serveIvfPq(queries, idx, k = 3, probes = probes, rankScale = 9)
        .toDF().select("left_id", "rank", "right_id", "adc")
        .orderBy("left_id", "rank").collect()
      assert(direct.nonEmpty && served.toSeq == direct.toSeq,
        s"serve drift (residual=$residual probes=$probes)")
    }
  }

  test("appendIvfPq ingests a delta against fixed centroids") {
    val base = vecs(20)
    val idx = IndexStore.buildIvfPq(base, dims = dims, subspaces = 4, codebookSize = 8)
    // bucketless delta routed through assignBuckets: vectors built like
    // parity-0/1 rows land in their respective clusters
    val delta = vecs(28).filter(col("id") >= 20).select("id", "vec")
    val assigned = IndexStore.assignBuckets(delta, idx)
    assert(assigned.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      (20L until 28L).map(i => ((i % 2).toString, i)).toSet,
      "nearest-centroid assignment must recover the generating cluster")
    val grown = IndexStore.appendIvfPq(idx, assigned)
    assert(grown.codes.count() == 28)
    // appended vectors are reachable: a cluster-1 query probes bucket 1
    // and must now see delta members among its top hits (PQ codes are
    // quantized, so assert reachability/cluster, not exact self-match)
    val q = delta.filter(col("id") === 27)
    val top = IndexStore.search(q, grown, k = 28, rankScale = 9).collect()
    assert(top.nonEmpty && top.forall(_.getAs[Long]("right_id") % 2 == 1),
      s"cluster-1 query must stay in bucket 1, got ${top.toSeq}")
    assert(top.exists(_.getAs[Long]("right_id") >= 21),
      s"delta members must be reachable after append, got ${top.toSeq}")
    // unknown buckets are rejected loudly
    val bad = base.limit(1).withColumn("bucket", lit("nope"))
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendIvfPq(idx, bad)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("load fails loudly on a corrupt meta file") {
    val path = tmp("ivfpq_bad")
    IndexStore.save(IndexStore.buildIvfPq(vecs(10), dims = dims), path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/meta.json"), """{"oops":1}""")
    // drop the local-FS checksum shadow so the corrupt content is read
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/.meta.json.crc"))
    val e = intercept[IllegalArgumentException] {
      IndexStore.load(spark, path)
    }
    assert(e.getMessage.contains("meta"))
  }
}
