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
