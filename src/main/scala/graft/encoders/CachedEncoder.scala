package graft.encoders

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

import graft.core.{EmbeddingStore, EntityFrame}

/** S7 embedding-cache decorator — the reference's probe/load-or-encode
  * flow (blockers/embedding/blocker.py:162-239, encoder_experiment.py:
  * 21-36): "encode once, block many times". Wraps any [[FrameEncoder]];
  * on encode it probes `dir/<tableName>.parquet` and loads if present,
  * otherwise runs the inner encoder, SAVES, and reads back. The cache
  * key is the frame's table name, so a two-sided dataset caches each
  * side independently.
  *
  * The miss path writes eagerly (the save is an action) — deliberate:
  * it materializes the encode exactly once even when the downstream
  * blocker's plan would otherwise evaluate the encoder subtree in
  * several branches, and it makes the encode cost OBSERVABLE as a phase
  * (`nanosSpent` accumulates wall time inside encode calls; a cache hit
  * is a lazy parquet read ≈ 0). `--force-encode` re-encodes and
  * overwrites.
  *
  * Scale note: the cache is a plain parquet table of (id, vec) — the
  * shape embeddings arrive in from any external inference job (SURVEY
  * M6/M7), so a cluster deployment can point `dir` at the inference
  * output and skip in-engine encoding entirely.
  */
final case class CachedEncoder(
    inner: FrameEncoder, dir: String, force: Boolean = false)
    extends FrameEncoder {

  val nanosSpent = new AtomicLong(0L)
  val misses = new AtomicLong(0L)

  override def encode(
      frame: EntityFrame, rel: Option[DataFrame] = None): DataFrame = {
    val t0 = System.nanoTime()
    val spark = frame.df.sparkSession
    val path = s"$dir/${frame.tableName}.parquet"
    val out =
      if (!force && EmbeddingStore.exists(spark, path) && metaMatches(path))
        EmbeddingStore.load(spark, path)
      else {
        misses.incrementAndGet()
        EmbeddingStore.save(inner.encode(frame, rel), path)
        writeMeta(path)
        EmbeddingStore.load(spark, path)
      }
    nanosSpent.addAndGet(System.nanoTime() - t0)
    out
  }

  def secondsSpent: Double = nanosSpent.get() / 1e9

  // Stale-cache guard: the cache key is only the TABLE NAME, so a warm
  // dir reused with a different encoder config (e.g. --dims changed)
  // would silently serve wrong-dimension vectors. A sidecar records the
  // inner encoder's configuration (case-class toString — dims etc. are
  // constructor params); mismatch → treated as a miss and re-encoded.
  // A DATASET change is the caller's responsibility (one cache dir per
  // dataset, like the reference's per-dataset cache layout) — hashing
  // the corpus here would cost what the cache saves.
  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def metaMatches(path: String): Boolean =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val (f, p) = fs(spark, s"$path.encoder")
      f.exists(p) && {
        val in = f.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim == inner.toString
        finally in.close()
      }
    } catch { case _: Exception => false }

  private def writeMeta(path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val (f, p) = fs(spark, s"$path.encoder")
    val out = f.create(p, true)
    try out.write((inner.toString + "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
