package graft.blockers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.functions.{MinHash, Text}

/** MinHash-LSH blocking (reference src/klinker/blockers/lsh.py:99-213):
  * tokenize each entity's concatenated text, MinHash-sign it, and block
  * entities whose signatures collide in at least one LSH band.
  *
  * Fully distributed — unlike the reference, which mutates a driver-side
  * datasketch index inside map_partitions (lsh.py:188-203, only correct
  * single-process; SURVEY.md M1). Band collisions here are a plain
  * shuffle on the band key.
  */
final case class MinHashLSHBlocker(
    numPerm: Int = 32,
    bands: Int = 8,
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords,
    // F1 tokenizer seam (the TokenBlocker contract): full concat-text →
    // token-array mapping, filters included; None = pinned regex
    tokenizer: Option[Column => Column] = None) extends Blocker {

  private[graft] def tokens(f: EntityFrame): DataFrame = {
    val conc = col(EntityFrame.ConcCol)
    val toks = tokenizer.map(_(conc))
      .getOrElse(Text.tokenize(conc, minTokenLength, stopwords))
    f.concatValues()
      .select(col(f.idCol).cast("string").as("id"), explode(toks).as("key"))
      .distinct()
  }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks =
    Blocker.blockJoin(
      MinHash.buckets(tokens(left), numPerm, bands),
      MinHash.buckets(tokens(right), numPerm, bands))
}

object MinHashLSHBlocker {
  /** The reference's user-facing contract (lsh.py:127-141: give a Jaccard
    * `threshold` and FP/FN `weights`, get tuned banding): derive (b, r)
    * via [[MinHash.optimalParam]] and sign with exactly b·r permutations
    * (datasketch signs with numPerm and bands over the b·r ≤ numPerm
    * prefix — identical banding, fewer wasted hashes here). */
  def fromThreshold(
      threshold: Double = 0.5,
      numPerm: Int = 128,
      weights: (Double, Double) = (0.5, 0.5),
      minTokenLength: Int = 3,
      stopwords: Seq[String] = Text.Stopwords,
      tokenizer: Option[Column => Column] = None): MinHashLSHBlocker = {
    val (b, r) = MinHash.optimalParam(threshold, numPerm, weights._1, weights._2)
    MinHashLSHBlocker(numPerm = b * r, bands = b, minTokenLength, stopwords, tokenizer)
  }
}

/** TF-IDF filtered token blocking (reference token_blocking.py:251-384):
  * drop each document's low-signal tokens before blocking. Weight =
  * tf · idf with smooth idf = ln((1+N)/(1+df)) + 1, L2-normalized per
  * document (sklearn TfidfVectorizer defaults, which the reference uses);
  * tokens with normalized weight < `threshold` are dropped, then normal
  * token blocking runs on the survivors.
  *
  * Relational formulation (SURVEY.md M3): token counts + doc frequencies
  * are two aggregations; the per-doc L2 norm is a third. Everything
  * stays in DataFrame land — no CountVectorizer vocabulary broadcast.
  */
final case class TfIdfFilteredTokenBlocker(
    threshold: Double = 0.1,
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords,
    tokenizer: Option[Column => Column] = None) extends Blocker {

  /** (id, key) pairs surviving the per-doc tf-idf threshold.
    *
    * The term-frequency frame feeds four consumers (N frame, doc
    * frequencies, the weight join, the per-doc norms) — persist it so the
    * tokenize+aggregate pipeline runs once, not 4×. N rides IN-PLAN as a
    * one-row crossJoin(broadcast) (the countEntitiesFrame pattern) rather
    * than a separate driver count() action per side — the whole blocking
    * is then ONE job, and the double arithmetic (1.0 + N as double) is
    * unchanged. The cache is GC-unpersisted by Spark's ContextCleaner
    * once the returned plan is unreachable. */
  private[graft] def filteredTokens(f: EntityFrame): DataFrame = {
    val conc = col(EntityFrame.ConcCol)
    val toks = tokenizer.map(_(conc))
      .getOrElse(Text.tokenize(conc, minTokenLength, stopwords))
    val tf = f.concatValues()
      .select(col(f.idCol).cast("string").as("id"), explode(toks).as("key"))
      .groupBy("id", "key").agg(count(lit(1)).as("tf"))
      .persist()
    val nF = tf.select("id").distinct()
      .agg(count(lit(1)).cast("double").as("_n"))
    val df = tf.groupBy("key").agg(count(lit(1)).as("df"))
    val weighted = tf.join(df, Seq("key"))
      .crossJoin(broadcast(nF))
      .withColumn("w",
        col("tf") * (log((lit(1.0) + col("_n")) / (lit(1.0) + col("df"))) + 1.0))
      .drop("_n")
    val norms = weighted.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    weighted.join(norms, Seq("id"))
      .filter(col("w") / col("norm") >= threshold)
      .select("id", "key")
  }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks =
    Blocker.blockJoin(filteredTokens(left), filteredTokens(right))

  /** Oracle SQL for [[filteredTokens]] over a duckTokens relation. */
  def filteredTokensSql(tokenRel: String): String =
    s"""WITH tf AS (SELECT id, key, count(*) AS tf FROM ($tokenRel) GROUP BY id, key),
       |n AS (SELECT count(DISTINCT id) AS n FROM tf),
       |dfq AS (SELECT key, count(*) AS df FROM tf GROUP BY key),
       |w AS (SELECT id, key, tf * (ln((1.0 + n.n) / (1.0 + df)) + 1.0) AS w
       |      FROM tf JOIN dfq USING (key), n),
       |nrm AS (SELECT id, sqrt(sum(w * w)) AS norm FROM w GROUP BY id)
       |SELECT w.id, w.key FROM w JOIN nrm ON w.id = nrm.id
       |WHERE w.w / nrm.norm >= $threshold""".stripMargin
}
