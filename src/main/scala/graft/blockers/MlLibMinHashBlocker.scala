package graft.blockers

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.functions.Text

/** MLlib-backed MinHash-LSH blocker — the `approxSimilarityJoin`
  * formulation SURVEY.md M1 maps the reference to. Alternative to
  * [[MinHashLSHBlocker]] (md5 family): MLlib's seeded `(a·x+b) mod p`
  * hashes are deterministic per seed but not reproducible in SQL, so
  * this variant is spec-tested rather than oracle-checked. Use it when
  * Jaccard-distance thresholding (rather than explicit banding) is the
  * natural contract; both are fully distributed.
  *
  * Pipeline: tokens → binary HashingTF vectors → MinHashLSH model →
  * approxSimilarityJoin at distance ≤ 1 − jaccardThreshold → per-pair
  * stream grouped into blocks keyed by the right id (the reference's
  * probe-result shape, lsh.py:183-213).
  */
final case class MlLibMinHashBlocker(
    jaccardThreshold: Double = 0.5,
    numHashTables: Int = 8,
    numFeatures: Int = 1 << 18,
    minTokenLength: Int = 3,
    seed: Long = 42L) extends Blocker {

  private def featurize(f: EntityFrame): DataFrame = {
    val toks = f.concatValues()
      .select(col(f.idCol).cast("string").as("id"),
        Text.tokenize(col(graft.core.EntityFrame.ConcCol), minTokenLength).as("tokens"))
      .filter(size(col("tokens")) > 0)
    new HashingTF()
      .setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
      .transform(toks)
  }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val lf = featurize(left)
    val rf = featurize(right)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
      .fit(lf)
    val joined = model.approxSimilarityJoin(lf, rf, 1.0 - jaccardThreshold, "dist")
    val pairs = joined.select(
      col("datasetA.id").as("lid"), col("datasetB.id").as("rid"))
    Blocks(pairs.groupBy(col("rid").as(Blocks.KeyCol))
      .agg(array_sort(collect_set(col("lid"))).as(Blocks.LeftCol))
      .withColumn(Blocks.RightCol, array(col(Blocks.KeyCol))))
  }
}
