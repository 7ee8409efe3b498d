package graft.blockers

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.encoders.FrameEncoder

/** M12 attribute-clustering blocker (reference src/klinker/blockers/
  * attribute_clustering.py:28-393): embed the DISTINCT attribute values
  * of both sides, cluster them jointly, replace each value by its
  * cluster label, and block entities whose values share a label.
  * KMeans stands in for HDBSCAN (documented divergence, SURVEY M11/M12);
  * "noise handling" maps to nothing — KMeans assigns every point.
  *
  * Scale shape: dedup-before-embed (distinct values only — the
  * reference's own optimization, attribute_clustering.py:80-87), one
  * clustering over the small distinct-value set, then a broadcast join
  * of labels back onto the full data.
  */
final case class AttributeClusteringBlocker(
    encoder: FrameEncoder,
    numClusters: Int = 10,
    seed: Long = 42L) extends Blocker {

  /** (id, v) value pairs of one side. */
  private def values(f: EntityFrame): DataFrame =
    if (f.isTriple) {
      val Array(h, _, t) = f.df.columns
      f.df.select(col(h).cast("string").as("id"), col(t).cast("string").as("v"))
    } else {
      val parts = f.nonIdColumns.map(c => col(c).cast("string"))
      f.df.select(col(f.idCol).cast("string").as("id"),
          explode(array(parts: _*)).as("v"))
    }.na.drop(Seq("v"))

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val lv = values(left)
    val rv = values(right)
    // distinct values across BOTH sides, embedded once
    val distinctVals = lv.select("v").unionByName(rv.select("v")).distinct()
    val asFrame = EntityFrame(
      distinctVals.select(col("v").as("id"), col("v").as("text")), "vals", "id")
    val emb = encoder.encode(asFrame, None)
    val feat = emb.withColumn("features", array_to_vector(col("vec")))
    val labeled = new KMeans().setK(numClusters).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("label")
      .fit(feat).transform(feat)
      .select(col("id").as("v"), concat(lit("cluster_"), col("label")).as("key"))
    // labels are one row per distinct value → broadcast back onto both sides
    val l = lv.join(broadcast(labeled), Seq("v")).select("id", "key")
    val r = rv.join(broadcast(labeled), Seq("v")).select("id", "key")
    Blocker.blockJoin(l, r)
  }
}
