package graft.blockers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}

/** M12 attribute-clustering blocker (reference src/klinker/blockers/
  * attribute_clustering.py:28-199 `AttributeClusteringTokenBlocker`):
  * cluster the DISTINCT attribute values of both sides jointly, replace
  * each value by its cluster pseudo-label, and block entities whose
  * values share a label. Clustering and noise handling are the shared
  * [[TokenClustering]] pipeline (KMeans or hash buckets standing in for
  * HDBSCAN — documented divergence, SURVEY.md M11/M12).
  *
  * Scale shape: dedup-before-embed (distinct values only — the
  * reference's own optimization, attribute_clustering.py:80-87), one
  * clustering over the small distinct-value set, then a join of labels
  * back onto the full data (AQE broadcasts it while small).
  */
final case class AttributeClusteringBlocker(
    assigner: ClusterAssigner,
    minClusterSize: Int = 1,
    noise: NoiseHandling = NoiseHandling.Keep) extends Blocker {

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
    // distinct values across BOTH sides, clustered once
    val vals = lv.select("v").unionByName(rv.select("v")).distinct()
    val lab = TokenClustering.labels(vals, assigner, minClusterSize, noise)
    val l = lv.join(lab, Seq("v")).select("id", "key")
    val r = rv.join(lab, Seq("v")).select("id", "key")
    Blocker.blockJoin(l, r)
  }
}
