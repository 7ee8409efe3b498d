package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Num, Vectors}

/** Density-based clustering over plain `(id, vec)` embedding frames —
  * DBSCAN* (Campello, Moulavi & Sander 2013, the HDBSCAN paper's
  * fixed-eps flat extraction; public method). The closest faithfully
  * DISTRIBUTABLE form of the reference's hard-wired HDBSCAN
  * (attribute_clustering.py:48-56): real density semantics — low-density
  * points are genuinely UNASSIGNED, not "members of a small cluster" —
  * without HDBSCAN's driver-side mutual-reachability MST, which has no
  * shuffle-shaped equivalent. Remaining divergence vs full HDBSCAN
  * (single eps slice instead of the full hierarchy's eps-varying
  * extraction) is documented at the M11/M12 call sites.
  *
  * Definitions (Euclidean distances, rounded to 6 decimals so the eps
  * boundary decides identically on Spark and the DuckDB oracle):
  *   - core distance c(p) = distance to p's `minPts`-th nearest OTHER
  *     point in the candidate graph; c(p) > eps, or fewer than minPts
  *     candidates at all, makes p NOISE (HDBSCAN's −1). Convention
  *     mapping: scikit/HDBSCAN `min_samples` counts the point ITSELF in
  *     the neighborhood, this `minPts` does not — porting a
  *     min_samples=m config means minPts = m − 1 (same rule repeated at
  *     the `--min-pts` CLI knob and [[graft.blockers.DensityClusterAssigner]]);
  *   - mutual reachability d_mr(p,q) = max(c(p), c(q), d(p,q));
  *   - clusters = connected components of CORE points under
  *     d_mr ≤ eps, labeled by component min id
  *     ([[graft.dedup.Dedup.components]]' frontier propagation).
  *     Border points are noise — DBSCAN*'s own definition (§3 of the
  *     paper), which is also what makes the flat extraction a pure
  *     dataflow: no per-point nearest-core tie-breaking pass.
  *
  * Candidate graph: `lshPlanes = 0` (default) is the EXACT all-pairs
  * baseline — O(n²), acceptable because cluster assigners feed value
  * sets of dimension-table cardinality (distinct attribute values /
  * tokens), and the documented-baseline contract of
  * [[Similarity.selfJoinNearDup]] applies. `lshPlanes > 0` switches to
  * sign-LSH bucketed pairs (the [[Similarity.bucketedNearDup]] scale
  * path): only same-bucket pairs are compared, so a far pair may be
  * missed — density UNDERestimates, extra noise, never false merges of
  * far points.
  */
object Density {

  /** (id, vec) → (id, cluster) with cluster = component min id for
    * clustered core points and NULL for noise. First two columns of
    * `emb` are taken positionally as (id, vector). */
  def dbscanStar(emb: DataFrame, eps: Double, minPts: Int = 3,
                 lshPlanes: Int = 0, planeDims: Int = 16): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val Array(idC, vecC) = emb.columns.take(2)
    // persist: the point table feeds the pair join twice and the final
    // assembly; released below once the labels are materialized
    val e = emb.select(col(idC).cast("string").as("id"), col(vecC).as("vec"))
      .persist()
    val pairs =
      if (lshPlanes <= 0) {
        val a = e.select(col("id").as("ia"), col("vec").as("va"))
        val b = e.select(col("id").as("ib"), col("vec").as("vb"))
        a.crossJoin(b).filter(col("ia") < col("ib"))
      } else {
        val withB = e.select(col("id"), col("vec"),
          Similarity.hyperplaneBucket(
            slice(col("vec"), 1, planeDims), lshPlanes, planeDims).as("_b"))
        withB.select(col("_b"), col("id").as("ia"), col("vec").as("va"))
          .join(withB.select(col("_b"), col("id").as("ib"), col("vec").as("vb")),
            Seq("_b"))
          .filter(col("ia") < col("ib"))
          .drop("_b")
      }
    val dists = pairs.select(col("ia"), col("ib"),
      Num.stableRound(sqrt(Vectors.sqDist(col("va"), col("vb"))), 6).as("d"))
    // both directions once, so the per-point window and both edge
    // endpoints read ONE shuffled table
    val sym = dists.unionByName(
      dists.select(col("ib").as("ia"), col("ia").as("ib"), col("d"))).persist()
    val w = Window.partitionBy("ia").orderBy(col("d").asc, col("ib").asc)
    val core = sym.withColumn("_r", row_number().over(w))
      .filter(col("_r") === minPts && col("d") <= eps)
      .select(col("ia").as("id"), col("d").as("_c"))
    val edges = sym
      .join(core.select(col("id").as("ia"), col("_c").as("_ca")), Seq("ia"))
      .join(core.select(col("id").as("ib"), col("_c").as("_cb")), Seq("ib"))
      .filter(greatest(col("_ca"), col("_cb"), col("d")) <= eps)
      .select(col("ia").as("id_a"), col("ib").as("id_b"))
    val comp = graft.dedup.Dedup.components(edges)
    // an edge-less core point is its own singleton cluster; noise stays
    // NULL through the final left join
    val labeled = core.select("id")
      .join(comp.withColumnRenamed("component", "cluster"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val out = e.select("id").join(labeled, Seq("id"), "left")
      .localCheckpoint() // output-sized; lets the caches release NOW
    e.unpersist(); sym.unpersist()
    out
  }
}
