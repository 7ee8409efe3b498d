package graft.blockers

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.encoders.FrameEncoder
import graft.functions.{MinHash, Text}

/** How to treat values that fall into "noise" clusters (reference
  * attribute_clustering.py:23, 89-99 `NoiseClusterHandling`).
  *
  * The reference's HDBSCAN marks low-density points with label -1; our
  * KMeans/hash stand-ins assign every point, so noise is defined as
  * membership in a cluster with fewer than `minClusterSize` distinct
  * values — the same density intuition HDBSCAN's min_cluster_size
  * expresses (documented divergence, SURVEY.md M12).
  */
sealed trait NoiseHandling
object NoiseHandling {
  /** Drop noise values entirely (reference "remove"). */
  case object Remove extends NoiseHandling
  /** Noise values keep THEMSELVES as their block key (reference "token":
    * label := value, attribute_clustering.py:94-98) — degenerates to
    * plain token blocking for the noise subset. */
  case object Token extends NoiseHandling
  /** All noise values share one pseudo-cluster, mirroring HDBSCAN's
    * single shared -1 label (reference "keep"). */
  case object Keep extends NoiseHandling
}

/** Pluggable cluster-assignment step for the clustering blockers:
  * distinct values in, (v, cluster) out. The reference hard-wires
  * HDBSCAN (attribute_clustering.py:48-56); on Spark the assignment is a
  * strategy so the deterministic variant can be oracle-checked while the
  * embedding variant exercises MLlib.
  */
sealed trait ClusterAssigner {
  /** vals: DataFrame("v": string) → DataFrame("v", "cluster": string). */
  def assign(vals: DataFrame): DataFrame
}

/** Embed distinct values with `encoder`, KMeans-cluster the vectors.
  * KMeans stands in for HDBSCAN (no HDBSCAN on Spark — documented
  * divergence, SURVEY.md M11/M12). */
final case class KMeansClusterAssigner(
    encoder: FrameEncoder,
    numClusters: Int = 10,
    seed: Long = 42L) extends ClusterAssigner {
  override def assign(vals: DataFrame): DataFrame = {
    val asFrame = EntityFrame(
      vals.select(col("v").as("id"), col("v").as("text")), "vals", "id")
    // persist: KMeans re-evaluates its input every iteration
    val feat = encoder.encode(asFrame, None)
      .withColumn("features", array_to_vector(col("vec"))).persist()
    graft.core.CacheScope.seal(
      new KMeans().setK(numClusters).setSeed(seed)
        .setFeaturesCol("features").setPredictionCol("label")
        .fit(feat).transform(feat)
        .select(col("id").as("v"), col("label").cast("string").as("cluster")),
      feat)
  }
}

/** Embed distinct values with `encoder`, cluster by DENSITY — DBSCAN*
  * via [[graft.similarity.Density.dbscanStar]], the HDBSCAN paper's
  * fixed-eps flat extraction. Unlike the KMeans/hash stand-ins this
  * gives the reference's actual density SEMANTICS: a low-density value
  * is genuinely unassigned (HDBSCAN's −1), not "in a small cluster".
  * Noise values surface as their own SINGLETON cluster (cluster id =
  * the value), so they fall to [[TokenClustering.labels]]'
  * `minClusterSize` rule and every [[NoiseHandling]] mode composes
  * unchanged — Remove drops them, Token keeps the value itself, Keep
  * lumps them under the shared −1 pseudo-label, exactly HDBSCAN's
  * modes (attribute_clustering.py:89-99). Remaining divergence: one
  * fixed eps instead of HDBSCAN's hierarchy-extracted per-cluster eps.
  * `lshPlanes > 0` switches the candidate graph to sign-LSH buckets
  * (the scale path for value sets beyond dimension-table size).
  * Convention note: `minPts` counts OTHER points (core distance =
  * minPts-th nearest neighbor), while scikit/HDBSCAN `min_samples`
  * counts the point itself — porting a min_samples=m config means
  * minPts = m − 1 (see [[graft.similarity.Density.dbscanStar]]). */
final case class DensityClusterAssigner(
    encoder: FrameEncoder,
    eps: Double,
    minPts: Int = 3,
    lshPlanes: Int = 0,
    // non-empty ladder switches to the HDBSCAN flat cut
    // ([[graft.similarity.Density.hdbscanFlatCut]]): per-branch eps
    // chosen by cluster stability over the descending ladder — the
    // hierarchy extraction the single-eps DBSCAN* slice documents as
    // its divergence. `eps` is then ignored; `hierarchyMinClusterSize`
    // is HDBSCAN's min_cluster_size (condensed-tree shed rule), applied
    // INSIDE the hierarchy — the blocker's own minClusterSize still
    // gates downstream on the assigned labels.
    epsLadder: Seq[Double] = Nil,
    hierarchyMinClusterSize: Int = 2,
    // > 0 derives the ladder from the data itself
    // ([[graft.similarity.Density.autoEpsLadder]] with this many
    // levels) — the `--eps-ladder auto` form; takes precedence over an
    // explicit `epsLadder`
    autoLadderLevels: Int = 0,
    // the `--exact-hierarchy` form: the CONTINUOUS dendrogram
    // ([[graft.similarity.Density.hdbscanExact]] — Borůvka MST +
    // value-set-sized driver condensed tree), no ladder at all;
    // takes precedence over both ladder forms, `eps` ignored
    exactHierarchy: Boolean = false) extends ClusterAssigner {
  override def assign(vals: DataFrame): DataFrame = {
    val asFrame = EntityFrame(
      vals.select(col("v").as("id"), col("v").as("text")), "vals", "id")
    val emb = encoder.encode(asFrame, None)
    val lab =
      if (exactHierarchy)
        graft.similarity.Density.hdbscanExact(
          emb, minPts, hierarchyMinClusterSize, lshPlanes)
      else if (autoLadderLevels > 0)
        graft.similarity.Density.hdbscanFlatCutAuto(
          emb, autoLadderLevels, minPts, hierarchyMinClusterSize, lshPlanes)
      else if (epsLadder.nonEmpty)
        graft.similarity.Density.hdbscanFlatCut(
          emb, epsLadder, minPts, hierarchyMinClusterSize, lshPlanes)
      else graft.similarity.Density.dbscanStar(emb, eps, minPts, lshPlanes)
    // left join from vals: values the encoder dropped (no tokens) and
    // density noise (NULL cluster) both keep themselves as a singleton
    vals.join(lab.withColumnRenamed("id", "v"), Seq("v"), "left")
      .select(col("v"), coalesce(col("cluster"), col("v")).as("cluster"))
  }
}

/** md5-bucket assignment — deterministic and SQL-reproducible, so the
  * whole clustering-blocker pipeline (sizes, noise modes, pseudo-token
  * replacement, downstream blocking) can be hash-checked against the
  * DuckDB oracle. Also a legitimate scale path in its own right
  * (feature-hashing flavor: one codegen'd expression, no model fit). */
final case class HashBucketClusterAssigner(buckets: Int = 16) extends ClusterAssigner {
  override def assign(vals: DataFrame): DataFrame =
    vals.select(col("v"),
      (Text.md5Long(col("v")) % buckets).cast("string").as("cluster"))

  /** DuckDB SQL mirroring [[assign]] over a `(v)` relation. */
  def assignSql(valsRel: String): String =
    s"""SELECT v, (('0x'||substr(md5(v), 1, 15))::bigint % $buckets)::varchar AS cluster
       |FROM ($valsRel)""".stripMargin
}

/** Shared label pipeline of the four clustering blockers (reference
  * TokenClusteringMixin, attribute_clustering.py:28-151): cluster the
  * distinct values, apply noise handling, emit `clustering_label_<k>`
  * pseudo-tokens. */
object TokenClustering {
  /** Reference's label prefix (attribute_clustering.py:29). */
  val LabelPrefix = "clustering_label_"

  /** distinctVals("v") → (v, key): the blocking key each value maps to.
    *
    * Scale: `assign` output is one row per distinct value; cluster sizes
    * are ≤ #clusters rows (broadcast); the whole thing is two narrow
    * aggregations — no driver-side label array like the reference's
    * np.ndarray round-trip (attribute_clustering.py:131-148). */
  def labels(
      distinctVals: DataFrame,
      assigner: ClusterAssigner,
      minClusterSize: Int,
      noise: NoiseHandling): DataFrame = {
    val assigned = assigner.assign(distinctVals)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("_csize"))
    val joined = assigned.join(broadcast(sizes), Seq("cluster"))
    val pseudo = concat(lit(LabelPrefix), col("cluster"))
    val isCore = col("_csize") >= minClusterSize
    noise match {
      case NoiseHandling.Remove =>
        joined.filter(isCore).select(col("v"), pseudo.as("key"))
      case NoiseHandling.Token =>
        joined.select(col("v"), when(isCore, pseudo).otherwise(col("v")).as("key"))
      case NoiseHandling.Keep =>
        joined.select(col("v"),
          when(isCore, pseudo).otherwise(lit(LabelPrefix + "-1")).as("key"))
    }
  }

  /** DuckDB SQL mirroring [[labels]] with a [[HashBucketClusterAssigner]]
    * over a `(v)` relation. */
  def labelsSql(
      valsRel: String,
      assigner: HashBucketClusterAssigner,
      minClusterSize: Int,
      noise: NoiseHandling): String = {
    val core = s"'$LabelPrefix'||cluster"
    val keyExpr = noise match {
      case NoiseHandling.Remove => core
      case NoiseHandling.Token  => s"CASE WHEN _csize >= $minClusterSize THEN $core ELSE v END"
      case NoiseHandling.Keep   => s"CASE WHEN _csize >= $minClusterSize THEN $core ELSE '${LabelPrefix}-1' END"
    }
    val filter = noise match {
      case NoiseHandling.Remove => s"WHERE _csize >= $minClusterSize"
      case _ => ""
    }
    s"""SELECT v, $keyExpr AS key FROM (
       |  SELECT v, cluster, count(*) OVER (PARTITION BY cluster) AS _csize
       |  FROM (${assigner.assignSql(valsRel)}))
       |$filter""".stripMargin
  }

  /** Distinct (id, v) token pairs of one side — the exploded token frame
    * the reference builds via `_create_exploded_token_frame`
    * (attribute_clustering.py:305-318). */
  private[blockers] def tokenPairs(
      f: EntityFrame, minTokenLength: Int, stopwords: Seq[String],
      tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val conc = col(EntityFrame.ConcCol)
    val toks = tokenizer.map(_(conc))
      .getOrElse(Text.tokenize(conc, minTokenLength, stopwords))
    f.concatValues()
      .select(col(f.idCol).cast("string").as("id"), explode(toks).as("v"))
      .distinct()
  }

  /** Per-side (id, key) after pseudo-token replacement. The label join
    * runs on the token key — AQE broadcasts the label frame while the
    * vocabulary is small and falls back to a shuffle join when it isn't
    * (billions of distinct tokens at 100 TB). */
  private[blockers] def keyedSides(
      left: EntityFrame, right: EntityFrame,
      assigner: ClusterAssigner, minClusterSize: Int, noise: NoiseHandling,
      minTokenLength: Int, stopwords: Seq[String],
      tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
      : (DataFrame, DataFrame) = {
    val lt = tokenPairs(left, minTokenLength, stopwords, tokenizer)
    val rt = tokenPairs(right, minTokenLength, stopwords, tokenizer)
    // the reference embeds per-side uniques then concatenates
    // (attribute_clustering.py:80-87); union-distinct is the same set
    val vals = lt.select("v").unionByName(rt.select("v")).distinct()
    val lab = labels(vals, assigner, minClusterSize, noise)
    (lt.join(lab, Seq("v")).select("id", "key").distinct(),
     rt.join(lab, Seq("v")).select("id", "key").distinct())
  }
}

/** Token-clustering token blocker (reference
  * attribute_clustering.py:256-320 `TokenClusteringTokenBlocker`):
  * tokenize, cluster the TOKENS (not the attribute values), replace each
  * token by its cluster pseudo-token, token-block on the result.
  *
  * The reference re-concatenates pseudo-tokens per entity and
  * re-tokenizes (`clustering_label_<k>` survives NLTK word_tokenize
  * whole); blocking directly on the (id, pseudo-token) pairs is the
  * same block structure without the string round-trip. */
final case class TokenClusteringTokenBlocker(
    assigner: ClusterAssigner,
    minClusterSize: Int = 5,
    noise: NoiseHandling = NoiseHandling.Remove,
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords,
    tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
  extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val (l, r) = TokenClustering.keyedSides(
      left, right, assigner, minClusterSize, noise, minTokenLength, stopwords,
      tokenizer)
    Blocker.blockJoin(l, r)
  }
}

/** Token-clustering MinHash-LSH blocker (reference
  * attribute_clustering.py:323-393 `TokenClusteringMinHashLSHBlocker`):
  * same pseudo-token replacement, then MinHash signatures over each
  * entity's pseudo-token SET and banded-LSH candidate generation —
  * the md5 hash family, so fully oracle-reproducible. */
final case class TokenClusteringMinHashLSHBlocker(
    assigner: ClusterAssigner,
    minClusterSize: Int = 5,
    noise: NoiseHandling = NoiseHandling.Remove,
    numPerm: Int = 32,
    bands: Int = 8,
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords,
    tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
  extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val (l, r) = TokenClustering.keyedSides(
      left, right, assigner, minClusterSize, noise, minTokenLength, stopwords,
      tokenizer)
    Blocker.blockJoin(
      MinHash.buckets(l, numPerm, bands),
      MinHash.buckets(r, numPerm, bands))
  }
}
