package graft.encoders

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.EntityFrame
import graft.functions.Text

/** Frame encoders: EntityFrame (+ optional relation triples) → one dense
  * embedding row per entity, `(id: string, vec: array<double>)`.
  *
  * Mirrors the reference's encoder stack (src/klinker/encoders/) with the
  * boundary SURVEY.md M6/M7 prescribes: *learned* models (transformers,
  * DeepBlocker) stay external — embeddings enter as a DataFrame — while
  * everything computable from the data itself (hash/word pooling M4,
  * graph propagation M8/M9) is implemented natively as joins+aggregates.
  */
trait FrameEncoder {
  def encode(
      frame: EntityFrame,
      rel: Option[DataFrame] = None): DataFrame
}

/** M4-style pooled token embedding with a deterministic md5-derived
  * token vector table (stands in for fasttext/gloVe lookups, which at
  * scale are themselves just a parquet join — reference
  * pretrained.py:259-384). Optional SIF weighting (M5) with the
  * reference's min_freq floor (pretrained.py:495-499: tokens below
  * `minFreq` get weight 1.0) and first-principal-component removal
  * (pretrained.py:517-531; the reference's default — off here so the
  * plain pooled encoder stays available). */
final case class HashTokenEncoder(
    dims: Int = 8,
    sif: Boolean = false,
    sifA: Double = 1e-3,
    minFreq: Int = 0,
    removePc: Boolean = false) extends FrameEncoder {

  override def encode(frame: EntityFrame, rel: Option[DataFrame]): DataFrame = {
    val toks = frame.concatValues()
      .select(col(frame.idCol).cast("string").as("id"),
        explode(Text.tokenize(col(EntityFrame.ConcCol))).as("key"))
    val weighted =
      if (sif) {
        // persist: the token stream feeds both the frequency aggregate and
        // the weight join; total token count comes in-plan from the (tiny)
        // counts frame — no driver-side count() action, no third scan
        val cached = toks.persist()
        val counts = cached.groupBy("key").agg(count(lit(1)).as("freq"))
        val withTotal = counts.crossJoin(
          broadcast(counts.agg(sum("freq").cast("double").as("total"))))
        cached.join(broadcast(withTotal), Seq("key"))
          .withColumn("w",
            when(col("freq") >= minFreq,
              lit(sifA) / (lit(sifA) + col("freq") / col("total")))
            .otherwise(lit(1.0)))
      } else toks.withColumn("w", lit(1.0))
    val dimCols = (0 until dims).map(d =>
      (sum(col("w") * ((Text.md5Long(concat(col("key"), lit(s":$d"))) % 2001 - 1000) / 1000.0))
        / sum(col("w"))).as(s"d$d"))
    val pooled = weighted.groupBy("id").agg(dimCols.head, dimCols.tail: _*)
      .select(col("id"), array((0 until dims).map(d => col(s"d$d")): _*).as("vec"))
    if (removePc) PcRemoval.removeFirstPc(pooled, dims) else pooled
  }
}

/** First-principal-component removal (SIF paper postprocessing; reference
  * pretrained.py:517-531, TruncatedSVD n_components=1 — note TruncatedSVD
  * does NOT center, so the top right-singular vector of the raw matrix is
  * what's removed — exactly [[org.apache.spark.mllib.linalg.distributed.RowMatrix.computeSVD]]).
  *
  * Scale: computeSVD(k=1) at these widths goes through the d×d Gramian —
  * ONE distributed pass over the rows, then an O(d²) driver solve; the
  * subtraction is a codegen'd zip_with against the broadcast pc literal.
  * Nothing quadratic in row count anywhere. */
object PcRemoval {
  import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
  import org.apache.spark.mllib.linalg.distributed.RowMatrix

  /** emb(id, vec: array<double>) → same frame with x := x − (x·pc)pc.
    * The sign ambiguity of the singular vector cancels (pc appears
    * twice), so the result is deterministic. */
  def removeFirstPc(emb: DataFrame, dims: Int): DataFrame = {
    val rows = emb.select("vec").rdd
      .map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val svd = new RowMatrix(rows, 0L, dims).computeSVD(1, computeU = false)
    val pc = typedLit(svd.V.toArray.toSeq) // d×1 column-major = the pc
    emb
      .withColumn("_dot", aggregate(zip_with(col("vec"), pc, _ * _), lit(0.0), _ + _))
      .withColumn("vec", zip_with(col("vec"), pc, (x, p) => x - col("_dot") * p))
      .drop("_dot")
  }
}

/** Graph message passing (M8 GCN / M9 LightEA, reference encoders/
  * gcn.py:108-234 and light_ea.py:55-248): k rounds of
  * degree-normalized neighbor aggregation over the symmetric relation
  * graph, expressed as join + element-wise aggregate — the
  * aggregateMessages pattern, pure DataFrame.
  *
  * round:  f'(i) = f(i)/2 + Σ_{j∈N(i)} f(j) / (2·sqrt(deg i · deg j))
  * (self-loop keeps own signal; sqrt-degree norm is the GCN kernel).
  * With `l2NormalizeEachRound` the per-round L2 norm matches LightEA's
  * propagation flavor.
  */
final case class GraphPropagationEncoder(
    base: FrameEncoder,
    rounds: Int = 2,
    l2NormalizeEachRound: Boolean = false) extends FrameEncoder {
  // (the l2NormalizeEachRound flavor is the SIMPLIFIED LightEA
  // propagation; the faithful three-view version is [[LightEAEncoder]])

  override def encode(frame: EntityFrame, rel: Option[DataFrame]): DataFrame = {
    require(rel.isDefined, "graph encoder needs relation triples")
    val f0 = base.encode(frame, None)
    val (h, _, t) = {
      val Array(a, b, c) = rel.get.columns.take(3)
      (a, b, c)
    }
    // symmetric edge list (string ids)
    val edges = rel.get
      .select(col(h).cast("string").as("src"), col(t).cast("string").as("dst"))
      .unionByName(rel.get
        .select(col(t).cast("string").as("src"), col(h).cast("string").as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))

    var f = f0
    for (_ <- 1 to rounds) {
      // exploded features of the source side. deg is one row per VERTEX —
      // no broadcast hint: at billions of vertices a forced broadcast
      // cannot fit an executor; AQE broadcasts while it is small and
      // falls back to a shuffle join when it is not.
      val srcFeat = f.select(col("id").as("src"), posexplode(col("vec")).as(Seq("pos", "v")))
        .join(deg, Seq("src"))
      val msgs = edges
        .join(srcFeat, Seq("src"))
        .join(deg.select(col("src").as("dst"), col("deg").as("deg_dst")), Seq("dst"))
        .groupBy(col("dst").as("id"), col("pos"))
        .agg(sum(col("v") / (sqrt(col("deg") * col("deg_dst")) * 2.0)).as("nbr"))
      val own = f.select(col("id"), posexplode(col("vec")).as(Seq("pos", "v")))
      val combined = own.join(msgs, Seq("id", "pos"), "left")
        .select(col("id"), col("pos"),
          (col("v") / 2.0 + coalesce(col("nbr"), lit(0.0))).as("v"))
      val renorm =
        if (l2NormalizeEachRound) {
          val norms = combined.groupBy("id").agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
          combined.join(norms, Seq("id"))
            .select(col("id"), col("pos"),
              when(col("nrm") === 0.0, col("v")).otherwise(col("v") / col("nrm")).as("v"))
        } else combined
      f = renorm
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("id"), transform(col("pv"), x => x("v")).as("vec"))
    }
    f
  }
}

/** M9: LightEA three-view label propagation (reference
  * src/klinker/encoders/light_ea.py:55-248; Mao et al., EMNLP 2022 —
  * "LightEA: A Scalable, Robust, and Interpretable Entity Alignment
  * Framework via Three-view Label Propagation") re-expressed as joins +
  * aggregates over exploded `(id, pos, v)` features — the reference's
  * sparse matmuls become groupBy-sums, nothing is ever collected:
  *
  *   - direction-tagged edges `(h,t,r>)` ∪ `(t,h,r<)` stand in for the
  *     reference's 2r / 2r+1 relation doubling (:120-131);
  *   - `ent_ent` carries the distinct-relation count per (src,dst) pair
  *     plus the per-node incident-triple diagonal (:137-155);
  *   - per round (:221-236): rel features ← row-normalized sum of head
  *     features (the rel_ent view); ent features ← row-normalized
  *     (ent_ent ⋅ ent + ent_rel ⋅ rel_prev) — the relation channel
  *     enters with one round of lag, zeros in round 1 (:199);
  *   - output concatenates the per-round entity channels
  *     ((depth+1)·dims wide, or depth·dims with `onlyNeighborInfo`) and
  *     L2-normalizes each row (:242-248). Entities missing a channel
  *     (disconnected nodes) get dense zero fill at assembly.
  *
  * Scale: every step is an equi-join + aggregate on entity/relation
  * keys — shuffle-partitioned, no broadcast of per-vertex state; each
  * round's features persist because round r+1 and the channel concat
  * both consume them. */
final case class LightEAEncoder(
    base: FrameEncoder,
    depth: Int = 2,
    dims: Int = 8,
    onlyNeighborInfo: Boolean = false) extends FrameEncoder {
  import LightEAEncoder.l2Rows

  override def encode(frame: EntityFrame, rel: Option[DataFrame]): DataFrame = {
    require(rel.isDefined, "LightEA needs relation triples")
    val (h, r, t) = {
      val Array(a, b, c) = rel.get.columns.take(3)
      (a, b, c)
    }
    val fwd = rel.get.select(col(h).cast("string").as("src"),
      col(t).cast("string").as("dst"), concat(col(r), lit(">")).as("r"))
    val bwd = rel.get.select(col(t).cast("string").as("src"),
      col(h).cast("string").as("dst"), concat(col(r), lit("<")).as("r"))
    val edges = fwd.unionByName(bwd).distinct().persist()

    // ent_ent view: off-diagonal = #distinct direction-tagged relations
    // per (src,dst); diagonal = #incident direction-tagged triples
    val offDiag = edges.groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
    val diag = edges.select(col("src").as("n"))
      .unionByName(edges.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("double").as("w"))
      .select(col("n").as("src"), col("n").as("dst"), col("w"))
    val entEnt = offDiag.unionByName(diag)
      .groupBy("src", "dst").agg(sum("w").as("w")).persist()
    val relEnt = edges.select(col("r"), col("src")).distinct().persist()
    val entRel = edges.select(col("dst").as("id"), col("r")).distinct().persist()

    var entF = base.encode(frame, None)
      .select(col("id"), posexplode(col("vec")).as(Seq("pos", "v"))).persist()
    var relF: Option[DataFrame] = None // rel features start at zero (:199)
    val channels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (!onlyNeighborInfo) channels += entF
    for (_ <- 1 to depth) {
      val newRel = l2Rows(
        relEnt.join(entF.select(col("id").as("src"), col("pos"), col("v")), Seq("src"))
          .groupBy("r", "pos").agg(sum("v").as("v")), "r").persist()
      val neigh = entEnt
        .join(entF.select(col("id").as("dst"), col("pos"), col("v")), Seq("dst"))
        .groupBy(col("src").as("id"), col("pos"))
        .agg(sum(col("w") * col("v")).as("v"))
      val mixed = relF match {
        case Some(rf) =>
          val relMix = entRel.join(rf, Seq("r"))
            .groupBy("id", "pos").agg(sum("v").as("v"))
          neigh.unionByName(relMix).groupBy("id", "pos").agg(sum("v").as("v"))
        case None => neigh
      }
      entF = l2Rows(mixed, "id").persist()
      relF = Some(newRel)
      channels += entF
    }
    val width = channels.size * dims
    val stacked = channels.zipWithIndex.map { case (c, i) =>
      c.select(col("id"), (col("pos") + i * dims).as("pos"), col("v"))
    }.reduce(_ unionByName _)
    // dense assembly: missing (id, pos) cells — disconnected nodes'
    // propagation channels — fill with 0.0 (try_element_at: null, not
    // ANSI error, on absent map keys)
    l2Rows(stacked, "id")
      .groupBy("id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("pos"), col("v"))))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(width - 1)),
          i => coalesce(try_element_at(col("m"), i), lit(0.0))).as("vec"))
  }
}

object LightEAEncoder {
  /** L2-normalize `v` within each `key` group of exploded rows (the
    * reference's _my_norm / F.normalize; zero rows pass unchanged). */
  private def l2Rows(f: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame = {
    val norms = f.groupBy(key).agg(sqrt(sum(col("v") * col("v"))).as("_nrm"))
    f.join(norms, Seq(key))
      .select(col(key), col("pos"),
        when(col("_nrm") === 0.0, col("v")).otherwise(col("v") / col("_nrm")).as("v"))
  }
}
