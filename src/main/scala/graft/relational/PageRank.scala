package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an arc list — the standard importance
  * measure for entity graphs (Page et al. 1999), complementing the
  * degree/frequency importances in [[Relational]] (A4/A5). Declarative
  * power iteration: every round is one arcs⋈ranks keyed equi-join plus a
  * partial-agg sum — the GraphX/Pregel dataflow re-expressed as Catalyst
  * plans, so AQE handles skew and the oracle can replay it as SQL.
  *
  * `arcs` must contain both directions if the graph is undirected; with
  * that construction every node with an edge has out-degree ≥ 1, so
  * there is no dangling-mass correction term (documented contract —
  * callers with genuinely directed graphs must add the dangling term
  * themselves).
  *
  * 100 TB shape: arcs and the out-degree table are persisted across the
  * (fixed, small) iteration count and released after a final
  * localCheckpoint truncates the result's lineage — the [[graft.dedup.Dedup]]
  * components pattern. All joins are keyed by node id; the only
  * broadcast is the one-row node count. Ranks are node-sized.
  */
object PageRank {

  /** @param arcs (src, dst) arc list
    * @return (node, r) — r the PageRank after `iterations` rounds from a
    *         uniform start, damping `d`: r(v) = (1−d)/N + d·Σ r(u)/deg(u).
    */
  def pageRank(arcs: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    val a = arcs.select(col("src"), col("dst"))
    val deg = a.groupBy("src").agg(count(lit(1)).as("dg")).persist()
    val nDf = deg.agg(count(lit(1)).as("n"))
    // The arcs⋈deg join is loop-INVARIANT: build the (src, dst, dg)
    // contribution table once, hash-partitioned by src and persisted in
    // that layout — every iteration's join then exchanges only the
    // node-sized rank table against the cached partitioning, instead of
    // re-joining (and re-shuffling) the arc-sized side each round. This
    // is the shuffle-once idiom that matters at 100 TB: the big side
    // moves exactly one time however many iterations run. (The per-round
    // contribution keeps the r/dg division form — same operations as the
    // SQL oracle's replay, no reciprocal-multiply drift.)
    val contrib = a.join(deg, Seq("src"))
      .select(col("src"), col("dst"), col("dg"))
      .repartition(col("src"))
      .persist()
    var r = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to iterations) {
      val m = contrib
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("r") / col("dg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      r = m.crossJoin(broadcast(nDf))
        .select(col("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) * col("m")).as("r"))
    }
    val out = r.localCheckpoint()
    deg.unpersist()
    contrib.unpersist()
    out
  }

  /** Synchronous label-propagation community detection (Raghavan, Albert
    * & Kumara 2007, Phys. Rev. E 76): every node starts as its own
    * community; each round it adopts the most frequent label among its
    * neighbors AND itself. The self-vote is load-bearing — but as a
    * LATER-ROUND stabilizer, not a first-round guard: round 1 is all
    * ties either way and the lexicographic tie-break still leaks small
    * labels across bridges; with the self-vote a dense neighborhood's
    * own labels out-count the leaked one in subsequent rounds and the
    * community RECOVERS, whereas without it the flood is absorbing and
    * the operator degenerates into min-label propagation (= connected
    * components; verified by simulation and the bridged-cliques spec).
    * Ties broken by the
    * LEXICOGRAPHICALLY SMALLEST label — fully deterministic, so a fixed
    * iteration count is SQL-replayable (async/randomized LPA variants
    * trade that determinism for faster convergence; the fixed-round
    * synchronous form is the oracle-able one, and oscillation on
    * bipartite structures is likewise deterministic). Same arc contract
    * as [[pageRank]]: both directions present for undirected graphs;
    * nodes appear iff they have an edge.
    *
    * 100 TB shape: one round = an arc⋈label equi-join (arcs
    * hash-partitioned by dst ONCE, persisted — only the node-sized label
    * table moves per round) + a (src, label) count + a per-src argmax
    * window; labels are localCheckpoint'd per round so the plan stays
    * flat. Everything is keyed by node id; communities are never
    * collected.
    *
    * Output: (node, community). */
  def labelPropagation(arcs: DataFrame, iterations: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = arcs.select(col("src"), col("dst"))
      .repartition(col("dst")).persist()
    var labels = a.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      val votes = a.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src"), col("label"))
        .unionByName(labels.select(col("node").as("src"), col("label")))
      val counts = votes.groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("src")
        .orderBy(col("c").desc, col("label").asc)
      labels = counts.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("src").as("node"), col("label"))
        .localCheckpoint(eager = false)
    }
    val out = labels.select(col("node"), col("label").as("community"))
      .localCheckpoint()
    a.unpersist()
    out
  }
}
