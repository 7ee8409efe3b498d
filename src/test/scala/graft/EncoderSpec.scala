package graft

import org.apache.spark.sql.functions._
import graft.blockers._
import graft.core.EntityFrame
import graft.encoders.{FrameEncoder, GraphPropagationEncoder, HashTokenEncoder, LightEAEncoder}

/** Encoder + embedding-blocker invariants (the reference's own ML-path
  * test style: shapes and structural properties, not exact floats). */
class EncoderSpec extends SparkSpec {
  import spark.implicits._

  test("pcaProject maps line data to signed lengths; rank-deficient residual is zero") {
    // points are exact multiples of v = (0.6, 0.8): the top singular
    // vector is ±v, canonicalized to +v (largest |entry| 0.8 positive),
    // so component 0 recovers the signed multiple; the data has rank 1,
    // so component 1 is exactly zero (padded past the numerical rank)
    val df = Seq(-2.0, -1.0, 1.0, 2.0, 3.0).zipWithIndex
      .map { case (m, i) => (s"p$i", Seq(m * 0.6, m * 0.8)) }
      .toDF("id", "vec")
    val got = graft.encoders.PcRemoval.pcaProject(df, dims = 2, outDims = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    Seq(-2.0, -1.0, 1.0, 2.0, 3.0).zipWithIndex.foreach { case (m, i) =>
      assert(math.abs(got(s"p$i")(0) - m) < 1e-9, s"c0 of p$i: ${got(s"p$i")}")
      assert(math.abs(got(s"p$i")(1)) < 1e-9, s"c1 of p$i: ${got(s"p$i")}")
    }
  }

  test("HashTokenEncoder: deterministic, fixed dims, same text → same vec") {
    val f = EntityFrame(
      Seq(("a", "alpha beta"), ("b", "alpha beta"), ("c", "gamma delta"))
        .toDF("id", "text"), "t", "id")
    val got = HashTokenEncoder(8).encode(f, None).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got.values.forall(_.length == 8))
    assert(got("a") == got("b"))
    assert(got("a") != got("c"))
    assert(got.values.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("GraphPropagationEncoder pulls neighbor signal across edges") {
    val attr = EntityFrame(
      Seq(("x", "alpha"), ("y", "omega")).toDF("id", "text"), "t", "id")
    val rel = Seq(("x", "r", "y")).toDF("head", "rel", "tail")
    val base = HashTokenEncoder(4).encode(attr, None).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val prop = GraphPropagationEncoder(HashTokenEncoder(4), rounds = 1, dims = 4)
      .encode(attr, Some(rel)).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    // deg(x)=deg(y)=1 → f'(x) = f(x)/2 + f(y)/2
    (0 until 4).foreach { d =>
      assert(math.abs(prop("x")(d) - (base("x")(d) / 2 + base("y")(d) / 2)) < 1e-12)
    }
  }

  test("LightEAEncoder: hand-computed single-edge graph, depth 1") {
    // base features pinned: f(a)=[1,0], f(b)=[0,1]
    val fixed: FrameEncoder = (frame: EntityFrame, _: Option[org.apache.spark.sql.DataFrame]) =>
      Seq(("a", Seq(1.0, 0.0)), ("b", Seq(0.0, 1.0))).toDF("id", "vec")
    val attr = EntityFrame(Seq(("a", "x"), ("b", "y")).toDF("id", "text"), "t", "id")
    val rel = Seq(("a", "r", "b")).toDF("head", "rel", "tail")
    val got = LightEAEncoder(fixed, depth = 1, dims = 2)
      .encode(attr, Some(rel)).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    // edges (a,b,r>) (b,a,r<); ent_ent: diag(a)=diag(b)=2, (a,b)=1, (b,a)=1
    // round 1 (rel channel zero): e1(a)=norm(2·f(a)+f(b))=[2,1]/√5
    // output = norm(concat(f0, e1)): ‖concat‖ = √2
    val s5 = math.sqrt(5); val s2 = math.sqrt(2)
    val want = Map(
      "a" -> List(1 / s2, 0.0, 2 / (s5 * s2), 1 / (s5 * s2)),
      "b" -> List(0.0, 1 / s2, 1 / (s5 * s2), 2 / (s5 * s2)))
    want.foreach { case (id, w) =>
      got(id).zip(w).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$id: $g vs $e") }
    }
  }

  test("LightEAEncoder: channel widths, row norms, rel-channel lag") {
    val attr = EntityFrame(
      Seq(("x", "alpha"), ("y", "omega"), ("z", "zeta")).toDF("id", "text"), "t", "id")
    val rel = Seq(("x", "r", "y")).toDF("head", "rel", "tail") // z disconnected
    def norms(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val d2 = norms(LightEAEncoder(HashTokenEncoder(4), depth = 2, dims = 4)
      .encode(attr, Some(rel)))
    assert(d2.values.forall(_.length == 12)) // (depth+1)·dims
    // every row L2-normalized
    d2.values.foreach(v => assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9))
    // disconnected z: propagation channels are dense zero fill
    assert(d2("z").drop(4).forall(_ == 0.0))
    assert(d2("z").take(4).exists(_ != 0.0))
    val dOnly = norms(LightEAEncoder(HashTokenEncoder(4), depth = 2, dims = 4,
      onlyNeighborInfo = true).encode(attr, Some(rel)))
    assert(dOnly.values.forall(_.length == 8)) // depth·dims, no f0 channel
  }

  test("EmbeddingKnnBlocker emits one block per left entity with ≤ k neighbors") {
    val b = EmbeddingKnnBlocker(HashTokenEncoder(8), k = 2)
      .assign(tableA, tableB)
    val m = blockMap(b)
    assert(m.size == 5) // one block per left entity
    m.foreach { case (key, (l, r)) =>
      assert(l == Set(key)) // NN block key = the left id
      assert(r.size <= 2 && r.nonEmpty)
      assert(r.subsetOf(Set("b1", "b2", "b3", "b4", "b5")))
    }
  }

  test("EmbeddingKnnBlocker hubness knob reranks over the widened candidate graph") {
    import graft.similarity.Similarity.HubnessReduction
    for (h <- Seq(HubnessReduction.Csls(3), HubnessReduction.Nicdm(3),
        HubnessReduction.LocalScaling(3), HubnessReduction.MutualProximity)) {
      val b = EmbeddingKnnBlocker(HashTokenEncoder(8), k = 2,
          hubness = Some(h), hubnessCandidates = 4)
        .assign(tableA, tableB)
      val m = blockMap(b)
      assert(m.size == 5, s"$h: one block per left entity")
      m.foreach { case (key, (l, r)) =>
        assert(l == Set(key) && r.size <= 2 && r.nonEmpty, s"$h: $key")
      }
    }
    // byName round-trip + unknown-name loudness
    assert(HubnessReduction.byName("nicdm", 7) == HubnessReduction.Nicdm(7))
    assert(HubnessReduction.byName("dsl", 7) == HubnessReduction.DisSimLocal(7))
    intercept[IllegalArgumentException] { HubnessReduction.byName("hubless") }
  }

  test("Sinkhorn preserves the candidate set and positivity") {
    val cand = Seq(
      ("l1", "r1", 0.9), ("l1", "r2", 0.5),
      ("l2", "r1", 0.4), ("l2", "r2", 0.8)).toDF("left_id", "right_id", "s")
    val out = Sinkhorn.rescale(cand, 3).collect()
      .map(r => (r.getString(1), r.getString(0), r.getDouble(2)))
    assert(out.length == 4)
    assert(out.forall(_._3 > 0))
  }

  test("KMeansClusterBlocker: every emitted id comes from its input side") {
    val b = KMeansClusterBlocker(HashTokenEncoder(8), numClusters = 3)
      .assign(tableA, tableB)
    val m = blockMap(b)
    assert(m.nonEmpty)
    m.values.foreach { case (l, r) =>
      assert(l.subsetOf(Set("a1", "a2", "a3", "a4", "a5")))
      assert(r.subsetOf(Set("b1", "b2", "b3", "b4", "b5")))
    }
  }

  test("AttributeClusteringBlocker: shared values always co-block") {
    val b = AttributeClusteringBlocker(KMeansClusterAssigner(HashTokenEncoder(8), 4))
      .assign(tableA, tableB)
    val pairs = b.pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // identical values land in the same cluster by construction:
    // a1/a2 share "USA" with b2; a3 shares "Bulgaria"+"04-12-1990" with b3
    assert(pairs.contains(("a1", "b2")))
    assert(pairs.contains(("a2", "b2")))
    assert(pairs.contains(("a3", "b3")))
  }

  test("TokenClustering.labels: noise modes (remove | token | keep)") {
    // 16 hash buckets over 5 tokens → most clusters have 1 member; with
    // minClusterSize=2 any singleton cluster is noise
    val vals = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("v")
    def keys(noise: NoiseHandling): Map[String, String] =
      TokenClustering.labels(vals, HashBucketClusterAssigner(16), 2, noise)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val kept = keys(NoiseHandling.Keep)
    val tok = keys(NoiseHandling.Token)
    val rem = keys(NoiseHandling.Remove)
    assert(kept.size == 5 && tok.size == 5)
    assert(rem.size < 5) // something was noise and removed
    // token mode: noise values keep themselves
    tok.foreach { case (v, k) =>
      assert(k == v || k.startsWith(TokenClustering.LabelPrefix))
    }
    // keep mode: noise collapses into the shared -1 pseudo-cluster
    assert(kept.values.forall(_.startsWith(TokenClustering.LabelPrefix)))
    assert(kept.values.exists(_ == TokenClustering.LabelPrefix + "-1"))
    // core clusters agree across modes
    rem.foreach { case (v, k) => assert(tok(v) == k && kept(v) == k) }
  }

  test("TokenClusteringTokenBlocker: co-clustered tokens co-block") {
    // one hash bucket = one cluster: with buckets=1 every token collapses
    // into a single pseudo-token, so ALL entities co-block
    val b = TokenClusteringTokenBlocker(
      HashBucketClusterAssigner(1), minClusterSize = 1).assign(tableA, tableB)
    val m = blockMap(b)
    assert(m.size == 1)
    val (l, r) = m.values.head
    assert(l == Set("a1", "a2", "a3", "a4", "a5"))
    assert(r == Set("b1", "b2", "b3", "b4", "b5"))
  }

  test("TokenClusteringTokenBlocker with KMeans assigner: shared tokens co-block") {
    val b = TokenClusteringTokenBlocker(
      KMeansClusterAssigner(HashTokenEncoder(8), 4), minClusterSize = 1,
      noise = NoiseHandling.Keep).assign(tableA, tableB)
    val pairs = b.pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a1/a2 share token "usa" with b2 → same cluster by determinism
    assert(pairs.contains(("a1", "b2")))
    assert(pairs.contains(("a2", "b2")))
  }

  test("hybrid composites: exact wiring runs end-to-end (hybrid.py:15-178)") {
    val relA = Seq(("a5", "knows", "a4")).toDF("head", "rel", "tail")
    val relB = Seq(("b4", "knows", "b5")).toDF("head", "rel", "tail")
    // CompositeEmbeddingBlocker: unique + token attr + embedding rel
    val ceb = CompositeEmbeddingBlocker(HashTokenEncoder(8), k = 2)
      .assign(tableA, tableB, Some(relA), Some(relB))
    // unique-name pass catches the shared birthdates/countries; embedding
    // kNN adds per-left-entity NN blocks for the uncovered rest
    assert(blockMap(ceb).nonEmpty)
    val cebPairs = ceb.pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cebPairs.contains(("a3", "b3"))) // Rebecca Smith / Bulgaria / 04-12-1990
    // CompositeRelationalDeepBlocker: reference defaults use_unique_name=false
    val crd = CompositeRelationalDeepBlocker(HashTokenEncoder(8), k = 2)
      .assign(tableA, tableB, Some(relA), Some(relB))
    assert(blockMap(crd).nonEmpty)
    // CompositeLightEABlocker: graph-propagated encoder + post-encode filter
    val cle = CompositeLightEABlocker(HashTokenEncoder(8), depth = 1, k = 2)
      .assign(tableA, tableB, Some(relA), Some(relB))
    assert(blockMap(cle).nonEmpty)
    assert(cle.pairs.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet.contains(("a3", "b3")))
  }

  test("CompositeLightEABlocker filters covered ids AFTER encoding") {
    val relA = Seq(("a5", "knows", "a4")).toDF("head", "rel", "tail")
    val relB = Seq(("b4", "knows", "b5")).toDF("head", "rel", "tail")
    val unique = UniqueNameBlocker().assign(tableA, tableB)
    val coveredL = unique.df.select(explode(col("left")).as("_cid"))
      .distinct().collect().map(_.getString(0)).toSet
    val cle = CompositeLightEABlocker(HashTokenEncoder(8), depth = 1, k = 2)
      .assign(tableA, tableB, Some(relA), Some(relB))
    // NN blocks (key = left id) must exist only for UNCOVERED left ids
    val nnKeys = blockMap(cle).keySet.filter(_.startsWith("a"))
    assert(nnKeys.nonEmpty)
    assert(nnKeys.intersect(coveredL).isEmpty,
      s"covered ids $coveredL leaked into NN keys $nnKeys")
  }

  test("PcRemoval: output ⊥ removed direction; residuals rank-1") {
    val f = EntityFrame(
      Seq(("a", "alpha beta gamma"), ("b", "alpha delta"), ("c", "epsilon zeta"),
          ("d", "alpha beta"), ("e", "omega psi chi")).toDF("id", "text"), "t", "id")
    val before = HashTokenEncoder(4).encode(f, None).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    val after = graft.encoders.PcRemoval
      .removeFirstPc(HashTokenEncoder(4).encode(f, None), 4).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map(t => t._1 * t._2).sum
    val resid = before.map { case (k, v) => k -> v.zip(after(k)).map(t => t._1 - t._2) }
    // out ⊥ residual (residual is the projection onto the removed pc)
    for (i <- after.keys; j <- resid.keys)
      assert(math.abs(dot(after(i), resid(j))) < 1e-9, s"${i} vs resid(${j})")
    // residuals are all parallel (rank-1): cross products vanish pairwise
    val rs = resid.values.filter(r => dot(r, r) > 1e-18).toSeq
    for (Seq(x, y) <- rs.combinations(2)) {
      val cos2 = dot(x, y) * dot(x, y) / (dot(x, x) * dot(y, y))
      assert(math.abs(cos2 - 1.0) < 1e-9)
    }
  }

  test("TableTokenEncoder: lookup join, unknown-token skip, SIF over the full stream") {
    // vocab knows alpha/beta only; zzz is out-of-vocabulary. Reference
    // semantics under test (pretrained.py:344-349, 486-515):
    //  - unknown tokens are skipped from the average (inner join), BUT
    //  - they still count toward SIF frequencies and the token total
    //    (value_counts runs on raw tokenizer output, before any lookup)
    val vocab = Seq(("alpha", Seq(1.0, 0.0)), ("beta", Seq(0.0, 1.0)))
      .toDF("token", "vec")
    val f = EntityFrame(
      Seq(("d1", "alpha beta"), ("d2", "alpha zzz"), ("d3", "zzz qqq"))
        .toDF("id", "text"), "t", "id")
    val got = graft.encoders.TableTokenEncoder(vocab, dims = 2, sif = true)
      .encode(f, None).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    // d3: every token unknown → absent (documented divergence from the
    // reference's random xavier row)
    assert(got.keySet == Set("d1", "d2"), got.keySet)
    // d2: one known token → its vector exactly, any weighting
    assert(got("d2") == List(1.0, 0.0))
    // d1: weights over the FULL stream: freq(alpha)=2, freq(beta)=1,
    // total=6 tokens (alpha×2, beta, zzz×2, qqq)
    val a = 1e-3
    val wA = a / (a + 2.0 / 6.0); val wB = a / (a + 1.0 / 6.0)
    val exp = List(wA / (wA + wB), wB / (wA + wB))
    got("d1").zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"d1 got ${got("d1")} want $exp") }
  }

  test("TableTokenEncoder: fromParquet + cache fingerprint distinguishes vector tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wv_").toString
    Seq(("alpha", Seq(1.0, 0.0)), ("beta", Seq(0.0, 1.0)))
      .toDF("token", "vec").write.parquet(s"$dir/v1.parquet")
    Seq(("alpha", Seq(0.5, 0.5)), ("beta", Seq(0.5, -0.5)))
      .toDF("token", "vec").write.parquet(s"$dir/v2.parquet")
    val f = EntityFrame(Seq(("d1", "alpha beta")).toDF("id", "text"), "t", "id")
    val e1 = graft.encoders.TableTokenEncoder
      .fromParquet(spark, s"$dir/v1.parquet", dims = 2)
    val got = e1.encode(f, None).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got("d1") == List(0.5, 0.5))
    // same schema, different table → different CachedEncoder key (the
    // default case-class toString would render both as the schema only)
    val e2 = graft.encoders.TableTokenEncoder
      .fromParquet(spark, s"$dir/v2.parquet", dims = 2)
    assert(e1.toString != e2.toString)
    assert(e1.toString ==
      graft.encoders.TableTokenEncoder
        .fromParquet(spark, s"$dir/v1.parquet", dims = 2).toString)
  }

  test("Experiment --word-vectors wires TableTokenEncoder into embedding blockers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wv_cli_").toString
    Seq(("alpha", Seq(1.0, 0.0))).toDF("token", "vec")
      .write.parquet(s"$dir/vec.parquet")
    val c = Experiment.parseArgs(Array(
      "--data", "x", "--blocker", "embedding-knn", "--out", "y",
      "--word-vectors", s"$dir/vec.parquet", "--sif", "--dims", "2"))
    assert(c.wordVectors.contains(s"$dir/vec.parquet") && c.sifWeighting)
    val enc = Experiment.encoderFor(c)
    assert(enc.isInstanceOf[graft.encoders.TableTokenEncoder],
      s"got $enc")
    assert(Experiment.blockerFor(c).isInstanceOf[EmbeddingKnnBlocker])
  }

  test("TokenClusteringMinHashLSHBlocker: identical pseudo-token sets collide") {
    // buckets=1 → every entity has the same single pseudo-token → identical
    // signatures → all entities share every band bucket
    val b = TokenClusteringMinHashLSHBlocker(
      HashBucketClusterAssigner(1), minClusterSize = 1,
      numPerm = 8, bands = 2).assign(tableA, tableB)
    val m = blockMap(b)
    assert(m.nonEmpty)
    m.values.foreach { case (l, r) =>
      assert(l == Set("a1", "a2", "a3", "a4", "a5"))
      assert(r == Set("b1", "b2", "b3", "b4", "b5"))
    }
  }
}
