package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.blockers.{DensityClusterAssigner, NoiseHandling, TokenClustering}
import graft.core.EntityFrame
import graft.encoders.FrameEncoder
import graft.similarity.Density

/** DBSCAN* semantics on hand-built geometry: clusters, noise, the
  * border-point divergence from classic DBSCAN, the LSH candidate
  * path, and NoiseHandling composition through the assigner seam. */
class DensitySpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated clusters away from the origin (so sign-LSH
  // buckets keep them intact), one isolated outlier, one border point
  private val points = Seq(
    "a1" -> Seq(5.0, 5.0), "a2" -> Seq(5.1, 5.0), "a3" -> Seq(5.2, 5.0),
    "b1" -> Seq(-5.0, -5.0), "b2" -> Seq(-5.1, -5.0), "b3" -> Seq(-5.0, -5.1),
    // border: 0.45 from a3, 0.55 from a2 — within eps of a CORE point but
    // not itself core (2nd-nearest 0.55 > eps)
    "c1" -> Seq(5.65, 5.0),
    // outlier: nearest other point ~6 away
    "n1" -> Seq(0.0, 1.0))

  private def emb: DataFrame = points.toDF("id", "vec")

  private def labelsOf(df: DataFrame): Map[String, Option[String]] =
    df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

  test("dbscanStar: clusters by density; border and outlier are noise") {
    val got = labelsOf(Density.dbscanStar(emb, eps = 0.5, minPts = 2))
    // component min-id labels
    assert(got("a1") == Some("a1") && got("a2") == Some("a1") && got("a3") == Some("a1"))
    assert(got("b1") == Some("b1") && got("b2") == Some("b1") && got("b3") == Some("b1"))
    // DBSCAN*'s documented divergence from classic DBSCAN: the border
    // point (within eps of core a3, itself not core) is NOISE, not a
    // cluster member
    assert(got("c1").isEmpty, s"border must be noise, got ${got("c1")}")
    assert(got("n1").isEmpty)
  }

  test("dbscanStar: minPts above neighborhood size turns everything to noise") {
    val got = labelsOf(Density.dbscanStar(emb, eps = 0.5, minPts = 5))
    assert(got.values.forall(_.isEmpty))
  }

  test("dbscanStar LSH candidate path matches exact on well-separated clusters") {
    val exact = labelsOf(Density.dbscanStar(emb, eps = 0.5, minPts = 2))
    val lsh = labelsOf(Density.dbscanStar(emb, eps = 0.5, minPts = 2,
      lshPlanes = 2, planeDims = 2))
    assert(lsh == exact, s"lsh $lsh vs exact $exact")
  }

  // ---- HDBSCAN flat cut (eps-ladder hierarchy + eom selection) ----

  // hierarchy fixture: two TIGHT clusters (0.1 spacing) that merge at
  // mid eps, one LOOSE cluster (0.8 spacing) that dies at fine eps, one
  // outlier only reachable at the coarsest level
  private val hier = Seq(
    "t1" -> Seq(5.0, 5.0), "t2" -> Seq(5.1, 5.0),
    "t3" -> Seq(5.2, 5.0), "t4" -> Seq(5.3, 5.0),
    "u1" -> Seq(6.4, 5.0), "u2" -> Seq(6.5, 5.0),
    "u3" -> Seq(6.6, 5.0), "u4" -> Seq(6.7, 5.0),
    "l1" -> Seq(-5.0, -5.0), "l2" -> Seq(-5.0, -4.2),
    "l3" -> Seq(-5.0, -3.4), "l4" -> Seq(-5.0, -2.6),
    "n1" -> Seq(0.0, 15.0))

  test("hdbscanFlatCut cuts different branches at different eps (eom)") {
    // ladder walk: eps 20 → one root (everything); 2.0 → {t∪u} and {l};
    // 1.0 → {t}, {u} split (born), {l2,l3} continues l; 0.3/0.25 → t and
    // u persist, l dead. No SINGLE eps yields {t},{u},{l} — the
    // hierarchy cut does: stability picks t and u at their fine-eps
    // form and l at its coarse-eps form.
    val got = labelsOf(Density.hdbscanFlatCut(
      hier.toDF("id", "vec"), epsLadder = Seq(20.0, 2.0, 1.0, 0.3, 0.25),
      minPts = 2, minClusterSize = 2))
    assert(Seq("t1", "t2", "t3", "t4").forall(got(_) == Some("3:t1")), got.toString)
    assert(Seq("u1", "u2", "u3", "u4").forall(got(_) == Some("3:u1")), got.toString)
    // l1/l4 shed at level 3 still belong to the selected l node (they
    // departed FROM it, the condensed-tree membership rule)
    assert(Seq("l1", "l2", "l3", "l4").forall(got(_) == Some("2:l1")), got.toString)
    // the outlier only ever belongs to the excluded single root → noise
    assert(got("n1").isEmpty, got.toString)
    // and no single-eps DBSCAN* slice can produce all three clusters:
    val at1 = labelsOf(Density.dbscanStar(hier.toDF("id", "vec"), 1.0, 2))
    assert(at1("l1").isEmpty && at1("l4").isEmpty, "at eps 1.0 the loose tail is noise")
    val at2 = labelsOf(Density.dbscanStar(hier.toDF("id", "vec"), 2.0, 2))
    assert(at2("t1") == at2("u1"), "at eps 2.0 the tight clusters merge")
  }

  test("hdbscanFlatCut: single-root-only hierarchy is all noise (allow_single_cluster=False)") {
    val tight = hier.filter(_._1.startsWith("t"))
    val got = labelsOf(Density.hdbscanFlatCut(
      tight.toDF("id", "vec"), epsLadder = Seq(2.0, 1.0), minPts = 2))
    assert(got.values.forall(_.isEmpty), got.toString)
  }

  test("hdbscanFlatCut: separate coarsest-level roots are each selectable") {
    val two = hier.filter(p => p._1.startsWith("t") || p._1.startsWith("l"))
    val got = labelsOf(Density.hdbscanFlatCut(
      two.toDF("id", "vec"), epsLadder = Seq(2.0, 0.3), minPts = 2))
    assert(Seq("t1", "t2", "t3", "t4").forall(got(_) == Some("1:t1")), got.toString)
    assert(Seq("l1", "l2", "l3", "l4").forall(got(_) == Some("1:l1")), got.toString)
  }

  test("autoEpsLadder reads the ladder off the data; auto recovers the hand-tuned cut") {
    // distinct per-point first-connection radii on `hier` (minPts=2):
    // tight interiors 0.1, tight ends 0.2, loose interiors 0.8, loose
    // ends 1.6, the outlier ~11.2 — five distinct values, so the
    // 5-level auto ladder is exactly those, descending
    val ladder = Density.autoEpsLadder(hier.toDF("id", "vec"), levels = 5, minPts = 2)
    assert(ladder.length == 5 && ladder == ladder.sorted.reverse, ladder.toString)
    assert(ladder.tail == Seq(1.6, 0.8, 0.2, 0.1), ladder.toString)
    assert(ladder.head > 11.0 && ladder.head < 11.5, ladder.toString)
    // the auto cut recovers the hand-tuned PARTITION (birth labels may
    // differ — the l cluster is born one level earlier on the auto
    // ladder — but the grouping and the noise set must match)
    def partition(df: DataFrame): (Set[Set[String]], Set[String]) = {
      val m = labelsOf(df)
      (m.collect { case (id, Some(c)) => (c, id) }.toSeq
         .groupBy(_._1).values.map(_.map(_._2).toSet).toSet,
       m.collect { case (id, None) => id }.toSet)
    }
    val hand = partition(Density.hdbscanFlatCut(
      hier.toDF("id", "vec"), epsLadder = Seq(20.0, 2.0, 1.0, 0.3, 0.25),
      minPts = 2, minClusterSize = 2))
    val auto = partition(Density.hdbscanFlatCutAuto(
      hier.toDF("id", "vec"), levels = 5, minPts = 2, minClusterSize = 2))
    assert(auto == hand, s"auto $auto vs hand $hand")
    // more levels than distinct radii → the ladder is just the radii
    assert(Density.autoEpsLadder(hier.toDF("id", "vec"), levels = 9, minPts = 2)
      == ladder, "levels beyond the distinct radii must not invent values")
  }

  test("autoEpsLadder: co-located duplicates yield r=0, which never enters the ladder") {
    // three identical vectors → every pairwise distance 0, core dist 0,
    // min reach 0; zero is not a radius (λ = 1/eps) and would trip the
    // flat cut's strictly-positive require — the derivation must drop it
    val dup = Seq(
      "d1" -> Seq(5.0, 5.0), "d2" -> Seq(5.0, 5.0), "d3" -> Seq(5.0, 5.0),
      "e1" -> Seq(9.0, 9.0), "e2" -> Seq(9.5, 9.0), "e3" -> Seq(9.5, 9.5))
    val ladder = Density.autoEpsLadder(dup.toDF("id", "vec"), levels = 3, minPts = 2)
    assert(ladder.nonEmpty && ladder.forall(_ > 0), ladder.toString)
    // and the auto cut runs end-to-end: the duplicates cluster together
    val got = labelsOf(Density.hdbscanFlatCutAuto(
      dup.toDF("id", "vec"), levels = 3, minPts = 2, minClusterSize = 2))
    assert(got("d1").isDefined && got("d1") == got("d2") && got("d2") == got("d3"),
      got.toString)
  }

  test("hdbscanFlatCutAuto: never-core input short-circuits to all noise") {
    // minPts above every neighborhood: no core points, empty ladder
    val got = labelsOf(Density.hdbscanFlatCutAuto(
      emb, levels = 3, minPts = 7, minClusterSize = 2))
    assert(got.size == points.size && got.values.forall(_.isEmpty), got.toString)
  }

  test("hdbscanFlatCut LSH candidate path matches exact on separated clusters") {
    val two = hier.filter(p => p._1.startsWith("t") || p._1.startsWith("l"))
    val exact = labelsOf(Density.hdbscanFlatCut(
      two.toDF("id", "vec"), epsLadder = Seq(2.0, 0.3), minPts = 2))
    val lsh = labelsOf(Density.hdbscanFlatCut(
      two.toDF("id", "vec"), epsLadder = Seq(2.0, 0.3), minPts = 2,
      lshPlanes = 2, planeDims = 2))
    assert(lsh == exact, s"lsh $lsh vs exact $exact")
  }

  test("CacheScope.seal releases localCheckpoint blocks, not just caches") {
    // Dataset.unpersist only reaches the CacheManager; checkpoint
    // blocks live at the RDD level (the flat cut's edges/m frames) —
    // seal must release those too, or a long session accumulates
    // executor storage until ContextCleaner GC
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ck = points.toDF("id", "vec").localCheckpoint()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint must persist blocks")
    graft.core.CacheScope.seal(ck.select("id"), ck)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      s"checkpoint blocks survived seal: ${added.intersect(after)}")
  }

  /** Deterministic test encoder: values map to fixed vectors. */
  private case class FixedEncoder(m: Map[String, Seq[Double]]) extends FrameEncoder {
    override def encode(frame: EntityFrame, rel: Option[DataFrame]): DataFrame =
      frame.df.select(col(frame.idCol).cast("string").as("id"))
        .join(m.toSeq.toDF("id", "vec"), Seq("id"))
  }

  test("DensityClusterAssigner: noise is a singleton, so NoiseHandling composes") {
    val enc = FixedEncoder(points.toMap)
    val vals = points.map(_._1).toDF("v")
    val assigner = DensityClusterAssigner(enc, eps = 0.5, minPts = 2)
    val assigned = assigner.assign(vals).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assigned("a2") == "a1" && assigned("b3") == "b1")
    // noise keeps itself as a singleton cluster id
    assert(assigned("c1") == "c1" && assigned("n1") == "n1")

    def keys(noise: NoiseHandling): Map[String, String] =
      TokenClustering.labels(vals, assigner, minClusterSize = 2, noise)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val remove = keys(NoiseHandling.Remove)
    assert(remove.keySet == Set("a1", "a2", "a3", "b1", "b2", "b3"))
    assert(remove("a3") == TokenClustering.LabelPrefix + "a1")
    val token = keys(NoiseHandling.Token)
    assert(token("c1") == "c1" && token("n1") == "n1")
    val keep = keys(NoiseHandling.Keep)
    assert(keep("c1") == TokenClustering.LabelPrefix + "-1" &&
      keep("n1") == TokenClustering.LabelPrefix + "-1")
  }

  // ---- exact HDBSCAN (Borůvka MST + driver condensed tree) ----

  private def partitionOf(m: Map[String, Option[String]]): Set[Set[String]] =
    m.toSeq.collect { case (id, Some(c)) => (c, id) }.groupBy(_._1)
      .values.map(_.map(_._2).toSet).toSet

  test("boruvkaMst finds the minimum spanning forest deterministically") {
    // two components: a triangle whose heaviest edge must be dropped,
    // plus an isolated pair
    val edges = Seq(
      ("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0),
      ("x", "y", 3.0)).flatMap { case (s, t, w) => Seq((s, t, w), (t, s, w)) }
      .toDF("id_a", "id_b", "reach")
    val got = Density.boruvkaMst(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("a", "b", 1.0), ("b", "c", 2.0), ("x", "y", 3.0)))
    // ONE-direction edge lists symmetrize internally: nodes appearing
    // only as id_b must still get labels and outgoing edges
    val oneDir = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0),
      ("x", "y", 3.0)).toDF("id_a", "id_b", "reach")
    val got2 = Density.boruvkaMst(oneDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got2 == got, s"one-direction input drifted: $got2")
  }

  test("boruvkaMst: multi-edges, equal-weight ties, and disconnected forests contract losslessly") {
    // parallel edges between the same endpoints (the contraction keeps
    // the per-pair minimum), an equal-weight tie broken by the
    // (w, na, nb) total order, and a disconnected component
    val edges = Seq(
      ("a", "b", 5.0), ("b", "a", 1.0), ("a", "b", 3.0), // multi-edge: min 1.0 wins
      ("b", "c", 2.0), ("c", "b", 2.0),                  // same edge both ways
      ("a", "c", 2.0),                                   // tie with (b,c): (a,c) < (b,c)
      ("x", "y", 7.0), ("x", "x", 9.0))                  // second tree + self-loop
      .toDF("id_a", "id_b", "reach")
    val got = Density.boruvkaMst(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // the MSF: (a,b,1.0), then one of the weight-2 edges per the total
    // order — (a,c,2.0) sorts before (b,c,2.0); (x,y,7.0) for the
    // second tree; the self-loop never appears
    assert(got == Set(("a", "b", 1.0), ("a", "c", 2.0), ("x", "y", 7.0)), got.toString)
  }

  test("boruvkaMst equals an independent driver-side Kruskal on random tie-heavy graphs") {
    // both algorithms respect the SAME total order (w, na, nb), under
    // which the MSF is unique (ties become distinct keys) — so the
    // distributed contracted Borůvka must emit exactly the forest a
    // 20-line reference Kruskal does. Small integer weights force many
    // ties; 30% density leaves some graphs disconnected.
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val n = 12 + rnd.nextInt(20)
      val edges = for {
        i <- 0 until n; j <- i + 1 until n
        if rnd.nextDouble() < 0.3
      } yield (f"n$i%02d", f"n$j%02d", (rnd.nextInt(8) + 1).toDouble)
      if (edges.nonEmpty) {
        val got = Density.boruvkaMst(edges.toDF("id_a", "id_b", "reach"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
        val uf = scala.collection.mutable.HashMap.empty[String, String]
        def find(x: String): String = {
          var r = x; while (uf.getOrElse(r, r) != r) r = uf(r); uf(x) = r; r
        }
        val expected = edges.sortBy { case (a, b, w) => (w, a, b) }
          .flatMap { case (a, b, w) =>
            val (ra, rb) = (find(a), find(b))
            if (ra == rb) None else { uf(rb) = ra; Some((a, b, w)) }
          }.toSet
        assert(got == expected, s"round $round (n=$n, |E|=${edges.size})")
      }
    }
  }

  test("autoEpsLadder on the chain fixture derives the closed-form radii") {
    // the m11_hdbscan_auto geometry: tight 6/5-chains @0.25 (interior
    // r=0.25, endpoints 0.5) + a loose 5-chain @1.0 (interior 1.0,
    // endpoints 2.0) → distinct first-connection radii are exactly
    // {2.0, 1.0, 0.5, 0.25}; levels=4 takes the full set, descending
    val pts = (0 until 27).map { i =>
      val x =
        if (i < 6) i * 0.25
        else if (i < 12) 4.0 + (i - 6) * 0.25
        else if (i < 17) 10.0 + (i - 12) * 0.25
        else if (i < 22) 14.0 + (i - 17) * 0.25
        else 20.0 + (i - 22) * 1.0
      (f"e$i%02d", Seq(x, 0.0))
    }
    val ladder = Density.autoEpsLadder(pts.toDF("id", "vec"),
      levels = 4, minPts = 2)
    assert(ladder == Seq(2.0, 1.0, 0.5, 0.25), ladder.toString)
  }

  test("boruvkaMst and completeLadder enforce the maxDriverRows guard loudly") {
    // the same driver-size contract hdbscanExact states: direct callers
    // on an oversized input must fail with the ladder-form pointer, not
    // OOM the driver silently
    val edges = Seq(("a", "b", 1.0), ("b", "c", 2.0))
      .toDF("id_a", "id_b", "reach")
    val ex = intercept[IllegalArgumentException] {
      Density.boruvkaMst(edges, maxDriverRows = 2L)
    }
    assert(ex.getMessage.contains("maxDriverRows"), ex.getMessage)
    val e = hier.toDF("id", "vec")
    val ex2 = intercept[IllegalArgumentException] {
      Density.completeLadder(e, minPts = 2, maxDriverRows = 3L)
    }
    assert(ex2.getMessage.contains("autoEpsLadder"), ex2.getMessage)
  }

  test("hdbscanExact equals the flat cut over the complete ladder (continuous λ)") {
    val e = hier.toDF("id", "vec")
    val ladder = Density.completeLadder(e, minPts = 2)
    val exact = labelsOf(Density.hdbscanExact(e, minPts = 2, minClusterSize = 2))
    val flat = labelsOf(Density.hdbscanFlatCut(e, ladder, minPts = 2,
      minClusterSize = 2, continuous = true))
    assert(exact == flat, s"exact $exact vs flat $flat")
    // semantics: the two tight clusters stay separate, the loose
    // cluster is found, the outlier is noise — no ladder tuning needed
    val parts = partitionOf(exact)
    assert(parts.contains(Set("t1", "t2", "t3", "t4")), parts.toString)
    assert(parts.contains(Set("u1", "u2", "u3", "u4")), parts.toString)
    assert(parts.contains(Set("l1", "l2", "l3", "l4")), parts.toString)
    assert(exact("n1").isEmpty)
  }

  test("hdbscanExact: randomized grid fixtures equal the complete-ladder flat cut") {
    // seeded grid coordinates (multiples of 1/8: exact doubles) —
    // collisions produce zero-radius merges, exercising the degenerate
    // paths; two different shed rules
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val pts = (0 until 20).map { i =>
        (f"p$i%02d", Seq(rnd.nextInt(40) / 8.0, rnd.nextInt(40) / 8.0))
      }
      val e = pts.toDF("id", "vec")
      val mcs = 2 + round % 2
      val ladder = Density.completeLadder(e, minPts = 2)
      val exact = labelsOf(
        Density.hdbscanExact(e, minPts = 2, minClusterSize = mcs))
      val flat = labelsOf(Density.hdbscanFlatCut(e, ladder, minPts = 2,
        minClusterSize = mcs, continuous = true))
      assert(exact == flat, s"round $round (mcs=$mcs): $exact vs $flat")
    }
  }

  test("hdbscanExact: driver guard fails loudly beyond maxDriverRows") {
    val ex = intercept[IllegalArgumentException] {
      Density.hdbscanExact(hier.toDF("id", "vec"), minPts = 2, maxDriverRows = 3)
    }
    assert(ex.getMessage.contains("maxDriverRows"))
  }

  test("streamed driver path (toLocalIterator past streamCollectRows) ≡ collect path") {
    // past streamCollectRows the exact path streams its node-sized
    // driver materializations (Borůvka round minima, core-distance
    // fill, label frame) one partition at a time; force that path on
    // the small fixtures and assert bit-equality with the collect form
    val e = hier.toDF("id", "vec")
    val defaultExact = labelsOf(Density.hdbscanExact(e, minPts = 2))
    val prev = Density.streamCollectRows
    try {
      Density.streamCollectRows = 0L
      assert(labelsOf(Density.hdbscanExact(e, minPts = 2)) == defaultExact)
      // the MST under streaming: same random tie-heavy check as the
      // collect-path Kruskal test
      val rnd = new scala.util.Random(7)
      val edges = (0 until 40).map { _ =>
        (s"n${rnd.nextInt(9)}", s"n${rnd.nextInt(9)}", (1 + rnd.nextInt(4)).toDouble)
      }.filter(t => t._1 != t._2)
      val streamed = Density.boruvkaMst(edges.toDF("id_a", "id_b", "reach"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      Density.streamCollectRows = prev
      val collected = Density.boruvkaMst(edges.toDF("id_a", "id_b", "reach"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(streamed == collected)
    } finally Density.streamCollectRows = prev
  }
}
