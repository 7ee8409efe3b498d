package graft

import org.apache.spark.sql.functions._
import graft.blockers._
import graft.core.EntityFrame
import graft.relational.Relational

/** Relation-aware layer: reverse, importance filter, neighbor concat,
  * composite blockers (reference relation_aware.py / composite.py). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("reverseRel swaps head/tail and prefixes the relation") {
    val rel = Seq(("x1", "knows", "x2")).toDF("head", "rel", "tail")
    val got = Relational.reverseRel(rel, "inv_").as[(String, String, String)].collect()
    assert(got.toSeq == Seq(("x2", "inv_knows", "x1")))
  }

  test("concatNeighborAttributes mixes own and neighbor text (sorted distinct)") {
    val attr = EntityFrame(
      Seq(("x1", "foo", "bar"), ("x2", "baz", "qux")).toDF("id", "c1", "c2"),
      "t", "id")
    val rel = Seq(("x1", "r", "x2")).toDF("head", "rel", "tail")
    // own text is sorted-distinct tails (triple concat semantics):
    // x1 → "bar foo", x2 → "baz qux"; merged texts are sorted again
    val got = Relational.concatNeighborAttributes(attr, rel)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("x1" -> "bar foo baz qux", "x2" -> "bar foo baz qux"))
    val noOwn = Relational.concatNeighborAttributes(attr, rel, includeOwn = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(noOwn == Map("x1" -> "baz qux", "x2" -> "bar foo"))
  }

  test("filterImportance keeps each head's top-n relations") {
    val triples = Seq(
      ("h1", "ra", "t1"), ("h1", "ra", "t2"), ("h1", "rb", "t3"),
      ("h2", "rb", "t4")).toDF("head", "rel", "tail")
    val imp = Seq(("ra", 0.9), ("rb", 0.1)).toDF("rel", "importance")
    val got = Relational.filterImportance(triples, imp, 1)
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("h1", "ra", "t1"), ("h1", "ra", "t2"), ("h2", "rb", "t4")))
  }

  test("relation/name importance formulas") {
    val rel = Seq(("h1", "ra", "t1"), ("h2", "ra", "t1"), ("h3", "rb", "t2"))
      .toDF("head", "rel", "tail")
    val got = Relational.relationImportance(rel, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // ra: support=2/100, disc=1/2 → h(0.02,0.5)=0.038461...
    assert(math.abs(got("ra") - 2 * 0.02 * 0.5 / 0.52) < 1e-12)
    // rb: support=1/100, disc=1/1 → h(0.01,1.0)
    assert(math.abs(got("rb") - 2 * 0.01 * 1.0 / 1.01) < 1e-12)
  }

  test("SimpleRelationalTokenBlocker blocks on merged neighbor text") {
    // a4/b5 share token "nushi" only via own attrs; give a5 a neighbor
    // with nushi-text so the relational path adds a new block member
    val relA = Seq(("a5", "knows", "a4")).toDF("head", "rel", "tail")
    val relB = Seq(("b4", "knows", "b5")).toDF("head", "rel", "tail")
    val got = blockMap(SimpleRelationalTokenBlocker()
      .assign(tableA, tableB, Some(relA), Some(relB)))
    // plain token blocking finds nushi→([a4],[b5]); with neighbor text
    // a5 and b4 also carry "nushi"
    assert(got("nushi")._1 == Set("a4", "a5"))
    assert(got("nushi")._2 == Set("b5", "b4"))
  }

  test("CompositeUniqueNameBlocker: unique pass + anti-filtered token pass") {
    val got = blockMap(CompositeUniqueNameBlocker(TokenBlocker())
      .assign(tableA, tableB, None, None))
    // unique-name blocks (BlockerSpec golden)
    assert(got("11-12-1973") == (Set("a1"), Set("b1")))
    assert(got("02-02-1983") == (Set("a2"), Set("b2")))
    assert(got("Bulgaria") == (Set("a3"), Set("b3")))
    // token pass runs only on uncovered entities {a4,a5}×{b4,b5}
    assert(got("1990") == (Set("a4"), Set("b4")))
    assert(got("nushi") == (Set("a4"), Set("b5")))
    assert(got.keySet == Set("11-12-1973", "02-02-1983", "Bulgaria", "1990", "nushi"))
  }

  test("topNNameProperties keeps each entity's most important property") {
    import graft.relational.Relational
    // e1 has a high-discriminability "name" (distinct tails) and a
    // low-discriminability "type" (one shared tail) → n=1 keeps "name"
    val attr = graft.core.EntityFrame(
      Seq(
        ("e1", "name", "alice"), ("e1", "type", "person"),
        ("e2", "name", "bob"), ("e2", "type", "person"),
        ("e3", "name", "carol"), ("e3", "type", "person"))
        .toDF("head", "rel", "tail"),
      "t", "head", isTriple = true)
    val rel = Seq(("e1", "knows", "e2")).toDF("head", "rel", "tail")
    val kept = Relational.topNNameProperties(attr, rel, 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("e1", "name"), ("e2", "name"), ("e3", "name")))
    // the concat variant returns one text row per entity
    val conc = Relational.topNNamePropertiesConcat(attr, rel, 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(conc == Map("e1" -> "alice", "e2" -> "bob", "e3" -> "carol"))
  }

  test("countEntitiesApprox tracks the exact count closely") {
    import graft.relational.Relational
    val rel = (1 to 50).map(i => (s"h$i", "r", s"t$i")).toDF("head", "rel", "tail")
    val attr = graft.core.EntityFrame(
      (1 to 30).map(i => (s"h$i", s"v$i")).toDF("id", "v"), "t", "id")
    val exact = Relational.countEntities(attr, rel)
    val approx = Relational.countEntitiesApprox(attr, rel, 0.05)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"$approx vs $exact")
  }

  test("pageRank: hand-computed path graph, mass conservation, symmetry") {
    // undirected path a — b — c, arcs in both directions
    val arcs = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    // one iteration from uniform 1/3: deg(a)=deg(c)=1, deg(b)=2
    //   m(a) = m(c) = r(b)/2 = 1/6 → 0.05 + 0.85/6
    //   m(b) = r(a) + r(c) = 2/3  → 0.05 + 0.85·2/3
    val r1 = graft.relational.PageRank.pageRank(arcs, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r1("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(r1("a") == r1("c"), "symmetric endpoints rank equally")
    // no dangling nodes → total mass stays 1 every round
    val r3 = graft.relational.PageRank.pageRank(arcs, 3)
      .collect().map(_.getDouble(1))
    assert(math.abs(r3.sum - 1.0) < 1e-9)
    assert(r3.length == 3)
  }

  test("labelPropagation breaks equal-count ties toward the smallest label") {
    // single edge a — b: every round each node sees one neighbor vote and
    // one self vote (count 1 each) — a pure tie, which the published rule
    // resolves to the lexicographically smallest label. Pins the min_by
    // aggregation's (−count, label) ordering against the old
    // row_number(c DESC, label ASC) window it replaced.
    val arcs = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = graft.relational.PageRank.labelPropagation(arcs, 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a"))
  }
}
