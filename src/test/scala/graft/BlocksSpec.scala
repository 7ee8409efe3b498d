package graft

import org.apache.spark.sql.functions._
import graft.core.Blocks

/** Block-manager algebra goldens (reference tests/test_blocks.py:20-66). */
class BlocksSpec extends SparkSpec {

  private val example = Map(
    "2" -> (Seq("3"), Seq("3", "5")),
    "4" -> (Seq("4"), Seq("5")),
    "5" -> (Seq("4"), Seq("4")),
    "6" -> (Seq("4", "5"), Seq("4")),
    "7" -> (Seq("5"), Seq("4")),
    "10" -> (Seq("1", "2"), Seq("2")),
    "11" -> (Seq("2"), Seq("2")))

  test("statistics: sizes/assignments match (test_blocks.py:33)") {
    val st = blocksOf(example).statistics.collect()
      .map(r => r.getString(0) -> r.getAs[Int]("assignments")).toMap
    assert(st == Map("2" -> 3, "4" -> 2, "5" -> 2, "6" -> 3, "7" -> 2, "10" -> 3, "11" -> 2))
    val mean = st.values.sum.toDouble / st.size
    assert(math.abs(mean - 2.4285714285714284) < 1e-12)
  }

  test("pairs: multiset of candidate pairs (test_blocks.py:35-46)") {
    val got = blocksOf(example).pairs.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    val want = Seq(
      ("3", "3"), ("3", "5"), ("4", "5"), ("4", "4"), ("4", "4"),
      ("5", "4"), ("5", "4"), ("1", "2"), ("2", "2"), ("2", "2")).sorted
    assert(got.toSeq == want)
    assert(blocksOf(example).distinctPairs.count() == 7)
  }

  test("pairs: chunked enumeration equals the naive cross at PairChunk boundaries") {
    // member arrays at, just under, and just over the slice size — the
    // spread enumeration must emit exactly the same multiset the naive
    // per-block cross would
    val c = Blocks.PairChunk
    for (n <- Seq(c - 1, c, c + 1)) {
      val left = (0 until n).map(i => s"l$i")
      val right = Seq("r0", "r1", "r2")
      val b = blocksOf(Map("k" -> (left, right)))
      val got = b.pairs.groupBy("left_id", "right_id").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.size == n * right.size, s"n=$n distinct pairs")
      assert(got.values.forall(_ == 1L), s"n=$n multiplicities")
      assert(got.contains((s"l${n - 1}", "r2")), s"n=$n tail element present")
    }
    // duplicate ids WITHIN one member array keep their multiplicity
    val dup = blocksOf(Map("k" -> (Seq("a", "a"), Seq("b"))))
    assert(dup.pairs.count() == 2 && dup.distinctPairs.count() == 1)
  }

  test("combine: overlapping keys union, disjoint append (test_blocks.py:52-66)") {
    val other = Map(
      "6" -> example("6"),
      "4" -> (Seq("1", "2"), Seq("5")),
      "20" -> (Seq("5"), Seq("7")))
    val got = blocksOf(example).combine(blocksOf(other))
    val want = (example ++ Map(
      "4" -> (Seq("1", "2", "4"), Seq("5")),
      "20" -> (Seq("5"), Seq("7"))))
      .map { case (k, (l, r)) => k -> (l.toSet, r.toSet) }
    assertBlocksEqual(got, want)
  }

  test("cap drops only blocks above the comparison bound") {
    val capped = blocksOf(example).cap(1)
    assert(blockMap(capped).keySet == Set("4", "5", "7", "11"))
  }

  test("parquet round-trip: normal layout") {
    val dir = java.nio.file.Files.createTempDirectory("blk").toString
    val b = blocksOf(example)
    b.write(s"$dir/normal", "A", "B")
    assertBlocksEqual(Blocks.read(spark, s"$dir/normal"),
      example.map { case (k, (l, r)) => k -> (l.toSet, r.toSet) })
  }

  test("parquet round-trip: NN layout (scalar neighbor columns, null-padded)") {
    val dir = java.nio.file.Files.createTempDirectory("blk").toString
    val nn = Map(
      "a1" -> (Seq("a1"), Seq("b1", "b2", "b3")),
      "a2" -> (Seq("a2"), Seq("b2")),
      "a3" -> (Seq("a3"), Seq("b4", "b5")))
    blocksOf(nn).writeNN(s"$dir/nn")
    // written layout: id + k scalar columns (blocks.py:519-528 string names)
    val raw = spark.read.parquet(s"$dir/nn")
    assert(raw.columns.toSeq == Seq("id", "0", "1", "2"))
    // read-back dispatches on the scalar second column
    assertBlocksEqual(Blocks.read(spark, s"$dir/nn"),
      nn.map { case (k, (l, r)) => k -> (l.toSet, r.toSet) })
  }

  test("parquet round-trip: composite layout with nn_blocks sibling dir") {
    val dir = java.nio.file.Files.createTempDirectory("blk").toString
    val nn = Map(
      "a1" -> (Seq("a1"), Seq("b1", "b2")),
      "a2" -> (Seq("a2"), Seq("b3")))
    blocksOf(example).writeComposite(s"$dir/comp", blocksOf(nn))
    val got = Blocks.read(spark, s"$dir/comp")
    val want = (example ++ nn).map { case (k, (l, r)) => k -> (l.toSet, r.toSet) }
    assertBlocksEqual(got, want)
  }

  test("bucketed round-trip: post-read block-key join plans with no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("blk").toString
    val other = Map(
      "2" -> (Seq("9"), Seq("9")),
      "4" -> (Seq("8"), Seq("8")),
      "99" -> (Seq("7"), Seq("7")))
    blocksOf(example).writeBucketed(spark, "bkt_a", s"$dir/a", 4)
    blocksOf(other).writeBucketed(spark, "bkt_b", s"$dir/b", 4)
    try {
      val a = Blocks.readBucketed(spark, "bkt_a")
      val b = Blocks.readBucketed(spark, "bkt_b")
      // values round-trip
      assertBlocksEqual(a, example.map { case (k, (l, r)) => k -> (l.toSet, r.toSet) })
      // the combine join consumes the bucket spec: no shuffle, no sort
      val combined = a.combine(b)
      val plan = combined.df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assertBlocksEqual(combined, (example.map { case (k, (l, r)) => k -> (l.toSet, r.toSet) } ++ Map(
        "2" -> (Set("3", "9"), Set("3", "5", "9")),
        "4" -> (Set("4", "8"), Set("5", "8")),
        "99" -> (Set("7"), Set("7")))))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucketed entity frames join on id with no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("ef").toString
    tableA.writeBucketed(spark, "ef_a", s"$dir/a", 4)
    tableA.writeBucketed(spark, "ef_b", s"$dir/b", 4)
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // tiny tables would broadcast; force the shuffle-free bucketed
      // sort-merge path the sink exists for
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val a = graft.core.EntityFrame.readBucketed(spark, "ef_a", "A", "id")
      val b = graft.core.EntityFrame.readBucketed(spark, "ef_b", "B", "id")
      val joined = a.df.join(b.df.select("id"), Seq("id"), "left_semi")
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(joined.count() == 5)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS ef_a")
      spark.sql("DROP TABLE IF EXISTS ef_b")
    }
  }

  test("purge keeps a prefix of blocks by cardinality and never empties") {
    val purged = blocksOf(example).purge()
    val keys = blockMap(purged).keySet
    assert(keys.nonEmpty)
    // purge only ever removes largest-cardinality blocks: whatever
    // survives has comparisons <= the max of the survivors
    val st = blocksOf(example).statistics
      .collect().map(r => r.getString(0) -> r.getAs[Long]("comparisons")).toMap
    val maxKept = keys.map(st).max
    assert(st.filter(_._2 < maxKept).keySet.subsetOf(keys))
  }
}
