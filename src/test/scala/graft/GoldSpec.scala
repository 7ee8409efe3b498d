package graft

import org.apache.spark.sql.functions._
import graft.blockers.KMeansClusterBlocker
import graft.core.{EmbeddingStore, EntityFrame, Gold}
import graft.encoders.HashTokenEncoder

class GoldSpec extends SparkSpec {
  import spark.implicits._

  test("Gold.fromClusters expands clusters to inter-dataset pairs only") {
    val members = Seq(
      ("c1", "a1", "A"), ("c1", "a2", "A"), ("c1", "b1", "B"),
      ("c2", "a3", "A"), ("c2", "b2", "B"), ("c2", "b3", "B"),
      ("c3", "a4", "A")) // no B member → no pairs
      .toDF("cluster", "entity", "dataset")
    val got = Gold.fromClusters(members, "A", "B").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a1", "b1"), ("a2", "b1"), ("a3", "b2"), ("a3", "b3")))
  }

  test("EmbeddingStore round-trips (id, vec) parquet") {
    val emb = HashTokenEncoder(8).encode(tableA, None)
    val dir = java.nio.file.Files.createTempDirectory("emb").toString + "/e"
    assert(!EmbeddingStore.exists(spark, dir))
    EmbeddingStore.save(emb, dir)
    assert(EmbeddingStore.exists(spark, dir))
    val back = EmbeddingStore.load(spark, dir).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val orig = emb.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(back == orig)
  }

  test("bucketed gold joins candidate pairs with no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("gold").toString
    val gold = (1 to 5).map(i => (s"a$i", s"b$i")).toDF("A", "B")
    // a materialized candidate-pair table, bucketed like the gold sink
    val cand = Seq(("a1", "b1"), ("a2", "b9"), ("a3", "b3"))
      .toDF("left_id", "right_id")
    Gold.writeBucketed(gold, "gold_bkt", s"$dir/g", 4)
    Gold.writeBucketed(cand, "cand_bkt", s"$dir/c", 4)
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // tiny tables would broadcast; force the shuffle-free bucketed path
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val g = Gold.readBucketed(spark, "gold_bkt")
      val c = Gold.readBucketed(spark, "cand_bkt")
      // the TP join keys on (left_id, right_id) ⊇ the bucket key, so the
      // bucket spec satisfies the join's required distribution
      val tp = c.join(g, Seq("left_id", "right_id"))
      assert(!tp.queryExecution.executedPlan.toString.contains("Exchange"),
        tp.queryExecution.executedPlan.toString)
      assert(tp.count() == 2)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS gold_bkt")
      spark.sql("DROP TABLE IF EXISTS cand_bkt")
    }
  }

  test("M12 composition: cluster distinct attribute values, block on labels") {
    // attribute-clustering blocker = encode distinct values → cluster →
    // label as pseudo-token → standard block join (SURVEY M12 shape)
    val values = EntityFrame(
      tableA.df.select(col("id"), col("BirthCountry").as("v")), "vals", "id")
    val valuesB = EntityFrame(
      tableB.df.select(col("id"), col("BirthCountry").as("v")), "vals", "id")
    val blocks = KMeansClusterBlocker(HashTokenEncoder(8), numClusters = 3)
      .assign(values, valuesB)
    // identical values land in the same cluster → a1/a2 (USA) share a
    // block with b2 (USA)
    val m = blockMap(blocks)
    val usaBlock = m.values.find(_._1.contains("a1"))
    assert(usaBlock.isDefined && usaBlock.get._1.contains("a2"))
  }

  test("BlockingDataset.sample restricts all frames to sampled gold entities") {
    import graft.core.BlockingDataset
    val gold = (1 to 5).map(i => (s"a$i", s"b$i")).toDF("A", "B")
    val relA = Seq(("a1", "r", "a2"), ("a3", "r", "a4")).toDF("head", "rel", "tail")
    val ds = BlockingDataset(tableA, tableB, Some(relA), None, Some(gold))
    val sampled = ds.sample(2)
    val keptGold = sampled.gold.get.collect().map(_.getString(0)).toSet
    val keptLeft = sampled.left.df.collect().map(_.getString(0)).toSet
    assert(keptLeft == keptGold) // left frame == sampled gold left ids
    val keptRel = sampled.leftRel.get.collect().map(_.getString(0)).toSet
    assert(keptRel.subsetOf(keptGold))
    assert(keptGold.nonEmpty && keptGold.size < 5) // md5-mod actually sampled
  }
}
