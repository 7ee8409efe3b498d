package graft

import org.apache.spark.sql.functions._
import graft.core.Blocks
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Empty-input edge cases: every operator must return an empty result
  * (not throw) on an empty corpus — the degenerate partition a real
  * pipeline hits constantly (an empty date partition, a filter that
  * matches nothing). purge and the SVD-backed encoders originally threw
  * here (null aggregate / empty RowMatrix). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyTok = Seq.empty[(String, String)].toDF("id", "key")

  test("dedup operators return empty on an empty corpus") {
    val emptyPairs = Seq.empty[(String, String)].toDF("id_a", "id_b")
    assert(Dedup.exactDuplicates(emptyTok).isEmpty)
    assert(Dedup.minHashNearDupPairs(emptyTok, 16, 4, 0.2, 0.375).isEmpty)
    assert(Dedup.ngramJaccardPairs(emptyTok, 0.1).isEmpty)
    assert(Dedup.simHashNearDupPairs(emptyTok, 3).isEmpty)
    assert(Dedup.components(emptyPairs).isEmpty)
    // no near-dup pairs → every document survives
    val keep = Dedup.keepList(Seq("a", "b").toDF("id"), emptyPairs).collect()
    assert(keep.length == 2 && keep.forall(_.getBoolean(1)))
  }

  test("quality gate, shard assignment, and incremental near-dup handle empty input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.text.TextAnalysis.qualityFilter(emptyDocs).isEmpty)
    assert(Dedup.shardAssignment(emptyDocs.select(col("doc_id")), "doc_id", 8).isEmpty)
    // empty new batch against a corpus → no pairs; empty corpus → batch self-pairs only
    assert(Dedup.minHashNearDupAgainst(
      Seq(("c", "x")).toDF("id", "key"), emptyTok, 16, 4, 0.2).isEmpty)
    val selfOnly = Dedup.minHashNearDupAgainst(
      emptyTok, Seq(("n1", "x"), ("n2", "x")).toDF("id", "key"), 16, 4, 0.2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(selfOnly == Set(("n1", "n2")))
  }

  test("similarity operators return empty on empty inputs") {
    val emptyVec = Seq.empty[(String, Seq[Float])].toDF("id", "vec")
    val emptyCand = Seq.empty[(String, String, Double)]
      .toDF("left_id", "right_id", "cos")
    assert(Similarity.topKCosine(emptyVec, emptyVec, 3).isEmpty)
    assert(Similarity.cslsRerank(emptyCand, 3, 5).isEmpty)
    assert(Similarity.nicdmRerank(emptyCand, 3, 5).isEmpty)
    assert(Similarity.localScalingRerank(emptyCand, 3, 5).isEmpty)
    assert(Similarity.mutualProximityRerank(emptyCand, 3).isEmpty)
    // approx skew profile: same empty contract as keySkew/heavyHitters
    assert(graft.relational.Diagnostics.keySkewApprox(
      emptyCand.select(col("left_id").as("key")), "key").count() == 1)
  }

  test("SVD-backed encoders pass empty frames through") {
    val emptyEmb = Seq.empty[(String, Seq[Double])].toDF("id", "vec")
    assert(graft.encoders.PcRemoval.removeFirstPc(emptyEmb, 2).isEmpty)
    assert(graft.encoders.PcRemoval.pcaProject(emptyEmb, 2, 1).isEmpty)
  }

  test("purge of an empty blocks table is empty, not an error") {
    val empty = Blocks(Seq.empty[(String, Seq[String], Seq[String])]
      .toDF(Blocks.KeyCol, Blocks.LeftCol, Blocks.RightCol))
    assert(empty.purge().df.isEmpty)
    assert(empty.cap(10).df.isEmpty)
  }

  test("round-8 text/pipeline operators handle empty input") {
    import graft.text.TextAnalysis
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(TextAnalysis.packSequences(emptyDocs, "doc_id", "text", "source", 100L).isEmpty)
    assert(TextAnalysis.packBins(emptyDocs, "doc_id", "text", "source", 100L).isEmpty)
    assert(TextAnalysis.piiRedact(emptyDocs, "doc_id", "text").isEmpty)
    assert(TextAnalysis.tokenBudget(emptyDocs, "doc_id", "text", "source", 100L).isEmpty)
    assert(Dedup.sketchOverlap(emptyTok).isEmpty)
    // one lone group has no pairs, but must not throw
    assert(Dedup.sketchOverlap(Seq(("g", "tok")).toDF("id", "key")).isEmpty)
  }

  test("event analytics and fingerprint additions handle empty input") {
    import graft.events.EventAnalytics
    import graft.text.TextAnalysis
    val emptyEvents = Seq.empty[(Long, String, Long)]
      .toDF("user_id", "event_type", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val funnel = EventAnalytics.funnel(
      emptyEvents, Seq("signup", "view"), 86400L).collect()
    assert(funnel.forall(_.getLong(2) == 0L), "empty funnel is all-zero counts")
    assert(EventAnalytics.retention(emptyEvents, 30).isEmpty)
    assert(EventAnalytics.valueQuantiles(
      emptyEvents.withColumn("value", lit(1.0))).isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.winnow(emptyDocs).isEmpty)
    assert(TextAnalysis.vocabGrowth(emptyDocs).isEmpty)
  }

  test("pageRank and bigram LM handle empty input") {
    val emptyArcs = Seq.empty[(String, String)].toDF("src", "dst")
    assert(graft.relational.PageRank.pageRank(emptyArcs, 3).isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(graft.text.TextAnalysis.lmBigramScore(emptyDocs, docs).isEmpty)
    // empty reference: every bigram backs off; must not throw or NaN
    val backedOff = graft.text.TextAnalysis.lmBigramScore(docs, emptyDocs)
      .collect()
    assert(backedOff.length == 1 && !backedOff(0).getDouble(2).isNaN)
  }

  test("round-9 operators handle empty and degenerate input") {
    import graft.text.TextAnalysis
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(TextAnalysis.chunkWindows(emptyDocs, "doc_id", "text", 64, 16).isEmpty)
    assert(TextAnalysis.weightedSample(emptyDocs, "doc_id", "source",
      TextAnalysis.wsTokenCount(col("text")), 5).isEmpty)
    assert(TextAnalysis.bpeMerges(emptyDocs, "text", 2).isEmpty)
    assert(TextAnalysis.bpeEncode(emptyDocs, "doc_id", "text", 2).isEmpty)
    // degenerate BPE corpus: only single-char words → no adjacent pairs →
    // no merges learned; the no-op sentinel keeps the vocabulary alive,
    // so encode degrades to char-level segmentation instead of emptying
    val singles = Seq((1L, "src", "a b c a")).toDF("doc_id", "source", "text")
    assert(TextAnalysis.bpeMerges(singles, "text", 2).isEmpty)
    val enc = TextAnalysis.bpeEncode(singles, "doc_id", "text", 2).collect()
    assert(enc.length == 1 && enc(0).getLong(1) == 4L && enc(0).getLong(2) == 4L,
      s"char-level fallback expected, got ${enc.toSeq}")
    // zero-weight rows are excluded, never division-by-zero
    val zeroW = Seq((1L, "s", "x")).toDF("doc_id", "source", "text")
    assert(TextAnalysis.weightedSample(zeroW, "doc_id", "source", lit(0.0), 5).isEmpty)
  }

  test("sampleFrames: zero-length media emits no frames (descending-sequence guard)") {
    import graft.multimodal.Multimodal
    val df = Seq((1L, Array.empty[Byte]), (2L, "abcd".getBytes("UTF-8")))
      .toDF("id", "data")
    val got = graft.multimodal.Multimodal.sampleFrames(df, frameSize = 2, every = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(!got.exists(_._1 == 1L), "empty media must emit no frames")
    assert(got.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 1))
  }

  test("round-11 operators handle empty and degenerate input") {
    implicit val sp = spark
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // cross-doc dedup: empty corpus and all-short docs emit no spans;
    // cut passes short docs through intact
    assert(Dedup.crossDocSpans(emptyDocs, "doc_id", "text", 8).isEmpty)
    assert(Dedup.crossDocCut(emptyDocs, "doc_id", "text", 8).isEmpty)
    val short = Seq((1L, "too short"), (2L, "too short")).toDF("doc_id", "text")
    assert(Dedup.crossDocSpans(short, "doc_id", "text", 8).isEmpty)
    val cut = Dedup.crossDocCut(short, "doc_id", "text", 8).collect()
    assert(cut.length == 2 && cut.forall(_.getString(3) == "too short"))
    // skew diagnostics: empty input → one row of zero keys, no divide crash
    val skew = graft.relational.Diagnostics.keySkew(
      Seq.empty[String].toDF("key"), "key").collect()
    assert(skew.length == 1 && skew.head.getLong(0) == 0L)
    assert(graft.relational.Diagnostics.heavyHitters(
      Seq.empty[String].toDF("key"), "key").isEmpty)
    // index over an empty corpus searches to nothing (no throw)
    val dims = 8
    val emptyCorpus = Seq.empty[(Long, String, Array[Double])].toDF("id", "bucket", "vec")
    val idx = graft.similarity.IndexStore.buildIvfPq(
      emptyCorpus, dims = dims, subspaces = 2, codebookSize = 4)
    val q = Seq((1L, Array.fill(dims)(1.0))).toDF("id", "vec")
    assert(graft.similarity.IndexStore.search(q, idx, 3).isEmpty)
    assert(graft.streaming.AnnServing.serveIvfPq(q, idx, 3).isEmpty)
    // serving with an empty query batch is also empty
    val corpus = Seq((1L, "0", Array.fill(dims)(1.0))).toDF("id", "bucket", "vec")
    val idx2 = graft.similarity.IndexStore.buildIvfPq(
      corpus, dims = dims, subspaces = 2, codebookSize = 4)
    assert(graft.streaming.AnnServing.serveIvfPq(
      Seq.empty[(Long, Array[Double])].toDF("id", "vec"), idx2, 3).isEmpty)
    // NFC on null/empty strings
    val n = Seq((1L, null: String), (2L, "")).toDF("id", "s")
      .select(org.apache.spark.sql.graft.TextOps.normalize(col("s")).as("n")).collect()
    assert(n(0).isNullAt(0) && n(1).getString(0) == "")
  }
}
