package graft

import org.apache.spark.sql.functions._
import graft.text.{Curation, TextAnalysis}

/** Curation verdict funnel: stage attribution, canonical-dup choice,
  * and funnel arithmetic on a hand-built corpus where every stage
  * engages (and a doc failing several stages is attributed to the
  * FIRST). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 25+ English filler words so quality passes unless we break it on
  // purpose; each doc's tail makes it unique unless it's a planned dup.
  private def enText(tag: String): String =
    ("the quick brown fox jumps over a lazy dog and then runs far away " +
      "with great speed through green fields toward distant hills ") + tag

  private lazy val corpus = Seq(
    ("1", enText("alpha body one")),          // keep
    ("2", enText("alpha body one")),          // exact dup of 1 → dup_of=1
    ("3", "der die das und mit von ist einzig artig wort satz heute morgen abend"), // lang=de, allowed
    ("4", "los las con para por una del solo texto frase aqui"), // lang=es → drop lang
    ("5", "the and for that"),                // lang=en but quality: n_tokens
    ("6", enText("contaminated window marker gram here")), // 4-gram hit
    ("7", enText("beta body two"))            // keep
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    ("b1", "contaminated window marker gram")).toDF("doc_id", "text")

  private lazy val v = Curation.verdicts(corpus, bench,
    allowedLangs = Seq("en", "de"), contamN = 4,
    minWords = 5, minStopwords = 0)
    .collect().map(r => r.getAs[String]("id") -> r).toMap

  test("drop_stage attribution is first-failure, in stage order") {
    assert(v("1").getAs[String]("drop_stage") == null)
    assert(v("1").getAs[Boolean]("keep"))
    assert(v("2").getAs[String]("drop_stage") == "duplicate")
    assert(v("2").getAs[String]("dup_of") == "1")
    assert(v("3").getAs[String]("drop_stage") == null) // de allowed
    assert(v("4").getAs[String]("drop_stage") == "lang")
    assert(v("5").getAs[String]("drop_stage") == "quality")
    assert(v("5").getAs[String]("quality_reason") == "n_tokens")
    assert(v("6").getAs[String]("drop_stage") == "contaminated")
    assert(v("6").getAs[Long]("n_hits") >= 1L)
    assert(v("7").getAs[String]("drop_stage") == null)
  }

  test("gate-dropped documents never shadow a surviving copy") {
    // doc 8 = exact dup of doc 1's token set but fails quality (the
    // same distinct tokens repeated → repetition rule); doc 1 must
    // still be canonical-kept, not deduped against the dropped 8.
    val c2 = corpus.union(Seq(
      ("0", enText("alpha body one") + " " + enText("alpha body one")))
      .toDF("doc_id", "text"))
    val v2 = Curation.verdicts(c2, bench,
        allowedLangs = Seq("en", "de"), contamN = 4,
        minWords = 5, minStopwords = 0, maxDupFrac = 0.3)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(v2("0").getAs[String]("drop_stage") == "quality")
    // "0" < "1" lexicographically, so if 0 had entered the dedup pool
    // it would have stolen canonicality from 1
    assert(v2("1").getAs[String]("drop_stage") == null)
    assert(v2("2").getAs[String]("dup_of") == "1")
  }

  test("funnel counts reconcile with the verdict table") {
    val verdicts = Curation.verdicts(corpus, bench,
      allowedLangs = Seq("en", "de"), contamN = 4,
      minWords = 5, minStopwords = 0)
    val f = Curation.funnel(verdicts).head()
    assert(f.getAs[Long]("n_docs") == 7L)
    assert(f.getAs[Long]("n_lang") == 1L)
    assert(f.getAs[Long]("n_quality") == 1L)
    assert(f.getAs[Long]("n_duplicate") == 1L)
    assert(f.getAs[Long]("n_contaminated") == 1L)
    assert(f.getAs[Long]("n_kept") == 3L)
    val keptTok = verdicts.filter(col("keep"))
      .agg(sum("n_tokens")).head().getLong(0)
    assert(f.getAs[Long]("kept_tokens") == keptTok)
    // grouped form partitions the global row
    val grouped = Curation.funnel(
      verdicts.withColumn("g", col("id") < "4"), Seq("g"))
    assert(grouped.agg(sum("n_docs")).head().getLong(0) == 7L)
    assert(grouped.agg(sum("n_kept")).head().getLong(0) == 3L)
  }

  test("funnel on an empty verdict table returns zero row, not null") {
    val f = Curation.funnel(
      Curation.verdicts(corpus.limit(0), bench.limit(0))).head()
    assert(f.getAs[Long]("n_docs") == 0L)
    assert(f.getAs[Long]("kept_tokens") == 0L)
  }

  test("Curate CLI: writes verdicts + funnel + manifest, no-benchmark mode") {
    import graft.text.Curate
    val out = java.nio.file.Files.createTempDirectory("graft_curate_").toString
    val corpusPath = s"$out/corpus"
    corpus.withColumn("source", when(col("doc_id") < "4", "sA").otherwise("sB"))
      .write.mode("overwrite").parquet(corpusPath)
    val c = Curate.parseArgs(Array(
      "--corpus", corpusPath, "--out", s"$out/run",
      "--langs", "en,de", "--contam-n", "4", "--min-words", "5",
      "--manifest"))
    val (v2, funnel) = Curate.run(spark, c)
    assert(v2.count() == 7L)
    // no benchmark → contamination never fires; doc 6 survives here
    assert(v2.filter(col("drop_stage") === "contaminated").isEmpty)
    assert(funnel.columns.head == "source" && funnel.count() == 2L)
    val manifest = spark.read.parquet(s"$out/run/manifest")
    assert(manifest.count() ==
      v2.filter(col("keep")).count())
    // unknown argument is rejected loudly
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("--corpus", "x", "--out", "y", "--bogus"))
    }
  }

  test("Curate CLI --stream --state-ttl: ingest form writes the same verdicts") {
    import graft.text.Curate
    val out = java.nio.file.Files.createTempDirectory("graft_curate_s_").toString
    val corpusPath = s"$out/corpus"
    corpus
      .withColumn("source", when(col("doc_id") < "4", "sA").otherwise("sB"))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .write.mode("overwrite").parquet(corpusPath)
    // the batch reference on the same knobs
    val batchRef = Curation.verdicts(spark.read.parquet(corpusPath), bench,
        allowedLangs = Seq("en", "de"), contamN = 4, minWords = 5)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(6)), r.getBoolean(7))).toMap
    val benchPath = s"$out/bench"
    bench.write.mode("overwrite").parquet(benchPath)
    val c = Curate.parseArgs(Array(
      "--corpus", corpusPath, "--benchmark", benchPath, "--out", s"$out/run",
      "--langs", "en,de", "--contam-n", "4", "--min-words", "5",
      "--stream", "--state-ttl", "2 hours", "--ts", "ts"))
    assert(c.stream && c.stateTtl == Some("2 hours"))
    val (v2, funnel) = Curate.run(spark, c)
    // AvailableNow drains the whole directory in one pass; single-pass
    // TTL behavior equals the unbounded (= batch) form, so the written
    // verdicts must match the batch reference row-for-row — except the
    // canonical choice, which is first-SEEN under arbitrary file order
    // (dup_of may point at either copy; drop_stage/keep still agree
    // because the fixture's duplicates are keep-class on both sides)
    val got = v2.collect().map(r => r.getAs[String]("id") ->
      (Option(r.getAs[String]("drop_stage")), r.getAs[Boolean]("keep"))).toMap
    assert(got.keySet == batchRef.keySet, got.toString)
    val dupIds = Set("1", "2")
    got.filterNot(kv => dupIds.contains(kv._1)).foreach { case (id, dk) =>
      assert(dk == batchRef(id), s"doc $id: $dk vs ${batchRef(id)}")
    }
    // exactly one of the duplicate pair survives, the other is its dup
    assert(got.count { case (id, (_, keep)) => dupIds.contains(id) && keep } == 1)
    assert(funnel.count() == 2L)
    // --state-ttl without --stream is rejected loudly (batch curation
    // holds no state to bound)
    intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("--corpus", "x", "--out", "y",
        "--state-ttl", "1 hour"))
    }
    // --state-ttl with a missing event-time column fails before launch
    val bad = Curate.parseArgs(Array(
      "--corpus", corpusPath, "--out", s"$out/run2",
      "--stream", "--state-ttl", "2 hours", "--ts", "nope"))
    val e = intercept[IllegalArgumentException] { Curate.run(spark, bad) }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("qualityFilter passthrough carries columns without reordering rows") {
    val out = TextAnalysis.qualityFilter(
      corpus.withColumn("lang", lit("xx")), "doc_id", "text",
      passthrough = Seq("lang"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "dup_frac_e6", "reason", "lang", "keep"))
    assert(out.filter(col("lang") =!= "xx").isEmpty)
  }
}
