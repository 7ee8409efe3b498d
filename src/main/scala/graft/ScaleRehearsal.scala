package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Text

/** Scale rehearsal for the dedup family: synthesize a corpus ~Nx the
  * input SF with injected skew (salted duplicate copies + a boilerplate
  * paragraph shared by a fifth of all documents — the "license header"
  * pathology that melts naive LSH), then run the near-dup pipeline WITH
  * its hot-key caps on and measure what the caps and the task-level
  * metrics actually did:
  *
  *   - cap engagement: how many band buckets (and how many bucket rows)
  *     the admission cap dropped — proof the B² blowup was intercepted;
  *   - per-task maxima (input bytes / shuffle-read bytes / records) via
  *     a listener — proof no task absorbs the skew alone, i.e. the job
  *     would survive the same shape at 1000 executors;
  *   - rounds-to-fixpoint of the duplicate-components loop — proof the
  *     propagation cost tracks component diameter, not corpus size.
  *
  * Prints a markdown table + one JSON line (NOTES material, not a
  * driver contract).
  *
  * Usage: `runMain graft.ScaleRehearsal [sfDir] [copies] [cap]`
  * (defaults: /root/testdata/sf0.1, 10 copies, cap 256).
  */
object ScaleRehearsal {

  /** The skewed corpus: `copies` salted duplicates of every document,
    * with a shared boilerplate paragraph appended to every doc whose
    * base id hashes into a fifth of the space. Salting the text with the
    * copy ordinal keeps copies NEAR-duplicates (jaccard just under 1)
    * rather than exact ones, so the LSH path does real verify work. */
  def skewedDocs(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val boiler = "licensed under the apache license version 2 0 you may not " +
      "use this file except in compliance with the license you may obtain " +
      "a copy of the license at www apache org licenses"
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("base_id"), col("text"))
      .select(col("base_id"), col("text"),
        explode(sequence(lit(0), lit(copies - 1))).as("copy"))
      .select(
        concat(col("base_id"), lit("_"), col("copy")).as("id"),
        concat(
          col("text"), lit(" salt"), col("copy"),
          when(pmod(Text.md5Long(col("base_id")), lit(5)) === 0,
            lit(" " + boiler)).otherwise(lit(""))).as("text"))
  }

  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("id"),
      explode(Text.wordShingles(
        Text.tokenize(col("text"), minLength = 1, stopwords = Nil), 3)).as("key"))
      .distinct()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cap = args.drop(2).headOption.map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskMaxListener
    spark.sparkContext.addSparkListener(listener)

    val docs = skewedDocs(spark, dir, copies)
    val sh = shingles(docs).persist()
    val nDocs = sh.select("id").distinct().count()
    val nShingleRows = sh.count()

    // cap engagement measured the same way capHotKeys decides: band
    // buckets over the cap, and how many rows they would have fed the
    // self-join (sum of their sizes; the candidate blowup is the SQUARE)
    val buckets = graft.functions.MinHash.buckets(sh, 16, 4)
    val hotStats = buckets.groupBy("key").agg(count(lit(1)).as("n"))
      .agg(
        sum(when(col("n") > cap, 1).otherwise(0)).as("hot_buckets"),
        sum(when(col("n") > cap, col("n")).otherwise(0)).as("hot_rows"),
        max(col("n")).as("max_bucket"),
        count(lit(1)).as("buckets"))
      .head()

    def phase[A](name: String)(f: => A): (A, Double, Long, Long, Long) = {
      org.apache.spark.sql.graft.ListenerBridge.flushListenerBus(spark.sparkContext)
      listener.reset()
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ListenerBridge.flushListenerBus(spark.sparkContext)
      System.err.println(f"[rehearsal] $name%-24s $dt%8.1f s  " +
        f"maxTaskIn=${listener.maxInputBytes / 1e6}%.0fMB " +
        f"maxShufRead=${listener.maxShuffleReadBytes / 1e6}%.0fMB " +
        f"maxShufRecords=${listener.maxShuffleReadRecords}")
      (a, dt, listener.maxInputBytes, listener.maxShuffleReadBytes,
        listener.maxShuffleReadRecords)
    }

    val (pairs, tPairs, inP, srP, rrP) = phase("minhash_neardup") {
      val p = Dedup.minHashNearDupPairs(sh, 16, 4, 0.2,
        estPrefilter = 0.375, maxBucketSize = cap).persist()
      (p, p.count())
    }
    val (incCount, tInc, inI, srI, rrI) = phase("incremental_neardup") {
      Dedup.minHashNearDupAgainst(
        sh.filter(Text.md5Long(col("id")) % 4 =!= 0),
        sh.filter(Text.md5Long(col("id")) % 4 === 0),
        16, 4, 0.2, estPrefilter = 0.375, maxBucketSize = cap).count()
    }
    val ((_, rounds), tCc, inC, srC, rrC) = phase("dup_components") {
      val (labels, r) = Dedup.componentsWithRounds(pairs._1)
      labels.count()
      (labels, r)
    }
    val (contCount, tCt, inT, srT, rrT) = phase("containment") {
      Dedup.minHashContainmentPairs(sh, 16, 4, 0.5, maxBucketSize = cap)
        .count()
    }
    // hub-skewed graph: every doc linked to one of 4 hub nodes (degree
    // ≈ nDocs/4 — the celebrity-node pathology for the per-iteration
    // arcs⋈ranks join; AQE skew splitting is what's being rehearsed)
    val (prCount, tPr, inR, srR, rrR) = phase("pagerank_hubbed") {
      val fwd = docs.select(col("id").as("src"),
        concat(lit("hub"), pmod(Text.md5Long(col("id")), lit(4))).as("dst"))
      val arcs = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.relational.PageRank.pageRank(arcs, 3).count()
    }

    val rows = Seq(
      ("minhash_neardup", tPairs, inP, srP, rrP, s"pairs=${pairs._2}"),
      ("incremental_neardup", tInc, inI, srI, rrI, s"pairs=$incCount"),
      ("dup_components", tCc, inC, srC, rrC, s"rounds=$rounds"),
      ("containment", tCt, inT, srT, rrT, s"pairs=$contCount"),
      ("pagerank_hubbed", tPr, inR, srR, rrR, s"nodes=$prCount"))

    println(s"\n### Scale rehearsal: $dir x$copies (docs=$nDocs, " +
      s"shingleRows=$nShingleRows, cap=$cap)\n")
    println(s"Cap engagement: hot_buckets=${hotStats.getLong(0)} " +
      s"hot_rows=${hotStats.getLong(1)} max_bucket=${hotStats.getLong(2)} " +
      s"total_buckets=${hotStats.getLong(3)}\n")
    println("| operator | wall s | max task input MB | max task shuffle-read MB | max task shuffle records | result |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, t, i, sr, rr, res) =>
      println(f"| $n | $t%.1f | ${i / 1e6}%.0f | ${sr / 1e6}%.0f | $rr | $res |")
    }
    // Locale.ROOT: f-interpolated doubles are locale-sensitive, and a
    // comma decimal would corrupt the JSON line.
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val json = rows.map { case (n, t, i, sr, rr, res) =>
      s""""$n":{"wall_s":${d1(t)},"max_task_input_mb":${i / 1000000},""" +
        s""""max_task_shuffle_mb":${sr / 1000000},"max_task_shuffle_records":$rr,"result":"$res"}"""
    }.mkString(
      s"""{"dir":"$dir","copies":$copies,"cap":$cap,"docs":$nDocs,""" +
        s""""shingle_rows":$nShingleRows,"hot_buckets":${hotStats.getLong(0)},""" +
        s""""hot_rows":${hotStats.getLong(1)},"max_bucket":${hotStats.getLong(2)},""",
      ",", "}")
    println(json)
    sh.unpersist(); pairs._1.unpersist()
    spark.stop()
  }
}
