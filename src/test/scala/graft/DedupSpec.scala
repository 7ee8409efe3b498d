package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.Text
import graft.text.TextAnalysis

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (String, String)*) =
    rows.toDF("id", "text")
      .select(col("id"), explode(Text.tokenize(col("text"), 1, Nil)).as("key"))
      .distinct()

  test("exactDuplicates groups reordered/repeated token sets") {
    val tp = toks(
      "d1" -> "alpha beta gamma",
      "d2" -> "gamma alpha beta alpha",
      "d3" -> "something else entirely")
    val got = Dedup.exactDuplicates(tp).collect()
    assert(got.length == 1)
    assert(got(0).getSeq[String](1) == Seq("d1", "d2"))
    assert(got(0).getLong(2) == 2)
  }

  test("minHashNearDupPairs catches identical sets and respects threshold") {
    val tp = toks(
      "d1" -> "alpha beta gamma delta epsilon",
      "d2" -> "alpha beta gamma delta epsilon",
      "d3" -> "unrelated words here now today")
    val got = Dedup.minHashNearDupPairs(tp, 16, 8, 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("d1", "d2", 1.0)))
  }

  test("minhash estPrefilter=0.375 is output-identical on the documents corpus") {
    // The bench/verify query runs with estPrefilter on (DedupQueries);
    // its oracle SQL has no prefilter — this equality is what keeps the
    // oracle green: at 6/16 the prefilter may only drop candidates the
    // exact-jaccard threshold drops anyway (measured: every true pair on
    // this corpus has estimate ≥ 0.875 at sf0.001/0.01).
    val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"),
        explode(Text.wordShingles(
          Text.tokenize(col("text"), minLength = 1, stopwords = Nil), 3)).as("key"))
      .distinct()
    def run(pre: Double) =
      Dedup.minHashNearDupPairs(sh, 16, 4, 0.2, estPrefilter = pre)
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          math.round(r.getDouble(2) * 1e6)))
        .toSet
    val unfiltered = run(0.0)
    assert(unfiltered.nonEmpty, "corpus should contain near-dup pairs")
    assert(run(0.375) == unfiltered)
  }

  test("ngramJaccardPairs computes exact shingle jaccard") {
    val sh = Seq(
      ("d1", "a b c"), ("d1", "b c d"),
      ("d2", "a b c"), ("d2", "b c d"),
      ("d3", "a b c"), ("d3", "x y z"))
      .toDF("id", "key")
    val got = Dedup.ngramJaccardPairs(sh, 0.1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("d1", "d2")) == 1.0)
    assert(math.abs(got(("d1", "d3")) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(("d2", "d3")) - 1.0 / 3) < 1e-12)
  }

  test("ngramJaccardPairs: multi-chunk doc set enumerates exactly C(n,2) ordered pairs") {
    // 1030 docs (> Blocks.PairChunk = 1024, so the chunked enumeration's
    // cross-chunk branch is load-bearing) share one shingle; each doc
    // also carries two private shingles → jaccard = 1/5 for every pair
    val n = 1030
    val sh = (0 until n).flatMap(i =>
      Seq((f"d$i%04d", "shared"), (f"d$i%04d", s"own${i}_1"), (f"d$i%04d", s"own${i}_2")))
      .toDF("id", "key")
    val got = Dedup.ngramJaccardPairs(sh, 0.1)
    assert(got.count() == n.toLong * (n - 1) / 2)
    // within-chunk (d0000, d0001) and cross-chunk (d0000, d1029) both
    // present with the exact jaccard; ordering invariant holds globally
    val some = got.filter(col("id_a") === "d0000" &&
        col("id_b").isin("d0001", "d1029")).collect()
    assert(some.length == 2 &&
      some.forall(r => math.abs(r.getDouble(2) - 0.2) < 1e-12), some.mkString(";"))
    assert(got.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("ngramJaccardPairs: uncapped hot-set guard raises loudly, capped path is exempt") {
    // 4 docs share one boilerplate shingle; with uncappedSetLimit = 3 the
    // uncapped path must fail in-plan naming the maxDocFreq lever...
    val sh = (1 to 4).flatMap(i => Seq((s"d$i", "boiler"), (s"d$i", s"own$i")))
      .toDF("id", "key")
    val ex = intercept[Exception] {
      Dedup.ngramJaccardPairs(sh, 0.1, uncappedSetLimit = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("maxDocFreq") && m.contains("boiler")),
      msgs(ex).mkString(" | "))
    // ...while a capped run with the same limit bounds every set first —
    // no guard, identical pairs to the unlimited default
    val capped = Dedup.ngramJaccardPairs(sh, 0.1, maxDocFreq = 4,
      uncappedSetLimit = 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val default = Dedup.ngramJaccardPairs(sh, 0.1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == default && default.nonEmpty)
  }

  test("lshRecall: identical sampled docs are caught; counts consistent") {
    // sampleMod=1 keeps every doc, so the gate runs on the full fixture:
    // two identical docs (J=1, caught by any banding) + one unrelated.
    val sh = Seq(
      ("d1", "a b c"), ("d1", "b c d"), ("d1", "c d e"),
      ("d2", "a b c"), ("d2", "b c d"), ("d2", "c d e"),
      ("d3", "x y z"), ("d3", "y z w"), ("d3", "z w v"))
      .toDF("id", "key")
    val r = Dedup.lshRecall(sh, numPerm = 16, bands = 4,
      threshold = 0.5, sampleMod = 1).collect().head
    assert(r.getAs[Long]("n_docs") == 3)
    assert(r.getAs[Long]("n_true_pairs") == 1) // only (d1, d2)
    assert(r.getAs[Long]("n_caught") == 1)     // identical sigs collide everywhere
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("expected_recall") == 1.0) // J=1 → S-curve 1
    val nc = r.getAs[Long]("n_candidates")
    assert(nc >= 1 && r.getAs[Double]("false_candidate_rate") ==
      math.floor((nc - 1).toDouble / nc * 1e6 + 0.5) / 1e6)
  }

  test("lshRecall: vacuous sample reports recall 1 with zero pairs") {
    val sh = Seq(("d1", "a b c"), ("d2", "x y z")).toDF("id", "key")
    val r = Dedup.lshRecall(sh, 16, 4, threshold = 0.9, sampleMod = 1)
      .collect().head
    assert(r.getAs[Long]("n_true_pairs") == 0)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("expected_recall") == 1.0)
  }

  test("simHashNearDupPairs: identical docs at hamming 0") {
    val tp = toks(
      "d1" -> "alpha beta gamma delta epsilon zeta eta theta",
      "d2" -> "alpha beta gamma delta epsilon zeta eta theta")
    val got = Dedup.simHashNearDupPairs(tp, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq(("d1", "d2", 0)))
  }

  test("langId picks the lexicon with most hits; und on no hits") {
    val df = Seq(
      ("e", "the cat and the dog with that hat"),
      ("g", "der hund und die katze mit von"),
      ("u", "zzz qqq xxx")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("e" -> "en", "g" -> "de", "u" -> "und"))
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq(("x", "Hello, world! It's 42.")).toDF("id", "text")
    val got = df.select(
      TextAnalysis.wsTokenCount(col("text")),
      TextAnalysis.bpeIshTokenCount(col("text"))).head()
    assert(got.getInt(0) == 4)
    // hello , world ! it ' s 42 . → 9
    assert(got.getInt(1) == 9)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(("a", "alpha beta gamma"), ("b", "gamma beta alpha"),
      ("c", "alpha beta gamma")).toDF("id", "text")
    val got = df.select(col("id"),
      TextAnalysis.fingerprint(Text.tokenize(col("text"), 1, Nil)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == got("c"))
    assert(got("a") != got("b"))
    assert(got.values.forall(v => v >= 0 && v < TextAnalysis.FingerprintMod))
  }

  test("components merges multi-hop chains and keeps singletons apart") {
    // chain a-b-c-d (diameter 3) + isolated pair x-y; min-id label wins
    val pairs = Seq(("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.components(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("components crosses checkpoint rounds on a long chain") {
    // path of 14 nodes: min label walks 13 hops → 13 rounds, crossing the
    // every-other-round lineage truncation several times; labels must be
    // unaffected by where the checkpoints land
    val ids = (0 until 14).map(i => f"n$i%02d")
    val pairs = ids.sliding(2).map { case Seq(a, b) => (b, a) }.toSeq
      .toDF("id_a", "id_b")
    val got = graft.dedup.Dedup
      .components(pairs, maxIterations = 20, checkpointInterval = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == ids.map(_ -> "n00").toMap)
  }

  test("components converges on a 120-link chain via pointer jumping") {
    // plain min-propagation would need 120 rounds (one hop per round) —
    // far past maxIterations=20; the round-4+ pointer jump shrinks the
    // distance geometrically, so this converges AND reports few rounds
    val ids = (0 to 120).map(i => f"n$i%03d")
    val pairs = ids.sliding(2).map { case Seq(a, b) => (b, a) }.toSeq
      .toDF("id_a", "id_b")
    val (labels, rounds) = graft.dedup.Dedup
      .componentsWithRounds(pairs, maxIterations = 20, checkpointInterval = 5)
    val got = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == ids.map(_ -> "n000").toMap)
    assert(rounds <= 15, s"expected jumping to converge in ≤15 rounds, took $rounds")
  }

  test("components converges in the folded init round on stars and self-loops") {
    // star b-a, c-a converges at round 1 — the round that is FOLDED into
    // the init aggregate (label_1 = min(id, min neighbor)); self-loops
    // must neither change labels nor count as a frontier entry
    val pairs = Seq(("b", "a"), ("c", "a"), ("d", "d")).toDF("id_a", "id_b")
    val (labels, rounds) = graft.dedup.Dedup.componentsWithRounds(pairs)
    val got = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d"))
    // one propagation round total: init computed it, the probe saw an
    // unchanged round-2 frontier of exactly the star leaves' labels
    assert(rounds <= 2, s"star should converge in ≤2 rounds, took $rounds")
  }

  test("components fails loudly instead of returning under-merged labels") {
    // 2 iterations cannot close a 10-hop chain; silent truncation would
    // report the far end as a separate component — the contract is throw
    val ids = (0 to 10).map(i => f"n$i%02d")
    val pairs = ids.sliding(2).map { case Seq(a, b) => (b, a) }.toSeq
      .toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      graft.dedup.Dedup.components(pairs, maxIterations = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("incremental near-dup pairs new docs against corpus, never corpus against itself") {
    def toks(id: String, ws: String*) = ws.map(w => (id, w))
    // c1 ≡ c2 (identical corpus docs — must NOT pair); n1 ≡ c1; n2 ≡ n3
    val corpus = (toks("c1", "a", "b", "c") ++ toks("c2", "a", "b", "c") ++
      toks("c3", "x", "y", "z")).toDF("id", "key")
    val fresh = (toks("n1", "a", "b", "c") ++ toks("n2", "p", "q") ++
      toks("n3", "p", "q")).toDF("id", "key")
    val got = graft.dedup.Dedup
      .minHashNearDupAgainst(corpus, fresh, numPerm = 16, bands = 4, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c1", "n1"), ("c2", "n1"), ("n2", "n3")))
  }

  test("incremental near-dup: new batch supersedes re-submitted corpus ids") {
    def toks(id: String, ws: String*) = ws.map(w => (id, w))
    // c1 is re-crawled in the new batch with DIFFERENT content; its stale
    // corpus rows must not merge into a phantom signature. Expected: c1's
    // new content pairs with n2 (identical), not with its old self's
    // neighbors (c2 matches only the stale content).
    val corpus = (toks("c1", "a", "b", "c") ++ toks("c2", "a", "b", "c") ++
      toks("c3", "x", "y", "z")).toDF("id", "key")
    val fresh = (toks("c1", "p", "q", "r") ++ toks("n2", "p", "q", "r"))
      .toDF("id", "key")
    val got = Dedup
      .minHashNearDupAgainst(corpus, fresh, numPerm = 16, bands = 4, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c1", "n2")))
    // ...and equals running against a corpus with the overlap pre-removed
    val disjoint = Dedup.minHashNearDupAgainst(
        corpus.filter(col("id") =!= "c1"), fresh, 16, 4, 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == disjoint)
  }

  test("hot-key caps: output-identical when no key exceeds the cap") {
    val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"),
        explode(Text.wordShingles(
          Text.tokenize(col("text"), minLength = 1, stopwords = Nil), 3)).as("key"))
      .distinct()
    val nDocs = sh.select("id").distinct().count().toInt
    def collectPairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    // cap = corpus size: no key can exceed it → bit-identical output
    val ngUncapped = collectPairs(Dedup.ngramJaccardPairs(sh, 0.1))
    assert(ngUncapped.nonEmpty)
    assert(collectPairs(Dedup.ngramJaccardPairs(sh, 0.1, maxDocFreq = nDocs)) == ngUncapped)
    val mhUncapped = collectPairs(Dedup.minHashNearDupPairs(sh, 16, 4, 0.2))
    assert(mhUncapped.nonEmpty)
    assert(collectPairs(
      Dedup.minHashNearDupPairs(sh, 16, 4, 0.2, maxBucketSize = 4 * nDocs)) == mhUncapped)
  }

  test("hot-key caps: skew injection — capped join volume bounded, diff confined to hot keys") {
    // VERDICT r5 #7: this synthetic corpus is near-dup dense (memory:
    // pruning measures neutral here), so harden against its blind spot
    // with an injected heavy tail: one boilerplate shingle across 30% of
    // docs, everything else unique per doc apart from genuine dup pairs.
    val n = 200
    val boiler = (0 until n).filter(_ % 10 < 3).flatMap { i =>        // 30%: hot key
      Seq((f"d$i%03d", "BOILER"))
    }
    val unique = (0 until n).flatMap { i =>                           // per-doc body
      (0 until 5).map(j => (f"d$i%03d", s"u$i-$j"))
    }
    // genuine dups on NON-boiler docs (i%10 = 7 ≥ 3): e_i clones d_i's
    // body exactly, so the pair has jaccard 1.0 and identical signatures
    val dups = (0 until n).filter(_ % 50 == 7).flatMap { i =>
      (0 until 5).map(j => (f"e$i%03d", s"u$i-$j"))
    }
    val sh = (boiler ++ unique ++ dups).toDF("id", "key")
    val cap = 10
    // (a) capped candidate join volume stays under the per-key budget
    //     Σ_kept df², while the uncapped hot key alone blows past it
    def joinRows(df: org.apache.spark.sql.DataFrame): Long = {
      val freq = df.groupBy("key").count()
      freq.agg(sum(col("count") * col("count"))).head().getLong(0)
    }
    val hot = sh.groupBy("key").count().filter(col("count") > cap)
      .select("key").as[String].collect().toSet
    assert(hot == Set("BOILER"))
    val capped = sh.filter(!col("key").isin(hot.toSeq: _*))
    assert(joinRows(capped) <= cap.toLong * cap * sh.select("key").distinct().count())
    assert(joinRows(sh) >= (n * 3L / 10) * (n * 3L / 10)) // hot key alone: 60²
    // (b) capped output ⊆ uncapped; every dropped/changed pair shares the
    //     hot key; pairs not touching it are value-identical
    def pairsOf(maxDf: Int) = Dedup.ngramJaccardPairs(sh, 0.05, maxDocFreq = maxDf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val un = pairsOf(0)
    val cp = pairsOf(cap)
    assert(cp.keySet.subsetOf(un.keySet))
    val boilerDocs = boiler.map(_._1).toSet
    (un.keySet -- cp.keySet).foreach { case (a, b) =>
      assert(boilerDocs.contains(a) && boilerDocs.contains(b),
        s"dropped pair ($a,$b) must share the capped key")
    }
    cp.foreach { case (p @ (a, b), j) =>
      if (!(boilerDocs.contains(a) && boilerDocs.contains(b)))
        assert(j == un(p), s"pair $p untouched by the cap must keep its jaccard")
      else assert(j <= un(p) + 1e-12, s"pair $p may only lose intersection")
    }
    // the genuine dup pairs survive capping at full jaccard
    (0 until n).filter(_ % 50 == 7).foreach { i =>
      val p = (f"d$i%03d", f"e$i%03d")
      assert(math.abs(cp(p) - 1.0) < 1e-9, s"dup pair $p: ${cp.get(p)}")
    }
    // same containment for the LSH path's bucket cap
    def mh(cap2: Int) = Dedup.minHashNearDupPairs(sh, 16, 4, 0.5, maxBucketSize = cap2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val mhUn = mh(0)
    val mhCp = mh(cap)
    assert(mhCp.subsetOf(mhUn))
    assert((0 until n).filter(_ % 50 == 7)
      .forall(i => mhCp.contains((f"d$i%03d", f"e$i%03d"))),
      "exact-clone pairs with no hot shingle survive the bucket cap")
  }

  test("qualityFilter drops null-text docs deterministically as n_tokens") {
    val df = Seq(
      ("ok", Option((Seq("the") ++ (1 to 30).map(i => s"word$i")).mkString(" "))),
      ("nil", Option.empty[String])).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(4), Option(r.getString(3))))).toMap
    assert(got("ok")._2)
    assert(got("nil") == ((1L, false, Some("n_tokens"))))
  }

  test("keepList keeps singletons and component minima, labels the rest") {
    val ids = Seq("a", "b", "c", "x", "y", "solo").toDF("doc")
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.keepList(ids, pairs).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      "a" -> ((true, None)), "b" -> ((false, Some("a"))),
      "c" -> ((false, Some("a"))), "x" -> ((true, None)),
      "y" -> ((false, Some("x"))), "solo" -> ((true, None))))
  }

  test("keepBest keeps the highest-scored member per component, min-id on ties") {
    val scored = Seq(
      ("a", 10.0), ("b", 99.0), ("c", 50.0), // component {a,b,c}: b wins on score
      ("x", 7.0), ("y", 7.0),                // component {x,y}: tie → min id x
      ("solo", 1.0)).toDF("doc", "sc")
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = Dedup.keepBest(scored, "doc", "sc", pairs).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      "a" -> ((false, Some("b"))), "b" -> ((true, None)),
      "c" -> ((false, Some("b"))), "x" -> ((true, None)),
      "y" -> ((false, Some("x"))), "solo" -> ((true, None))))
  }

  test("keepBest: an all-null-score component still keeps exactly one member (min id)") {
    // max ignores nulls → _best is null for {p,q}; the === filter used
    // to drop the component from rep and every member's keep column
    // evaluated to SQL NULL — filter(col("keep")) then silently lost
    // the whole cluster. The null-safe <=> falls back to min-id keep-one.
    val scored = Seq(
      ("p", null.asInstanceOf[java.lang.Double]),
      ("q", null.asInstanceOf[java.lang.Double]),
      ("a", java.lang.Double.valueOf(5.0)),
      ("b", java.lang.Double.valueOf(9.0))).toDF("doc", "sc")
    val pairs = Seq(("p", "q"), ("a", "b")).toDF("id_a", "id_b")
    val got = Dedup.keepBest(scored, "doc", "sc", pairs).collect()
      .map(r => r.getString(0) -> ((r.isNullAt(1), r.getBoolean(1)))).toMap
    assert(got.values.forall(!_._1), s"keep must never be NULL: $got")
    assert(got("p")._2 && !got("q")._2, got.toString)
    assert(got("b")._2 && !got("a")._2, got.toString)
  }

  test("ngramJaccardPairs: duplicate (id, key) input rows do not inflate the intersection") {
    // an un-deduped shingle feed: (d1, 'a b c') twice. count(*) over the
    // self-join counted it double (jaccard > 1 / negative denominators);
    // countDistinct keeps the set semantics.
    val sh = Seq(
      ("d1", "a b c"), ("d1", "a b c"), ("d1", "b c d"),
      ("d2", "a b c"), ("d2", "b c d"))
      .toDF("id", "key")
    val got = Dedup.ngramJaccardPairs(sh, 0.1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("d1", "d2")) == 1.0, got.toString)
  }

  test("banding operators reject numPerm not divisible by bands loudly") {
    val sh = Seq(("d1", "a b c"), ("d2", "a b c")).toDF("id", "key")
    val ex = intercept[IllegalArgumentException] {
      Dedup.minHashNearDupPairs(sh, numPerm = 16, bands = 5, threshold = 0.5)
    }
    assert(ex.getMessage.contains("divisible"), ex.getMessage)
    intercept[IllegalArgumentException] {
      Dedup.minHashContainmentPairs(sh, numPerm = 16, bands = 5, threshold = 0.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.minHashNearDupAgainst(sh, sh, numPerm = 16, bands = 5, threshold = 0.5)
    }
  }

  test("temperatureSample flattens toward uniform and preserves corpus size in expectation") {
    // hot source 90 docs, tail source 10: α=0.5 must down-weight hot
    // (w<1) and up-weight tail (w>1), with Σ n_g·w_g = N exactly.
    val docs = ((1 to 90).map(i => (s"h$i", "hot")) ++
      (1 to 10).map(i => (s"t$i", "tail"))).toDF("doc_id", "source")
    val out = TextAnalysis.temperatureSample(docs, "doc_id", "source", 0.5)
    val w = out.select(col("grp"), col("w_e6")).distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("hot") < 1.0 && w("tail") > 1.0)
    assert(math.abs(90 * w("hot") + 10 * w("tail") - 100.0) < 1e-3)
    // emitted copies track expectation within the stochastic-rounding slack
    val n = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(n("hot") - 90 * w("hot")) <= 90)
    assert(n("tail") >= 10) // every tail doc emits ≥ floor(w) ≥ 1 copy
  }

  test("dsirWeights scores target-vocabulary docs above off-target docs") {
    val target = Seq(("t1", "alpha beta gamma delta"),
      ("t2", "alpha beta epsilon zeta")).toDF("doc_id", "text")
    val corpus = (target.collect().map(r => (r.getString(0), r.getString(1))).toSeq ++
      Seq(("o1", "unrelated words entirely different"),
        ("o2", "nothing shared here either"))).toDF("doc_id", "text")
    val got = TextAnalysis.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("t1") > got("o1") && got("t2") > got("o2"))
  }

  test("qualityScore lands in [0, 1e6] micro-units and rewards longer, denser text") {
    val df = Seq(
      ("short", "the a of to"),
      ("rich", Seq.fill(120)("substantive").mkString(" "))).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.qualityScore(col("text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(v => v >= 0L && v <= 1000000L))
    assert(got("rich") > got("short"))
  }

  test("writeSharded round-trips with stable content-addressed shards") {
    val docs = (1 to 40).map(i => (s"doc$i", s"payload $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    graft.dedup.Dedup.writeSharded(docs, "doc_id", numShards = 4, dir)
    val back = spark.read.parquet(dir)
    // every doc lands in the shard the assignment rule names, none lost
    val assign = graft.dedup.Dedup
      .shardAssignment(docs.select(col("doc_id")), "doc_id", 4)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val got = back.select(col("doc_id"), col("shard")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == assign)
    assert(got.values.toSet.size > 1, "several shards populated")
    // a re-written corpus (re-run) assigns identically — content-addressed
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    graft.dedup.Dedup.writeSharded(docs.orderBy(col("text").desc), "doc_id", 4, dir2)
    val again = spark.read.parquet(dir2).select(col("doc_id"), col("shard"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(again == got)
  }

  test("qualityFilter names the first failing rule; clean docs keep") {
    val clean = (Seq("the") ++ (1 to 30).map(i => s"word$i")).mkString(" ")
    val df = Seq(
      ("ok", clean),                                           // keep
      ("tiny", "the and tiny"),                                // < minWords
      ("syms", Seq.fill(25)("xy").mkString(" ")),              // mean len 2 < 3
      ("nostop", (1 to 30).map(i => s"word$i").mkString(" ")), // no stopword
      ("loop", ("the " + Seq.fill(30)("spam spam").mkString(" "))) // dup > 0.6
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(4), Option(r.getString(3))))).toMap
    assert(got == Map(
      "ok" -> ((true, None)),
      "tiny" -> ((false, Some("n_tokens"))),
      "syms" -> ((false, Some("mean_word_len"))),
      "nostop" -> ((false, Some("stopwords"))),
      "loop" -> ((false, Some("repetition")))), got.toString)
  }

  test("spanDedup drops exactly the positions covered by corpus-repeated n-grams") {
    val df = Seq(
      ("d1", "a b c d e"),   // "a b c" repeats in d2 → drop pos 0-2, keep "d e"
      ("d2", "x y a b c"),   // same gram at pos 2 → keep "x y"
      ("d3", "p q"),         // shorter than n → fully kept
      ("d4", null: String))  // null/blank text → ZERO tokens (the raw
                             // split's [''] is filtered: an empty doc
                             // must have no windows, or with n=1 every
                             // blank doc would share a "" gram and
                             // cross-dup against all other blanks)
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(df, "doc_id", "text", 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("d1") == ((5L, 2L, "d e")), got.toString)
    assert(got("d2") == ((5L, 2L, "x y")), got.toString)
    assert(got("d3") == ((2L, 2L, "p q")), got.toString)
    assert(got("d4") == ((0L, 0L, "")), got.toString)

    // within-one-doc repetition also counts toward minCount: the doc is
    // its own duplicate context (Lee et al. count total occurrences)
    val self = Seq(("s1", "a b c z a b c")).toDF("doc_id", "text")
    val gotSelf = Dedup.spanDedup(self, "doc_id", "text", 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(gotSelf("s1") == ((1L, "z")), gotSelf.toString)
  }

  test("decontaminate flags only corpus docs sharing an n-gram with the benchmark") {
    val bench = Seq(("b1", "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      ("c1", "lazy dog the quick brown fox here"), // shares 2 windows of "the quick brown fox"
      ("c2", "completely different words entirely"),
      ("c3", "ab")) // shorter than n → no windows → clean
      .toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text", 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // c1 windows of len 4 matching bench windows: "the quick brown fox",
    // "quick brown fox jumps" is absent (c1 has "fox here") → 1 hit
    assert(got == Map(
      "c1" -> ((1L, true)), "c2" -> ((0L, false)), "c3" -> ((0L, false))), got.toString)
  }

  test("bloomRefreshDedup: exact vs plain membership; expression has no false negatives") {
    def toks(rows: (String, String)*): org.apache.spark.sql.DataFrame =
      rows.flatMap { case (id, text) => text.split(" ").map((id, _)) }
        .toDF("id", "key")
    val corpus = toks("c1" -> "a b c", "c2" -> "d e", "c3" -> "q r s t")
    val fresh = toks("n1" -> "a b c", // exact dup of c1
      "n2" -> "x y",                  // genuinely new
      "n3" -> "c b a a",              // reorder+repeat → same canonical key as c1
      "n4" -> "d e", "n5" -> "zz")
    val got = Dedup.bloomRefreshDedup(corpus, fresh)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(got == Map("n1" -> true, "n2" -> false, "n3" -> true,
      "n4" -> true, "n5" -> false))

    // result must be bloom-parameter-invariant (verification makes it
    // exact even at absurd fpp / undersized capacity)
    val tiny = Dedup.bloomRefreshDedup(corpus, fresh, expectedItems = 2L, fpp = 0.5)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(tiny == got)

    // the expression agrees with the driver-side filter (hash parity with
    // what stat.bloomFilter inserted — no false negatives possible)
    val keys = (0 until 500).map(i => s"key_$i").toDF("k")
    val filter = keys.stat.bloomFilter("k", 500L, 0.03)
    val bytes = org.apache.spark.sql.graft.BloomOps.serialize(filter)
    val probeSide = (0 until 1000).map(i => s"key_$i")
    val viaExpr = probeSide.toDF("k")
      .select(col("k"), org.apache.spark.sql.graft.BloomOps.mightContain(bytes, col("k")).as("m"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    probeSide.foreach { k =>
      assert(viaExpr(k) == filter.mightContainString(k), k)
      if (k.stripPrefix("key_").toInt < 500) assert(viaExpr(k), s"false negative $k")
    }
  }

  test("mixtureSample: md5-deterministic copy counts, contiguous indices") {
    val docs = (0 until 300).map(i => (s"d$i", "src" + (i % 3))).toDF("doc_id", "source")
    val w = Map("src0" -> 2.5, "src1" -> 0.25) // src2 defaults to 1.0
    val got = TextAnalysis.mixtureSample(docs, "doc_id", "source", w)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def mdFrac(id: String): Double = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      .toDouble / (1L << 60).toDouble
    val byDoc = got.groupBy(t => (t._1, t._2))
    (0 until 300).foreach { i =>
      val id = s"d$i"; val grp = "src" + (i % 3)
      val weight = w.getOrElse(grp, 1.0)
      val expectN = weight.toLong + (if (mdFrac(id) < weight - weight.floor) 1 else 0)
      val copies = byDoc.getOrElse((grp, id), Array.empty).map(_._3).sorted
      assert(copies.toSeq == (0L until expectN), s"$id: $copies vs $expectN")
    }
    // down-sampled group actually shrinks, up-sampled grows
    val perGrp = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perGrp("src0") > 200 && perGrp("src1") < 60 && perGrp("src2") == 100)
  }

  test("lmScore: hand-computed smoothed unigram NLL; OOV floor; tokenless docs absent") {
    val ref = Seq(("r1", "foo bar foo")).toDF("doc_id", "text")
    val docs = Seq(
      ("d1", "foo zzz"),     // in-vocab + OOV
      ("d2", "bar bar"),     // repeated in-vocab token instances count twice
      ("d3", "a b")          // no tokens ≥ 3 chars → absent from output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, ref)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    // N=3 tokens, V=2 vocab → denom 6; P(foo)=3/6, P(bar)=2/6, P(oov)=1/6
    def e6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val d1 = e6(-(math.log(3.0 / 6) + math.log(1.0 / 6)) / 2)
    val d2 = e6(-math.log(2.0 / 6))
    assert(got.keySet == Set("d1", "d2"))
    assert(got("d1") == ((2L, d1)) && got("d2") == ((2L, d2)), got.toString)
  }

  test("lmBuckets: per-group terciles, threshold-equality lands in head, groups independent") {
    val ref = Seq(("r1", "foo bar foo")).toDF("doc_id", "text")
    // group g scores (denom 6): a=ln2, d=(ln2+ln3)/2, b=ln3, c=ln6 —
    // 4 docs put t1 exactly ON d's score (rank (4-1)/3 = 1.0, no
    // interpolation), so d pins the <=-boundary head case; group h has
    // its own interpolated cuts (per-group independence)
    val docs = Seq(
      ("a", "foo foo", "g"), ("b", "bar bar", "g"),
      ("c", "zzz zzz", "g"), ("d", "foo bar", "g"),
      ("e", "foo foo foo", "h"), ("f", "zzz", "h")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.lmBuckets(docs, ref)
      .collect().map(r => (r.getString(0), r.getString(4))).toMap
    assert(got == Map("a" -> "head", "d" -> "head", "b" -> "middle",
      "c" -> "tail", "e" -> "head", "f" -> "tail"), got.toString)
  }

  test("splitAssign: md5-deterministic ladder, stable proportions, remainder to last") {
    val docs = (0 until 2000).map(i => Tuple1(s"d$i")).toDF("doc_id")
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = TextAnalysis.splitAssign(docs, "doc_id", fr)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    def mdFrac(id: String): Double = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      .toDouble / (1L << 60).toDouble
    got.foreach { case (id, split) =>
      val f = mdFrac(id)
      val want = if (f < 0.9) "train" else if (f < 0.95) "val" else "test"
      assert(split == want, s"$id f=$f")
    }
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 1700 && n("val") > 50 && n("test") > 50, n.toString)
    // fractions summing under 1 send the remainder to the LAST split
    val rem = TextAnalysis.splitAssign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    rem.foreach { case (id, s) =>
      assert(s == (if (mdFrac(id) < 0.5) "a" else "b"))
    }
  }

  test("tokenBudget keeps the maximal md5-priority prefix; numBuckets-invariant") {
    val docs = (0 until 40).map(i => (s"d$i", "src" + (i % 2),
      Seq.fill(i % 5 + 1)("tok").mkString(" "))).toDF("doc_id", "source", "text")
    // reference: driver-side md5-priority cumsum per group
    def pri(id: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val rows = TextAnalysis.tokenBudget(docs, "doc_id", "text", "source", 20L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 40)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      var cum = 0L
      grp.sortBy(t => (pri(t._2), t._2)).foreach { case (_, id, n, cumGot, keep) =>
        cum += n
        assert(cumGot == cum, s"$id cum")
        assert(keep == (cum <= 20L), s"$id keep")
      }
    }
    assert(rows.count(_._5) < 40, "budget must actually drop something")
    // the scale knob must not change output: 1 bucket (plain window) ≡ 64
    val one = TextAnalysis.tokenBudget(docs, "doc_id", "text", "source", 20L, numBuckets = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getBoolean(4))).toSet
    val many = TextAnalysis.tokenBudget(docs, "doc_id", "text", "source", 20L, numBuckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getBoolean(4))).toSet
    assert(one == many)
  }

  test("packSequences: priority-order bin ladder, no doc split, numBuckets-invariant") {
    val docs = (0 until 40).map(i => (s"d$i", "src" + (i % 2),
      Seq.fill(i % 5 + 1)("tok").mkString(" "))).toDF("doc_id", "source", "text")
    def pri(id: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val rows = TextAnalysis.packSequences(docs, "doc_id", "text", "source", 7L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 40)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      var cum = 0L
      val ordered = grp.sortBy(t => (pri(t._2), t._2))
      ordered.foreach { case (_, id, n, bin) =>
        assert(bin == cum / 7L, s"$id bin")
        cum += n
      }
      // bins are contiguous and non-decreasing in priority order
      val bins = ordered.map(_._4)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
      assert(bins.head == 0L)
    }
    assert(rows.map(_._4).max > 0L, "window must actually create multiple bins")
    val one = TextAnalysis.packSequences(docs, "doc_id", "text", "source", 7L, numBuckets = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    val many = TextAnalysis.packSequences(docs, "doc_id", "text", "source", 7L, numBuckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    assert(one == many)
  }

  test("minHashNearDupAgainstSig: stored-signature path equals raw-token path") {
    // overlapping ids: d2 re-submitted with CHANGED content (supersession)
    val corpus = Seq(
      ("c1", Seq("a b c", "b c d", "c d e")),
      ("c2", Seq("x y z", "y z w")),
      ("d2", Seq("p q r"))).flatMap { case (id, ks) => ks.map(id -> _) }
      .toDF("id", "key")
    val batch = Seq(
      ("n1", Seq("a b c", "b c d")),
      ("d2", Seq("a b c", "c d e"))).flatMap { case (id, ks) => ks.map(id -> _) }
      .toDF("id", "key")
    val raw = Dedup.minHashNearDupAgainst(corpus, batch, 16, 4, 0.1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val stored = graft.functions.MinHash.signature(corpus, 16)
    val viaSig = Dedup.minHashNearDupAgainstSig(stored, corpus, batch, 16, 4, 0.1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(raw == viaSig)
    assert(raw.nonEmpty, "fixture must produce pairs")
    // d2's OLD corpus content is superseded: no pair may use it
    assert(!raw.exists { case (a, b, j) => (a == "d2" || b == "d2") && j == 0.0 })
  }

  test("packBins concatenates members in packing order; totals reconcile") {
    val docs = (0 until 20).map(i => (s"d$i", "src" + (i % 2),
      Seq.fill(i % 4 + 1)(s"w$i").mkString(" "))).toDF("doc_id", "source", "text")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text", "source", 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bins = TextAnalysis.packBins(docs, "doc_id", "text", "source", 5L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // every (grp, bin) from packSequences appears with reconciled totals
    packed.groupBy(t => (t._1, t._4)).foreach { case (key, members) =>
      val (nDocs, binToks, text) = bins(key)
      assert(nDocs == members.length, s"$key n_docs")
      assert(binToks == members.map(_._3).sum, s"$key tokens")
      // concatenated text holds every member's tokens
      members.foreach { case (_, id, _, _) =>
        assert(text.contains("w" + id.drop(1)), s"$key missing $id") }
    }
    def pri(id: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    // order inside a bin is the packing (priority) order
    packed.groupBy(t => (t._1, t._4)).foreach { case (key, members) =>
      val expected = members.sortBy(t => (pri(t._2), t._2))
        .map { case (_, id, _, _) => Seq.fill(id.drop(1).toInt % 4 + 1)(s"w${id.drop(1)}").mkString(" ") }
        .mkString(" ")
      assert(bins(key)._3 == expected, s"$key order")
    }
  }

  test("sketchOverlap: identical groups at 1e6, disjoint vocabularies low") {
    val toks = Seq(
      // ga and gb share the exact token set; gc is disjoint
      "ga" -> "alpha", "ga" -> "beta", "ga" -> "gamma", "ga" -> "delta",
      "gb" -> "alpha", "gb" -> "beta", "gb" -> "gamma", "gb" -> "delta",
      "gc" -> "omega", "gc" -> "sigma", "gc" -> "kappa", "gc" -> "lambda")
      .toDF("id", "key")
    val got = Dedup.sketchOverlap(toks, numPerm = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set(("ga", "gb"), ("ga", "gc"), ("gb", "gc")))
    assert(got(("ga", "gb")) == 1000000L, "identical token sets must estimate 1.0")
    // disjoint sets can only collide per-perm by hash accident; with 4
    // tokens a side the estimate stays well under identity
    assert(got(("ga", "gc")) < 1000000L && got(("gb", "gc")) < 1000000L)
    assert(got(("ga", "gc")) == got(("gb", "gc")), "same sketch -> same estimate")
  }

  test("piiRedact: hand cases — counts, placeholder chaining, passthrough") {
    val df = Seq(
      ("a", "reach me at jane.doe+spam@corp.example.org thanks"),
      ("b", "server 192.168.0.1 then call 555-123-4567"),
      ("c", "no pii here at all"),
      ("d", "two mails x@y.io and z@w.ai plus 10.0.0.1")).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got("a") == ((1L, 0L, 0L, "reach me at <EMAIL> thanks")))
    assert(got("b") == ((0L, 1L, 1L, "server <IP> then call <PHONE>")))
    assert(got("c") == ((0L, 0L, 0L, "no pii here at all")))
    assert(got("d") == ((2L, 1L, 0L, "two mails <EMAIL> and <EMAIL> plus <IP>")))
  }

  test("repetitionSignals: hand-computed fractions, overlap counting, tie-break") {
    val df = Seq(
      // toks [a b a b a b c]: m=7 distinct=3 chars=7; top bigram "a b"×3
      // (charlen 2); dup trigrams "a b a"×2 + "b a b"×2 (charlen 3 each,
      // overlap-counted → 12/7 exceeds 1e6 by design)
      ("d1", "a b a b a b c"),
      // all bigrams count 1 → tie broken to lexicographically smallest "a a"
      ("d2", "b a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("d1") == ((571428L, "a b", 857142L, 1714285L)))
    assert(got("d2") == ((500000L, "a a", 500000L, 0L)))
  }

  /** Independent scalar reimplementation of winnowing (normalize →
    * char-k-gram md5/40-bit hashes → window-min with rightmost tie →
    * distinct (hash, pos)) to check the distributed plan against. */
  private def winnowRef(text: String, k: Int = 8, w: Int = 4): Seq[(Long, Int)] = {
    val t = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    val hs = (0 to t.length - k).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.substring(i, i + k).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(10), 16)
    }
    (w - 1 until hs.length).map { end =>
      val idx = (end - w + 1) to end
      val minH = idx.map(hs).min
      (minH, idx.filter(i => hs(i) == minH).max)
    }.distinct
  }

  test("winnow matches an independent scalar implementation (incl. ties)") {
    val docs = Seq(
      // repeated phrase → repeated k-grams → real in-window hash ties,
      // exercising the rightmost-tie arithmetic encoding
      (1L, "the quick brown fox the quick brown fox the quick brown fox"),
      (2L, "completely different content with many varied tokens inside"),
      (3L, "exactly11c"), // 10 normalized chars: 3 grams < w → no full window
      (4L, "abcabcabcabcabcabc")).toDF("doc_id", "text")
    val got = TextAnalysis.winnow(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = Map(
      1L -> "the quick brown fox the quick brown fox the quick brown fox",
      2L -> "completely different content with many varied tokens inside",
      4L -> "abcabcabcabcabcabc")
    texts.foreach { case (id, t) =>
      val ref = winnowRef(t)
      assert(got(id) == ((ref.size.toLong, ref.map(_._1).sum)),
        s"doc $id fingerprints diverge from reference winnowing")
    }
    assert(!got.contains(3L), "doc with no full window yields no row")
  }

  test("winnow: identical documents fingerprint identically") {
    val docs = Seq(
      (1L, "some shared corpus paragraph that repeats verbatim elsewhere"),
      (2L, "some shared corpus paragraph that repeats verbatim elsewhere"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.winnow(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows.size == 1)
  }

  test("minHashContainmentPairs: subset containment both directions") {
    // C is identical to A (guaranteed band collision); B ⊃ A by one key
    val aKeys = (1 to 8).map(i => s"key$i")
    val toks = (aKeys.map(("docA", _)) ++ aKeys.map(("docC", _)) ++
      (aKeys :+ "key9").map(("docB", _))).toDF("id", "key")
    val got = Dedup.minHashContainmentPairs(toks, 16, 4, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // identical docs contain each other fully
    assert(got(("docA", "docC")) == 1.0 && got(("docC", "docA")) == 1.0)
    // A ⊂ B: A fully contained in B; B only 8/9 contained in A
    assert(got(("docA", "docB")) == 1.0)
    assert(math.abs(got(("docB", "docA")) - 8.0 / 9) < 1e-12)
    // direction below threshold would be cut: with τ=0.9 the B→A row drops
    val strict = Dedup.minHashContainmentPairs(toks, 16, 4, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(strict.contains(("docA", "docB")) && !strict.contains(("docB", "docA")))
  }

  test("tokenEntropy: constant, uniform, and mixed documents") {
    val df = Seq(
      (1L, "aa aa aa aa"),          // constant → H = 0
      (2L, "aa bb cc dd"),          // uniform over 4 → H = ln 4
      (3L, "aa aa bb bb"))          // uniform over 2 → H = ln 2
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def rd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L) == ((4L, 1L, 0.0)))
    assert(got(2L) == ((4L, 4L, rd(math.log(4)))))
    assert(got(3L) == ((4L, 2L, rd(math.log(2)))))
  }

  test("punktLearnAbbrevs: Kiss & Strunk criterion on the hand-computed fixture") {
    // 200 tokens, 20 period-final → p1 = 0.1 exactly (the tx_punkt_learn
    // fixture). Every pinned score is hand-derived from the published
    // criterion (ll = -2(nullH - altH), exp(-len)·periods·len^-c(w),
    // ABBREV = 0.3), so any drift in a factor or constant fails here.
    val corpus = Seq(
      "dr. dr. dr. dr. \"dr.\"",
      Seq.fill(4)("u.s.").mkString(" "),
      "vs. vs. vs",
      "cat. " + Seq.fill(20)("cat").mkString(" "),
      Seq.fill(8)("end.").mkString(" ") + " " + Seq.fill(30)("end").mkString(" "),
      Seq.fill(128)("the").mkString(" ") + " (the)")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.punktLearnAbbrevs(corpus).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // "the" never occurs period-final → not a candidate at all
    assert(got.keySet == Set("dr", "u.s", "vs", "cat", "end"))
    // quote-stripped "dr." counted: 5 with-period occurrences, not 4
    // (num_nonperiods = non-period chars = 2, NLTK's len - periods + 1)
    assert(got("dr") == ((5L, 0L, 3.102608, true)))
    // internal period: f_periods = 2 doubles the score
    assert(got("u.s") == ((4L, 0L, 4.964173, true)))
    // positive LLR but length/plain-occurrence penalties hold it under 0.3
    assert(got("vs") == ((2L, 1L, 0.011539, false)))
    // dominant plain occurrences → negative LLR (never an abbreviation)
    assert(got("cat") == ((1L, 20L, 0.0, false)))
    // the frequent sentence-ender that ALSO appears mid-sentence —
    // Punkt's own negative case
    assert(got("end") == ((8L, 30L, 0.0, false)))
    // the threshold is the decision seam: above both scores → none left
    assert(TextAnalysis.punktLearnAbbrevs(corpus, threshold = 5.0)
      .filter(col("is_abbrev")).count() == 0)
    // number types are never candidates (Punkt's ##number## exclusion)
    val withNums = corpus.unionByName(
      Seq((9L, "sold in 1990. 1990. 1990. Again")).toDF("doc_id", "text"))
    assert(!TextAnalysis.punktLearnAbbrevs(withNums).collect()
      .map(_.getString(0)).contains("1990"))
  }

  test("lmBigramScore: stupid backoff hand case — seen ratio, unseen backoff") {
    val ref = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    // ref unigrams: alpha=2, beta=1, gamma=1 → N=4, V=3
    // ref bigrams: (alpha,beta), (beta,alpha), (alpha,gamma)
    val docs = Seq(
      (10L, "alpha beta gamma"), // (alpha,beta) seen: 1/2; (beta,gamma) unseen
      (11L, "alpha")) // single token: no bigrams → absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmBigramScore(docs, ref)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected = {
      val s1 = 1.0 / 2.0
      val s2 = 0.4 * (1 + 1.0) / (4 + 3.0)
      val nll = (-math.log(s1) + -math.log(s2)) / 2
      math.floor(nll * 1e6 + 0.5) / 1e6
    }
    assert(got.keySet == Set("10"))
    assert(got("10")._1 == 2L)
    assert(math.abs(got("10")._2 - expected) < 1e-9)
  }

  test("clusterHistogram: cluster sizes plus singleton remainder") {
    val corpus = Seq("a", "b", "c", "d", "e", "f").toDF("id")
    val pairs = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("id_a", "id_b")
    val got = Dedup.clusterHistogram(corpus, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {a,b,c} size 3, {d,e} size 2, f singleton
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // no pairs: everything is a singleton
    val all1 = Dedup.clusterHistogram(corpus,
        Seq.empty[(String, String)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all1 == Map(1L -> 6L))
  }

  test("winnowPairs: shared-passage detection, guarantee, and hot-hash cap") {
    val passage = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"unrelated preamble alpha $passage trailing words here"),
      (2L, s"$passage completely different continuation text follows"),
      (3L, "zqxwvut yxwvu tsrqp onmlk jihgf edcba zyxwvutsr qponm"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 1 and 2 share a 40+ char normalized passage → winnowing
    // GUARANTEES ≥ 1 shared fingerprint (any ≥ k+w−1 = 11 char match)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 1)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "doc 3 shares no 8-gram with the others")
    // a cap of 1 drops every hash present in BOTH docs → no pairs
    assert(TextAnalysis.winnowPairs(docs, 1, maxHashDocs = 1).isEmpty)
  }

  test("vocabGrowth: deciles, thresholds, first-occurrence counting") {
    // doc i introduces token "toki00"; "common" first occurs in doc 0.
    val docs = (0L until 10L).map(i => (i, s"tok${i}00 common"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs).orderBy("decile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // thr_i = i → i docs seen, vocab = i new tokens + "common"
    assert(got.toSeq == (1 to 10).map(i => (i, i.toLong, i + 1L)))
  }

  test("chunkWindows: stride/overlap coverage, short docs, empty text") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks → 2 chunks
      (2L, "only three tokens"),                        // 1 short chunk
      (3L, ""))                                         // empty → 1 empty chunk
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text", 64, 16)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc 1: [0,64) and [48,100) — the overlap region 48..63 is in both
    assert(got.filter(_._1 == "1").toSeq ==
      Seq(("1", 0, 0, 64), ("1", 1, 48, 52)))
    assert(got.filter(_._1 == "2").toSeq == Seq(("2", 0, 0, 3)))
    assert(got.count(_._1 == "3") == 1, "empty doc still yields one chunk")
    // overlap tokens shared verbatim: chunk 1 starts 16 tokens before
    // chunk 0's end
    val c = TextAnalysis.chunkWindows(docs.filter(col("doc_id") === 1),
      "doc_id", "text", 64, 16)
      .orderBy("chunk_idx").collect()
    assert(c(1).getInt(2) == c(0).getInt(2) + 48)
  }

  test("weightedSample: deterministic, k-bounded, weight-monotone") {
    val docs = (1L to 50L).map(i =>
      (i, if (i <= 5) "src_heavy" else "src_light",
        ("w " * (if (i % 2 == 0) 100 else 1)).trim))
      .toDF("doc_id", "source", "text")
    def run() = TextAnalysis.weightedSample(docs, "doc_id", "source",
      TextAnalysis.wsTokenCount(col("text")), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSeq
    val a = run()
    assert(a == run(), "content-addressed draws must be reproducible")
    assert(a.count(_._1 == "src_heavy") == 3 && a.count(_._1 == "src_light") == 3)
    assert(a.groupBy(_._1).forall(_._2.map(_._3).sorted == Seq(1, 2, 3)))
    // weight monotonicity in expectation is statistical, but u^(1/w) with
    // w=100 vs w=1 makes heavy docs overwhelmingly likely to win: among
    // src_light's 45 docs (22 with w=100, 23 with w=1) the top 3 should
    // all be heavy ones (P[any light doc beating a heavy] ~ u^1 vs u^0.01)
    val lightTop = a.filter(_._1 == "src_light").map(_._2.toLong)
    assert(lightTop.forall(_ % 2 == 0), s"expected heavy (even) ids, got $lightTop")
  }

  test("bpeMerges: hand-checkable corpus learns the dominant pair first") {
    // "aaab" x3, "ab" x2: round-1 pairs: (a,a)=6, (a,b)=5 → merge a·a;
    // round 2: vocab = ·aa·a·b· x3, ·a·b· x2 → (aa,a)=3, (a,b)=2+3?
    // after merging a·a greedily in "aaab": ·aa·a·b· → pairs (aa,a)=3,
    // (a,b)=3+2=5 → round 2 merges a·b.
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a·a", 6L), (2, "a·b", 5L)), got.toString)
  }

  test("bpeEncode: adjacent merged pairs all merge (greedy-apply regression)") {
    // 'abab' with merge (a,b) must segment to [ab, ab] — the single-dot
    // encoding's consumed-delimiter bug left [ab, a, b]
    val docs = Seq((1L, "abab ab ab aaaa aaaa")).toDF("doc_id", "text")
    // round 1 learns (a,b): pairs (a,b)=2+1+1+... abab: (a,b)x2,(b,a)x1;
    // ab: (a,b)x1 each; aaaa: (a,a)x3 each x2 = 6 → (a,a) wins round 1!
    // Use a corpus where (a,b) wins: drop the aaaa's.
    val d2 = Seq((1L, "abab ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(d2, "text", rounds = 1).collect()
    assert(merges.head.getString(1) == "a·b")
    val enc = TextAnalysis.bpeEncode(d2, "doc_id", "text", rounds = 1)
      .collect().head
    // words: abab (4 chars → 2 subwords), ab, ab (1 each) = 3 words, 4 subwords
    assert(enc.getLong(1) == 3L && enc.getLong(2) == 4L,
      s"expected (3 words, 4 subwords), got (${enc.getLong(1)}, ${enc.getLong(2)})")
    // consecutive-run case: aaaa with merge (a,a) → [aa, aa]; the doc has
    // the word twice → 2 words, 4 subwords
    val d3 = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val enc3 = TextAnalysis.bpeEncode(d3, "doc_id", "text", rounds = 1)
      .collect().head
    assert(enc3.getLong(1) == 2L && enc3.getLong(2) == 4L,
      s"aaaa → [aa, aa] per word, got ${enc3.getLong(2)} subwords")
  }

  test("crossDocSpans: cross-doc shared runs merge to maximal spans; within-doc repeats don't trigger") {
    import spark.implicits._
    // A and B share tokens a3..a11 (9 tokens -> two overlapping 8-windows
    // in A at p=2,3 merging to one span of length 9); C repeats ITS OWN
    // 8-token run twice but shares nothing across docs
    val shared = (3 to 11).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      ("A", "a0 a1 a2 " + shared + " z1 z2"),
      ("B", "b0 " + shared + " b1"),
      ("C", (1 to 8).map(i => s"c$i").mkString(" ") + " " + (1 to 8).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = graft.dedup.Dedup.crossDocSpans(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans == Set(("A", 3L, 9L, 2L), ("B", 1L, 9L, 2L)),
      s"got $spans")
    // the cut form removes exactly the shared ranges, keeps C intact
    val cut = graft.dedup.Dedup.crossDocCut(docs, "doc_id", "text", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(cut("A") == ((14L, 5L, "a0 a1 a2 z1 z2")), s"got ${cut("A")}")
    assert(cut("B") == ((11L, 2L, "b0 b1")), s"got ${cut("B")}")
    assert(cut("C")._1 == 16L && cut("C")._2 == 16L, s"got ${cut("C")}")
  }

  test("crossDocSpans: maxDocFreq cap drops boilerplate grams") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = (0 until 5).map(i => (s"d$i", s"x$i " + boiler)).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.crossDocSpans(docs, "doc_id", "text", 8).count() == 5)
    assert(graft.dedup.Dedup.crossDocSpans(docs, "doc_id", "text", 8, maxDocFreq = 4).count() == 0)
  }
}
