package graft

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions.col
import graft.blockers._
import graft.core.EntityFrame

/** ScalaCheck property tests — the blocking invariants SURVEY.md §5
  * prescribes: every emitted id exists in the input; combine's pair set
  * contains both inputs' pair sets; purge/cap only remove the largest
  * blocks. Small generated tables keep each property cheap; properties
  * hold for ANY input, which the fixture goldens can't show. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling from a ScalaCheck generator (the
    * scalatestplus bridge isn't on the offline classpath). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(12)
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga, 5).zip(samples(gb, 5)).foreach { case (a, b) => f(a, b) }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga, 5).foreach(f)

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val rowGen = for {
    n <- Gen.choose(1, 3)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def frame(name: String, rows: List[String]): EntityFrame =
    EntityFrame(
      rows.zipWithIndex.map { case (t, i) => (s"$name$i", t) }.toDF("id", "text"),
      name, "id")

  test("every id a blocker emits exists in its input side") {
    forAll(Gen.nonEmptyListOf(rowGen), Gen.nonEmptyListOf(rowGen)) {
      (ls: List[String], rs: List[String]) =>
        val lf = frame("l", ls)
        val rf = frame("r", rs)
        val lIds = ls.indices.map(i => s"l$i").toSet
        val rIds = rs.indices.map(i => s"r$i").toSet
        Seq(TokenBlocker(), UniqueNameBlocker(), PartitioningTokenBlocker())
          .foreach { blocker =>
            blockMap(blocker.assign(lf, rf)).foreach { case (k, (l, r)) =>
              // NN blocks key by left id; others must draw from inputs too
              assert(l.subsetOf(lIds), s"$blocker $k left $l")
              assert(r.subsetOf(rIds), s"$blocker $k right $r")
            }
          }
    }
  }

  test("combine's pair set is a superset of both inputs' pair sets") {
    val blocksGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 5)
      l <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"a$i"))
      r <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"b$i"))
    } yield (s"k$k", (l.distinct, r.distinct)))
    forAll(blocksGen, blocksGen) { (xs, ys) =>
      val a = blocksOf(xs.toMap)
      val b = blocksOf(ys.toMap)
      val combined = a.combine(b)
      def pairSet(bl: graft.core.Blocks) =
        bl.distinctPairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val got = pairSet(combined)
      assert(pairSet(a).subsetOf(got))
      assert(pairSet(b).subsetOf(got))
    }
  }

  test("purge threshold matches a driver-side reference of the cc-plateau rule") {
    // reference semantics (blocks.py:172-244, SURVEY W3): distinct-card
    // rows sorted ascending, cc = round(cumAsg/cumCard, 2); the first row
    // whose cc duplicates ANY earlier cc (pandas duplicated(keep="first"))
    // sets threshold = its cumulative card; no duplicate → keep all.
    // Representative per duplicate card = min block_key (the documented
    // determinism divergence from the reference's frame order).
    val blocksGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 40)
      l <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"a$i"))
      r <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"b$i"))
    } yield (f"k$k%02d", (l.distinct, r.distinct)))
    forAll(blocksGen) { xs =>
      val m = xs.toMap
      val stats = m.map { case (k, (l, r)) =>
        (k, l.size.toLong * r.size, l.size.toLong + r.size) }.toSeq
      val rep = stats.groupBy(_._2).toSeq
        .map { case (card, rows) => (card, rows.minBy(_._1)._3) }
        .sortBy(_._1)
      var c = 0L
      var a = 0L
      val cum = rep.map { case (card, asg) =>
        c += card; a += asg
        // Spark's round(): BigDecimal HALF_UP, not scala.math.round
        (c, BigDecimal(a.toDouble / c)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val seen = scala.collection.mutable.Set.empty[Double]
      val flagged = cum.filter { case (_, cc) =>
        val dup = seen.contains(cc); seen += cc; dup }
      val threshold =
        if (flagged.nonEmpty) flagged.map(_._1).min else cum.last._1
      val wantKept = stats.filter(_._2 <= threshold).map(_._1).toSet
      val kept = blockMap(blocksOf(m).purge()).keySet
      assert(kept == wantKept,
        s"threshold=$threshold cum=$cum kept=$kept want=$wantKept")
    }
  }

  test("components matches a driver-side union-find on random graphs") {
    // validates the frontier-propagation loop (labels that stopped
    // changing are never re-propagated) against ground truth: for ANY
    // edge set, every node's label must equal its component's min id.
    val edgeGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0, 25)
      b <- Gen.choose(0, 25)
    } yield (f"n$a%02d", f"n$b%02d"))
    forAll(edgeGen) { es =>
      val pairs = es.toDF("id_a", "id_b")
      val got = graft.dedup.Dedup.components(pairs).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val want = parent.keys.toSeq
        .groupBy(find).flatMap { case (_, members) =>
          val m = members.min
          members.map(_ -> m)
        }
      assert(got == want, s"edges=$es")
    }
  }

  test("minhash signatures are set-functions; identical sets collide in every band") {
    // signature depends only on the distinct token SET (order/duplication
    // invariant), so two ids with equal sets share all numPerm hashes and
    // land in every band bucket together — the property LSH recall rests on.
    val docGen = Gen.nonEmptyListOf(word)
    forAll(Gen.nonEmptyListOf(docGen)) { docs =>
      val rows = docs.zipWithIndex.flatMap { case (ws, i) =>
        ws.map(w => (s"d$i", w)) :+ ((s"dup$i", ws.head)) // dup shares 1st token only
      } ++ docs.zipWithIndex.flatMap { case (ws, i) =>
        // mirror doc with the same token SET, reversed + repeated
        (ws.reverse ++ ws).map(w => (s"m$i", w))
      }
      val sig = graft.functions.MinHash.signature(rows.toDF("id", "key"), 8)
      val byId = sig.collect().map(r => r.getString(0) ->
        (1 to 8).map(j => r.getLong(j)).toList).toMap
      docs.indices.foreach { i =>
        assert(byId(s"d$i") == byId(s"m$i"), s"set-equal docs d$i/m$i must collide")
      }
      val buckets = graft.functions.MinHash.bandBuckets(sig, bands = 4, rows = 2)
        .collect().groupBy(_.getString(0)).map { case (id, rs) =>
          id -> rs.map(_.getString(1)).toSet }
      docs.indices.foreach { i =>
        assert(buckets(s"d$i") == buckets(s"m$i"))
      }
    }
  }

  test("simhash fingerprints: hamming is a bounded metric on 60-bit prints") {
    forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(word))) { docs =>
      val rows = docs.zipWithIndex.flatMap { case (ws, i) => ws.map(w => (s"d$i", w)) }
      val fp = graft.functions.SimHash.fingerprint(rows.toDF("id", "key"))
      val pairs = fp.toDF("id_a", "fa")
        .crossJoin(fp.toDF("id_b", "fb"))
        .select(col("id_a"), col("id_b"),
          graft.functions.SimHash.hamming(col("fa"), col("fb")).as("h"),
          graft.functions.SimHash.hamming(col("fb"), col("fa")).as("hr"))
        .collect()
      pairs.foreach { r =>
        val (a, b, h, hr) = (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))
        assert(h == hr, "symmetric")
        assert(h >= 0 && h <= 60, "bounded by print width")
        if (a == b) assert(h == 0, "identity")
      }
    }
  }

  test("shardAssignment matches a driver-side md5 reference and stays in range") {
    // the content-addressed rule (first 15 md5 hex chars as a long, mod N)
    // must be engine-independent: recompute it with plain MessageDigest
    val idsGen = for {
      ids <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
      n <- Gen.choose(1, 32)
    } yield (ids.distinct, n)
    forAll(idsGen) { case (ids, n) =>
      val got = graft.dedup.Dedup
        .shardAssignment(ids.toDF("id"), "id", n)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = ids.map { id =>
        val hex = md.digest(id.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        id -> (java.lang.Long.parseLong(hex.take(15), 16) % n).toInt
      }.toMap
      assert(got == want)
      assert(got.values.forall(s => s >= 0 && s < n))
    }
  }

  test("qualityFilter matches a driver-side reference on random token soups") {
    // rule ORDER matters (first failure names the reason): replicate the
    // gate rules in plain Scala over random documents and require exact
    // (keep, reason) agreement
    val wordGen = Gen.oneOf(
      Gen.oneOf(graft.functions.Text.Stopwords),
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)))
    val docGen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    forAll(Gen.nonEmptyListOf(docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.text.TextAnalysis.qualityFilter(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(4), Option(r.getString(3))))).toMap
      val want = docs.map { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+").toSeq
        val m = toks.size
        val meanLen = toks.map(_.length).sum.toDouble / m
        val stops = toks.count(graft.functions.Text.Stopwords.contains)
        val dupFrac = (m - toks.distinct.size).toDouble / m
        val reason =
          if (m < 20 || m > 100000) Some("n_tokens")
          else if (meanLen < 3.0 || meanLen > 10.0) Some("mean_word_len")
          else if (stops < 1) Some("stopwords")
          else if (dupFrac > 0.6) Some("repetition")
          else None
        id -> ((reason.isEmpty, reason))
      }.toMap
      assert(got == want)
    }
  }

  test("cap and purge keep only blocks at-or-below a comparison threshold") {
    val blocksGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 20)
      l <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"a$i"))
      r <- Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"b$i"))
    } yield (s"k$k", (l.distinct, r.distinct)))
    forAll(blocksGen) { xs =>
      val blocks = blocksOf(xs.toMap)
      val sizes = xs.toMap.map { case (k, (l, r)) => k -> l.size.toLong * r.size }
      // cap: exact threshold semantics
      val capped = blockMap(blocks.cap(2)).keySet
      assert(capped == sizes.filter(_._2 <= 2).keySet)
      // purge: the surviving set is downward-closed in comparisons —
      // no removed block is smaller than a kept one
      val kept = blockMap(blocks.purge()).keySet
      assert(kept.nonEmpty)
      val keptMax = kept.map(sizes).max
      val removed = sizes.keySet -- kept
      removed.foreach(k => assert(sizes(k) >= keptMax,
        s"purge removed $k(${sizes(k)}) while keeping a block of $keptMax"))
    }
  }

  test("pageRank conserves mass on random undirected graphs") {
    val edgeGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0, 8); b <- Gen.choose(0, 8) if a != b
    } yield (s"n$a", s"n$b"))
    forAll(edgeGen) { es =>
      val arcs = (es ++ es.map(_.swap)).distinct.toDF("src", "dst")
      val r = graft.relational.PageRank.pageRank(arcs, 3)
        .collect().map(_.getDouble(1))
      // bidirectional arcs → no dangling mass; Σr = 1 to float tolerance
      assert(math.abs(r.sum - 1.0) < 1e-9, s"mass ${r.sum}")
      assert(r.forall(_ > 0))
    }
  }

  test("labelPropagation: two cliques joined by one bridge form two communities") {
    // clique A: a0..a3 complete (K4); clique B: b0..b3 complete (K4);
    // one bridge a0-b0. After convergence each clique shares one label
    // and the two labels differ (the bridge label leaked in the tie-
    // heavy first round is outvoted by clique neighbors in later rounds
    // — the self-vote's stabilizer role; 3-cliques are too small for
    // the recovery, which is why K4s are used here).
    def clique(p: String) = for {
      i <- 0 to 3; j <- 0 to 3 if i != j
    } yield (s"$p$i", s"$p$j")
    val arcs = (clique("a") ++ clique("b") ++
      Seq(("a0", "b0"), ("b0", "a0"))).toDF("src", "dst")
    val got = graft.relational.PageRank.labelPropagation(arcs, 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.keySet == (0 to 3).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
    assert((0 to 3).map(i => got(s"a$i")).toSet.size == 1, s"clique A split: $got")
    assert((0 to 3).map(i => got(s"b$i")).toSet.size == 1, s"clique B split: $got")
    assert(got("a0") != got("b0"), s"cliques merged: $got")
  }

  test("containment dominates jaccard and hits 1.0 exactly for subsets") {
    val docGen = Gen.nonEmptyListOf(word).map(_.distinct)
    forAll(Gen.nonEmptyListOf(docGen)) { docs =>
      val toks = docs.zipWithIndex
        .flatMap { case (ws, i) => ws.map((s"d$i", _)) }
        .toDF("id", "key")
      // threshold 0 keeps every verified candidate pair
      val cont = graft.dedup.Dedup
        .minHashContainmentPairs(toks, 16, 4, threshold = 0.0)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val sets = docs.zipWithIndex
        .map { case (ws, i) => s"d$i" -> ws.toSet }.toMap
      cont.foreach { case ((from, to), c) =>
        val (a, b) = (sets(from), sets(to))
        val jac = a.intersect(b).size.toDouble / a.union(b).size
        assert(c >= jac - 1e-12, s"containment $c below jaccard $jac")
        assert(math.abs(c - a.intersect(b).size.toDouble / a.size) < 1e-12)
        if (a.subsetOf(b)) assert(c == 1.0)
      }
    }
  }

  test("chunkWindows: full token coverage, stride positions, bounded sizes") {
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val docs = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunkSize = 4; val overlap = 1; val stride = chunkSize - overlap
      val got = graft.text.TextAnalysis
        .chunkWindows(docs, "doc_id", "text", chunkSize, overlap)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .groupBy(_._1)
      rows.zipWithIndex.foreach { case (t, i) =>
        val n = t.trim.split("\\s+").count(_.nonEmpty)
        val chunks = got(i.toString).sortBy(_._2)
        // chunk indices are contiguous from 0; starts follow the stride
        assert(chunks.map(_._2).toSeq == chunks.indices.toSeq)
        chunks.foreach { case (_, idx, start, sz) =>
          assert(start == idx * stride && sz >= 1 && sz <= chunkSize)
        }
        // every token position is covered by some chunk
        val covered = chunks.flatMap { case (_, _, s, sz) => s until (s + sz) }.toSet
        assert((0 until math.max(n, 0)).forall(covered.contains),
          s"uncovered positions for '$t'")
      }
    }
  }

  test("weightedSample: subset of input, k-bounded, rank-contiguous per group") {
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val docs = rows.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"g${i % 2}", t) }.toDF("doc_id", "source", "text")
      val k = 2
      val got = graft.text.TextAnalysis.weightedSample(docs, "doc_id", "source",
        graft.text.TextAnalysis.wsTokenCount(col("text")), k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(3)))
      val inputIds = rows.indices.map(_.toString).toSet
      assert(got.forall(x => inputIds.contains(x._2)))
      got.groupBy(_._1).foreach { case (g, xs) =>
        assert(xs.length <= k)
        assert(xs.map(_._3).sorted.toSeq == (1 to xs.length))
      }
    }
  }

  test("bpeEncode: subwords per doc between word count and char count") {
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val docs = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.bpeEncode(docs, "doc_id", "text", 3)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      rows.zipWithIndex.foreach { case (t, i) =>
        val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val (nw, nsub) = got(i.toString)
        assert(nw == ws.length)
        // merges only ever SHRINK a word's segmentation, never below 1
        assert(nsub >= nw && nsub <= ws.map(_.length).sum,
          s"'$t': $nsub subwords outside [$nw, ${ws.map(_.length).sum}]")
      }
    }
  }

  test("winnow fingerprint count is bounded by the full-window count") {
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val docs = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 8; val w = 4
      val got = graft.text.TextAnalysis.winnow(docs, k = k, w = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.zipWithIndex.foreach { case (t, i) =>
        val n = t.toLowerCase.replaceAll("[^a-z0-9]", "").length - k + 1
        val windows = n - w + 1
        if (windows >= 1)
          assert(got(i.toLong) >= 1 && got(i.toLong) <= windows)
        else assert(!got.contains(i.toLong))
      }
    }
  }

  test("IVF-PQ: direct operator == built index search == streaming-safe serve, on random vectors") {
    implicit val sp = spark
    val dims = 8
    val vecGen = Gen.listOfN(dims, Gen.choose(-1000, 1000).map(_ / 500.0))
    val corpusGen = for {
      n <- Gen.choose(6, 14)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, (i % 3).toString, v.toArray) }
    forAll(corpusGen) { rows =>
      val corpus = rows.toDF("id", "bucket", "vec")
      val queries = rows.take(4).map { case (i, _, v) => (i + 100L, v) }.toDF("id", "vec")
      for (residual <- Seq(false, true)) {
        val direct = graft.similarity.Similarity.ivfPqTopK(
            queries, corpus, k = 2, dims = dims, subspaces = 2, codebookSize = 4,
            probes = 2, rankScale = 9, residual = residual)
          .select("left_id", "rank", "right_id", "adc")
          .orderBy("left_id", "rank").collect().toSeq
        val idx = graft.similarity.IndexStore.buildIvfPq(
          corpus, dims = dims, subspaces = 2, codebookSize = 4, residual = residual)
        val viaIndex = graft.similarity.IndexStore.search(
            queries, idx, k = 2, probes = 2, rankScale = 9)
          .select("left_id", "rank", "right_id", "adc")
          .orderBy("left_id", "rank").collect().toSeq
        val served = graft.streaming.AnnServing.serveIvfPq(
            queries, idx, k = 2, probes = 2, rankScale = 9)
          .toDF().select("left_id", "rank", "right_id", "adc")
          .orderBy("left_id", "rank").collect().toSeq
        assert(viaIndex == direct, s"index-search drift (residual=$residual)")
        assert(served == direct, s"serve drift (residual=$residual)")
      }
    }
  }

  test("mutual proximity is invariant under monotone transforms of cos; nicdm under distance scaling") {
    import org.apache.spark.sql.functions._
    val candGen = for {
      nl <- Gen.choose(2, 4)
      nr <- Gen.choose(3, 6)
      // distinct cos per (l, r) pair via a bijective-ish rational grid —
      // keeps tie structure identical across engines and transforms
      rows <- Gen.listOfN(nl * nr, Gen.choose(-900, 900))
    } yield {
      val pairs = for { l <- 0 until nl; r <- 0 until nr } yield (l, r)
      pairs.zip(rows).map { case ((l, r), c) => (s"l$l", s"r$r", c / 1000.0) }
    }
    forAll(candGen) { rows =>
      val cand = rows.toDF("left_id", "right_id", "cos")
      def ranks(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
        df.select("left_id", "rank", "right_id").orderBy("left_id", "rank")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
      // MP is pure rank arithmetic: x → x/3 + 2 (strictly increasing)
      // preserves every per-partition rank, hence every MP score ratio
      val mp = ranks(graft.similarity.Similarity.mutualProximityRerank(cand, 3))
      val mpT = ranks(graft.similarity.Similarity.mutualProximityRerank(
        cand.withColumn("cos", col("cos") / 3 + 2), 3))
      assert(mpT == mp, "MP must be invariant under a monotone cos transform")
      // NICDM: scaling every distance by c > 0 cancels in d/sqrt(μμ).
      // cos' = 1 − 4·(1 − cos) scales d by 4 exactly in binary floats
      val nd = ranks(graft.similarity.Similarity.nicdmRerank(cand, 3, 2))
      val ndT = ranks(graft.similarity.Similarity.nicdmRerank(
        cand.withColumn("cos", lit(1.0) - (lit(1.0) - col("cos")) * 4), 3, 2))
      assert(ndT == nd, "NICDM ranking must be invariant under distance scaling")
    }
  }

  test("N-Triples escape/unescape are exact inverses on arbitrary strings") {
    // mirror of Rdf.toNTriples' regexp_replace chain, in plain Scala
    def escape(s: String): String = s
      .replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")
    val charGen = Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\\', '"', '\n', '\r', '\t', ' ', 'é', '∀', '中'),
      Gen.choose(0x20.toChar, 0x7e.toChar))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    samples(strGen, 40).foreach { s =>
      val enc = escape(s)
      assert(!enc.contains("\n") && !enc.contains("\r"),
        "escaped form must be single-line")
      assert(org.apache.spark.sql.graft.RdfUnescape.decode(enc) === s,
        s"round-trip failed for ${s.map(_.toInt).mkString(",")}")
    }
    // UCHAR forms decode too (the parser accepts more than the writer emits)
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("\\u0041\\U0001F600x") === "A\ud83d\ude00x")
    // malformed escapes pass through rather than throwing
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("a\\zb\\uZZZZc\\") === "a\\zb\\uZZZZc\\")
    // hex that PARSES but is an invalid code point must pass through
    // too, not throw: parseInt accepts a sign ("\u-0ab" → -171) and
    // appendCodePoint rejects negatives / > 0x10FFFF ("\U00110000")
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("x\\u-0abY") === "x\\u-0abY")
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("x\\U00110000Y") === "x\\U00110000Y")
    // '+'-signed hex also parses ("\u+0ab" → +171) AND appendCodePoint
    // accepts it — only up-front hex validation keeps it verbatim
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("x\\u+0abY") === "x\\u+0abY")
    assert(org.apache.spark.sql.graft.RdfUnescape.decode("x\\U+001F600Y") === "x\\U+001F600Y")
  }

  // ---- curation funnel invariants ----------------------------------------

  /** Random corpora for the curation properties: a mix of English-ish
    * (stopword-bearing), German-ish, and degenerate-short texts so every
    * stage can fire; properties assume nothing about WHICH fires. */
  private val curDocGen: Gen[String] = {
    val en = Gen.listOfN(25, Gen.oneOf("the", "and", "with", "from",
      "quick", "brown", "jumps", "lazy", "fields", "hills", "distant",
      "speed", "green", "runs")).map(_.mkString(" "))
    val de = Gen.listOfN(12, Gen.oneOf("der", "die", "das", "und",
      "mit", "von", "ist", "wort", "satz", "heute")).map(_.mkString(" "))
    val short = Gen.oneOf("the and", "for that", "x")
    Gen.frequency(5 -> en, 3 -> de, 2 -> short)
  }

  test("WindowHitCount kernel == size(windowsArray ∩ grams) on adversarial text") {
    import org.apache.spark.sql.functions.{array_intersect, coalesce, lit, lower, size, trim, typedLit}
    // the kernel must replay the declarative form EXACTLY — leading
    // whitespace (empty first token after space-only trim), repeated
    // windows (distinct count), multi-space runs, short texts
    val texts = Seq(
      "a b c d e f", "a b c d a b c d", "\ta b c d", "a  b   c d",
      "", "one two three", "x x x x x x x", "a b c d e f g h",
      "der die das und mit von", "a b c d e f")
    val grams = Seq("a b c d", "b c d e", "x x x x", "der die das und")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val oldForm = df.select(col("id"), size(array_intersect(
      graft.dedup.Dedup.windowsArray(col("t"), 4),
      typedLit(grams))).cast("long").as("h"))
    val kernel = df.select(col("id"),
      org.apache.spark.sql.graft.TextOps.windowHitCount(
        trim(lower(coalesce(col("t"), lit("")))), 4, grams).as("h"))
    val o = oldForm.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val k = kernel.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    texts.indices.foreach { i =>
      assert(k(i) == o(i), s"text '${texts(i)}': kernel ${k(i)} vs old ${o(i)}")
    }
    // and a randomized sweep over token soup
    val tokGen = Gen.listOfN(30, Gen.oneOf("a", "b", "c", "dd", " ", "ee"))
      .map(_.mkString(" "))
    forAll(tokGen) { (t: String) =>
      val d2 = Seq((0, t)).toDF("id", "t")
      val ov = d2.select(size(array_intersect(
        graft.dedup.Dedup.windowsArray(col("t"), 3),
        typedLit(Seq("a b c", "b c dd", "ee a b")))).cast("long")).head.getLong(0)
      val kv = d2.select(org.apache.spark.sql.graft.TextOps.windowHitCount(
        trim(lower(coalesce(col("t"), lit("")))), 3,
        Seq("a b c", "b c dd", "ee a b"))).head.getLong(0)
      assert(kv == ov, s"'$t': $kv vs $ov")
    }
  }

  test("CharGrams kernel == transform/substr declarative form (incl. astral chars)") {
    import org.apache.spark.sql.functions.{array, length, lit, sequence, transform, when}
    // the form Text.qgrams used before the kernel — character semantics
    def declarative(v: org.apache.spark.sql.Column, q: Int) =
      when(length(v) < q, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), length(v) - lit(q - 1)),
          i => v.substr(i, lit(q))))
    val texts = Seq("", "ab", "abc", "abcd", "small ring", "ééé", "aé€b",
      "x😀y😁z", "  spaced  ", "ababab")
    for (q <- Seq(1, 2, 3, 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      val a = df.select(col("i"), declarative(col("t"), q).as("g"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
      val b = df.select(col("i"),
          graft.functions.Text.qgrams(col("t"), q).as("g"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
      texts.indices.foreach { i =>
        assert(b(i) == a(i), s"q=$q text='${texts(i)}': ${b(i)} vs ${a(i)}")
      }
    }
  }

  test("curation: drop stages partition the corpus; keep == no stage") {
    forAll(Gen.nonEmptyListOf(curDocGen)) { (texts: List[String]) =>
      // duplicate the first doc so the dedup stage can fire
      val rows = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toString, t) }
      val corpus = rows.toDF("doc_id", "text")
      val bench = Seq(("b0", texts.head)).toDF("doc_id", "text")
      val vdf = graft.text.Curation.verdicts(corpus, bench,
        allowedLangs = Seq("en"), contamN = 4,
        minWords = 5, minStopwords = 0)
      val v = vdf.collect()
      assert(v.length == rows.length)
      v.foreach { r =>
        val stage = r.getAs[String]("drop_stage")
        assert(r.getAs[Boolean]("keep") == (stage == null))
        assert(stage == null || Set("lang", "quality", "duplicate",
          "contaminated").contains(stage))
      }
      val f = graft.text.Curation.funnel(vdf).head()
      assert(f.getAs[Long]("n_docs") == rows.length.toLong)
      assert(f.getAs[Long]("n_lang") + f.getAs[Long]("n_quality") +
        f.getAs[Long]("n_duplicate") + f.getAs[Long]("n_contaminated") +
        f.getAs[Long]("n_kept") == rows.length.toLong)
    }
  }

  test("curation: every dup_of target is a gate-surviving group minimum") {
    forAll(Gen.nonEmptyListOf(curDocGen)) { (texts: List[String]) =>
      val rows = (texts ++ texts.take(2)).zipWithIndex
        .map { case (t, i) => (i.toString, t) }
      val corpus = rows.toDF("doc_id", "text")
      val bench = Seq(("b0", "benchmark gram window marker here"))
        .toDF("doc_id", "text")
      val v = graft.text.Curation.verdicts(corpus, bench,
          allowedLangs = Seq("en", "de"), contamN = 4,
          minWords = 3, minStopwords = 0).collect()
        .map(r => r.getAs[String]("id") -> r).toMap
      v.values.foreach { r =>
        Option(r.getAs[String]("dup_of")).foreach { target =>
          assert(target < r.getAs[String]("id")) // lexicographic group min
          val t = v(target)
          // the canonical passed lang+quality and is nobody's duplicate;
          // it may still fall to the LATER contamination stage
          assert(t.getAs[String]("dup_of") == null)
          val ts = t.getAs[String]("drop_stage")
          assert(ts == null || ts == "contaminated", s"canonical $target: $ts")
        }
      }
    }
  }

  test("dslRerank is translation invariant (pure Euclidean geometry)") {
    // DisSimLocal is built from ‖·‖² of DIFFERENCES only, so shifting
    // every vector by the same Δ must leave scores and ranks unchanged —
    // the property that distinguishes it from the cosine-based reranks
    // (which are origin-anchored and NOT translation invariant).
    val vecGen = Gen.listOfN(3, Gen.chooseNum(-5.0, 5.0))
    val graphGen = for {
      nl <- Gen.choose(2, 4)
      nr <- Gen.choose(2, 5)
      lvs <- Gen.listOfN(nl, vecGen)
      rvs <- Gen.listOfN(nr, vecGen)
      shift <- vecGen
      cos <- Gen.listOfN(nl * nr, Gen.chooseNum(-1.0, 1.0))
    } yield (lvs, rvs, shift, cos)
    forAll(graphGen) { case (lvs, rvs, shift, coss) =>
      val cand = (for {
        i <- lvs.indices; j <- rvs.indices
      } yield (s"l$i", s"r$j", coss(i * rvs.size + j)))
        .toDF("left_id", "right_id", "cos")
      def frames(vs: List[List[Double]], p: String, d: List[Double]) =
        vs.zipWithIndex.map { case (v, i) =>
          (s"$p$i", v.zip(d).map { case (a, b) => a + b })
        }.toDF("id", "vec")
      def run(d: List[Double]) = graft.similarity.Similarity
        .dslRerank(cand, frames(lvs, "l", d), frames(rvs, "r", d),
          k = 3, scaleK = 2)
        .select("left_id", "right_id", "rank", "dsl").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getInt(2), r.getDouble(3))).toMap
      val base = run(List(0.0, 0.0, 0.0))
      val shifted = run(shift)
      assert(base.keySet == shifted.keySet)
      base.foreach { case (k, (rank, s)) =>
        assert(shifted(k)._1 == rank && math.abs(shifted(k)._2 - s) < 1e-6,
          s"$k: ($rank, $s) vs ${shifted(k)} under shift $shift")
      }
    }
  }

  test("ngramJaccardPairs equals brute-force set Jaccard on random shingle tables") {
    // Pins the round-17 doc-set-collapse + chunked-enumeration rewrite
    // against an INDEPENDENT driver-side computation (the Borůvka/
    // Kruskal precedent): tiny key vocabulary forces heavy cross-doc
    // collisions, duplicate (id, key) rows exercise the collect_set
    // dedup guard.
    val rowG = for {
      d <- Gen.choose(0, 7)
      k <- Gen.choose(1, 6)
    } yield (s"d$d", s"k$k")
    val tableG = Gen.nonEmptyListOf(rowG)
    val thrG = Gen.oneOf(0.05, 0.3, 0.6)
    forAll(tableG, thrG) { (rows: List[(String, String)], thr: Double) =>
      val sets = rows.distinct.groupBy(_._1)
        .map { case (id, rs) => id -> rs.map(_._2).toSet }
      val expected = (for {
        a <- sets.keys; b <- sets.keys; if a < b
        j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if j >= thr
      } yield (a, b) -> j).toMap
      val got = graft.dedup.Dedup
        .ngramJaccardPairs(rows.toDF("id", "key"), thr).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == expected.keySet,
        s"thr=$thr missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
      expected.foreach { case (p, j) =>
        assert(math.abs(got(p) - j) < 1e-12, s"$p: ${got(p)} vs $j")
      }
      // an above-max-df cap is the identity (capped pairs ⊆ uncapped
      // with the difference confined to capped keys — here none)
      val capped = graft.dedup.Dedup
        .ngramJaccardPairs(rows.toDF("id", "key"), thr,
          maxDocFreq = sets.size).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(capped == got)
    }
  }

  test("punktLearnAbbrevs equals an independent Kiss & Strunk computation") {
    // The criterion re-implemented in plain Scala from the published
    // formulas (same tokenization contract), compared type-by-type on
    // random corpora — any drift in a factor, constant, count, or the
    // strip rule fails here independently of the hand fixture.
    def ref(tokens: Seq[String], threshold: Double)
        : Map[String, (Long, Long, Double, Boolean)] = {
      val toks = tokens
        .map(_.toLowerCase.replaceAll("^[^a-z0-9.]+|[^a-z0-9.]+$", ""))
        .filter(_.nonEmpty)
      val n = toks.size.toDouble
      val p1 = toks.count(_.endsWith(".")) / n
      toks.groupBy(t => if (t.endsWith(".")) t.dropRight(1) else t)
        .filter { case (base, _) =>
          base.nonEmpty && base.exists(c => c >= 'a' && c <= 'z') }
        .flatMap { case (base, occ) =>
          val k = occ.count(_.endsWith(".")).toDouble
          val cp = occ.size - k
          if (k < 1) None else {
            val nullH = k * math.log(p1) + cp * math.log(1.0 - p1)
            val altH = k * math.log(0.99) + cp * math.log(0.01)
            val ll = -2.0 * (nullH - altH)
            val periods = base.count(_ == '.') + 1.0
            // NLTK: len(typ) - num_periods + 1 == non-period char count
            val nonP = base.count(_ != '.').toDouble
            val score = ll * math.exp(-nonP) * periods * math.pow(nonP, -cp)
            Some(base -> (k.toLong, cp.toLong,
              math.floor(score * 1e6 + 0.5) / 1e6, score >= threshold))
          }
        }
    }
    val tokenG = Gen.oneOf(
      "dr.", "dr", "u.s.", "cat", "cat.", "the", "(the)", "\"ms.\"",
      "1990.", "...", "vs.", "end.")
    val corpusG = Gen.nonEmptyListOf(tokenG)
      // ln-domain precondition: ≥ 1 period-final and ≥ 1 plain token
      .map(ts => "end." :: "the" :: ts)
    forAll(corpusG) { (tokens: List[String]) =>
      val docs = tokens.grouped(7).zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.punktLearnAbbrevs(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
      val want = ref(tokens, 0.3)
      assert(got.keySet == want.keySet,
        s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
      want.foreach { case (t, (k, cp, sc, ab)) =>
        val (gk, gcp, gsc, gab) = got(t)
        assert(gk == k && gcp == cp && gab == ab &&
          math.abs(gsc - sc) < 1e-9, s"$t: ${got(t)} vs ${want(t)}")
      }
    }
  }
}
