package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.TreebankTokenize
import graft.blockers.TokenBlocker
import graft.functions.Text

/** F1 tokenizer-parity suite (SURVEY F1 caveat closed): the Treebank
  * kernel's rule-level behavior, and the reference's OWN golden token
  * blocks (tests/test_blockers.py:115-129) reproduced byte-for-byte
  * through the tokenizer seam. */
class NltkTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): List[String] =
    TreebankTokenize.tokenize(s).toList

  test("Treebank kernel: published rule set on classic shapes") {
    // hyphenated dates and decimals survive whole — THE divergence from
    // the pinned regex tokenizer that golden-block parity needs
    assert(toks("11-12-1973") == List("11-12-1973"))
    assert(toks("costs $3.88 now") == List("costs", "$", "3.88", "now"))
    // final-period split
    assert(toks("in New York.") == List("in", "New", "York", "."))
    // comma splits unless between digits
    assert(toks("one, two") == List("one", ",", "two"))
    assert(toks("1,000") == List("1,000"))
    // contraction clitics
    assert(toks("don't stop") == List("do", "n't", "stop"))
    assert(toks("They'll say it can't work") ==
      List("They", "'ll", "say", "it", "ca", "n't", "work"))
    assert(toks("cannot") == List("can", "not"))
    // brackets and question marks space out
    assert(toks("(hello) world?") == List("(", "hello", ")", "world", "?"))
    // ASCII double quotes become Treebank ``/''
    assert(toks("\"Hi\" there") == List("``", "Hi", "''", "there"))
    // possessive
    assert(toks("John's book") == List("John", "'s", "book"))
    // empty / whitespace
    assert(toks("") == Nil)
    assert(toks("   ") == Nil)
  }

  test("Punkt-lite sentence split: interior sentences tokenize per sentence") {
    // interior sentence-final period now splits off (word_tokenize
    // parity for multi-sentence values — the round-13 divergence)
    assert(toks("born in York. Please call.") ==
      List("born", "in", "York", ".", "Please", "call", "."))
    assert(toks("Stop! Now go.") == List("Stop", "!", "Now", "go", "."))
    // question marks end sentences too; quotes ride the boundary
    assert(toks("\"Really?\" She left.") ==
      List("``", "Really", "?", "''", "She", "left", "."))
    // abbreviation guards (the published rule subset): single-letter
    // initials and internal-period abbreviations never end a sentence
    assert(toks("A. Smith lives here.") ==
      List("A.", "Smith", "lives", "here", "."))
    assert(toks("the U.S. Government says") ==
      List("the", "U.S.", "Government", "says"))
    // no split without the capitalized lookahead — the interior period
    // stays attached, exactly the single-sentence Treebank behavior
    assert(toks("vers. two of it") == List("vers.", "two", "of", "it"))
    // sentence segmentation alone ("three" fails the capital lookahead,
    // so "Two! three?" stays one sentence)
    assert(TreebankTokenize.sentences("One. Two! three? Four.").toList ==
      List("One.", "Two! three?", "Four."))
  }

  test("static abbreviation list: titles/ranks before capitals match word_tokenize") {
    // the round-14 residual, closed: listed abbreviations never end a
    // sentence, so "Mr." survives whole exactly like NLTK (whose Punkt
    // model learned these from corpus statistics)
    assert(toks("Mr. Smith") == List("Mr.", "Smith"))
    assert(toks("Mr. Smith went to Washington. He arrived.") ==
      List("Mr.", "Smith", "went", "to", "Washington", ".",
        "He", "arrived", "."))
    assert(toks("Dr. Brown met Prof. Green.") ==
      List("Dr.", "Brown", "met", "Prof.", "Green", "."))
    assert(toks("He visited St. Paul. Then he left.") ==
      List("He", "visited", "St.", "Paul", ".", "Then", "he", "left", "."))
    // the letter core strips leading quotes/brackets before the lookup
    assert(TreebankTokenize.sentences("(Mr. Smith) agreed. So did I.").toList ==
      List("(Mr. Smith) agreed.", "So did I."))
    // ...and before the single-letter-initial guard too ("(A" → "A")
    assert(TreebankTokenize.sentences("He met (A. Smith) today. She left.").toList ==
      List("He met (A. Smith) today.", "She left."))
    // case-insensitive ("MR. SMITH" headlines)
    assert(TreebankTokenize.sentences("MR. SMITH AGREED.").toList ==
      List("MR. SMITH AGREED."))
    // unlisted words still split — the guard is the list, not all-words
    assert(toks("born in York. Please call.") ==
      List("born", "in", "York", ".", "Please", "call", "."))
    // ordinals are NOT abbreviations: the core keeps its digit prefix,
    // so "1st"/"3rd" never collide with the "st"/"rd" street forms
    assert(TreebankTokenize.sentences("He finished 1st. Then he left.").toList ==
      List("He finished 1st.", "Then he left."))
    assert(TreebankTokenize.sentences("It is on 3rd. Ave is next.").toList ==
      List("It is on 3rd.", "Ave is next."))
    // residual divergences, stated on the operator: an abbreviation NOT
    // in the static list still splits before a capital...
    assert(toks("see Reg. Smith") == List("see", "Reg", ".", "Smith"))
    // ...and a listed abbreviation genuinely ending a sentence does not
    // split (Punkt decides this case from corpus statistics)
    assert(TreebankTokenize.sentences("He works for the corp. Nobody knew.").toList ==
      List("He works for the corp. Nobody knew."))
  }

  test("sentences(): randomized reconstruction invariants (no chars lost, slices contiguous)") {
    import org.scalacheck.{Gen, rng}
    val word = Gen.oneOf("alpha", "Beta", "x", "U.S.", "Mr.", "A.", "12.5", "end")
    val punct = Gen.oneOf(".", "!", "?", "", "...", ".\"")
    val sep = Gen.oneOf(" ", "  ", " \t ")
    val textGen = for {
      n <- Gen.choose(1, 8)
      parts <- Gen.listOfN(n, for {
        w <- word; p <- punct; s <- sep
      } yield w + p + s)
    } yield parts.mkString.trim
    val params = Gen.Parameters.default.withSize(12)
    val texts = (0 until 60).flatMap(i => textGen(params, rng.Seed(7L + i)))
    texts.foreach { t =>
      val ss = TreebankTokenize.sentences(t)
      // no characters lost or duplicated (only boundary whitespace removed)
      assert(ss.mkString("").filterNot(_.isWhitespace) == t.filterNot(_.isWhitespace),
        s"chars drifted for <$t> -> ${ss.toList}")
      // every sentence is a contiguous slice of the input, in order
      var from = 0
      ss.foreach { s0 =>
        val at = t.indexOf(s0, from)
        assert(at >= from, s"<$s0> not a forward slice of <$t>")
        from = at + s0.length
      }
      // no boundary-less text splits
      if (!t.exists(".!?".contains(_))) assert(ss.length == 1, t)
    }
  }

  test("nltkTokenize = Treebank boundaries + FilteredTokenizer gate") {
    val got = Seq(("x", "John's \"old\" friends won't pay $3.88, right?"))
      .toDF("id", "t")
      .select(Text.nltkTokenize(col("t")).as("k"))
      .head.getSeq[String](0).toList
    // len >= 3 drops 's/``/''/$/,/?/wo ("won't" → "wo" + "n't"; the
    // 2-char stem falls to the length gate, the reference does the
    // same); stopwords are lowercase so the case-preserving tokens
    // pass the gate untouched
    assert(got == List("John", "old", "friends", "n't", "pay", "3.88", "right"))
  }

  test("reference golden token blocks reproduce byte-for-byte (test_blockers.py:115-129)") {
    // TokenBlocker over the conftest tables with the NLTK-parity seam
    // must emit EXACTLY the reference's expected_token_blocker fixture:
    // case-preserving keys, dates as single tokens.
    val got = TokenBlocker(tokenizer = Some(Text.nltkTokenize(_)))
      .assign(tableA, tableB)
    assertBlocksEqual(got, Map(
      "02-02-1983" -> (Set("a2"), Set("b2")),
      "04-12-1990" -> (Set("a3"), Set("b3", "b4")),
      "11-12-1973" -> (Set("a1"), Set("b1")),
      "Bulgaria"   -> (Set("a3"), Set("b3")),
      "John"       -> (Set("a1"), Set("b1")),
      "Maggie"     -> (Set("a2"), Set("b2")),
      "McExample"  -> (Set("a1"), Set("b1")),
      "Nushi"      -> (Set("a4"), Set("b5")),
      "Rebecca"    -> (Set("a3"), Set("b3")),
      "Smith"      -> (Set("a2", "a3"), Set("b2", "b3")),
      "USA"        -> (Set("a1", "a2"), Set("b2"))))
  }

  test("the seam defaults to the pinned regex tokenizer (unchanged behavior)") {
    val a = blockMap(TokenBlocker().assign(tableA, tableB))
    val b = blockMap(TokenBlocker(tokenizer = None).assign(tableA, tableB))
    assert(a == b)
    // regex tokenizer splits the dates the NLTK fixture keeps whole
    assert(a.contains("1973") && !a.contains("11-12-1973"))
  }

  test("user-supplied abbreviation list guards splits the static list misses") {
    import org.apache.spark.sql.graft.TreebankTokenize
    // "Fig." before a capital is NOT in the static list → splits...
    assert(TreebankTokenize.sentences("As shown in Fig. A the value rises.").toList ==
      List("As shown in Fig.", "A the value rises."))
    // ...and a user list closes it (normalization: case + trailing '.')
    val extra = TreebankTokenize.normalizeAbbrevs(Seq("Fig.", "al"))
    assert(TreebankTokenize.sentences("As shown in Fig. A the value rises.", extra).toList ==
      List("As shown in Fig. A the value rises."))
    assert(TreebankTokenize.sentences("Smith et al. Reported this first.", extra).toList ==
      List("Smith et al. Reported this first."))
    // the static guard keeps working alongside the extra set
    assert(TreebankTokenize.sentences("Mr. Smith agreed. So did I.", extra).toList ==
      List("Mr. Smith agreed.", "So did I."))
    // through the Column seam: the boundary '.' token disappears from
    // the guarded form (minLength=1 keeps periods visible)
    def toks(extraAbbrevs: Seq[String]) =
      Seq(("x", "See Fig. Two for details."))
        .toDF("id", "t")
        .select(Text.nltkTokenize(col("t"), minLength = 1,
          stopwords = Nil, extraAbbrevs = extraAbbrevs).as("k"))
        .head.getSeq[String](0).toList
    assert(toks(Nil) == List("See", "Fig", ".", "Two", "for", "details", "."))
    assert(toks(Seq("fig")) == List("See", "Fig.", "Two", "for", "details", "."))
  }

  test("Experiment --abbrev-list threads the file into the nltk seam") {
    spark.range(1).count() // force the shared session (readAbbrevList resolves SparkSession.active)
    val f = java.nio.file.Files.createTempFile("abbrevs", ".txt")
    java.nio.file.Files.writeString(f,
      "# domain abbreviations\nFig.\n\nal\n")
    try {
      val c = Experiment.parseArgs(Array(
        "--data", "x", "--blocker", "token", "--out", "y",
        "--tokenizer", "nltk", "--abbrev-list", f.toString))
      assert(c.abbrevList.contains(f.toString))
      val entries = Experiment.readAbbrevList(f.toString)
      assert(entries == Seq("Fig.", "al"), entries.toString)
      // the composed tokenizer keeps "Fig." whole before a capital
      val tok = Experiment.tokenizerFor(c).get
      // default gate: minLength 3 + stopwords ("for" drops, "." drops)
      val got = Seq(("x", "See Fig. Two for details."))
        .toDF("id", "t").select(tok(col("t")).as("k"))
        .head.getSeq[String](0).toList
      assert(got == List("See", "Fig.", "Two", "details"))
      // --abbrev-list without the nltk tokenizer is a loud error, not a no-op
      val ex = intercept[IllegalArgumentException] {
        Experiment.tokenizerFor(c.copy(tokenizer = "regex"))
      }
      assert(ex.getMessage.contains("abbrev-list"), ex.getMessage)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("Experiment --tokenizer nltk reaches the token blocker") {
    val c = Experiment.parseArgs(Array(
      "--data", "x", "--blocker", "token", "--out", "y",
      "--tokenizer", "nltk"))
    val blk = Experiment.blockerFor(c).asInstanceOf[TokenBlocker]
    assert(blk.tokenizer.isDefined)
    intercept[IllegalArgumentException] {
      Experiment.tokenizerFor(c.copy(tokenizer = "punkt"))
    }
  }

  test("LEARNED abbreviations guard splits end-to-end (--abbrev-learn)") {
    import graft.text.TextAnalysis
    // teach "fig" from corpus statistics alone — same closed-form shape
    // as the tx_punkt_learn fixture (5 always-period-final occurrences,
    // 200 tokens, p1 = 0.1 → score 3.102608 ≥ 0.3), no static-list entry
    val corpus = Seq(
      "fig. fig. fig. fig. \"fig.\"",
      Seq.fill(4)("u.s.").mkString(" "),
      "vs. vs. vs",
      "cat. " + Seq.fill(20)("cat").mkString(" "),
      Seq.fill(8)("end.").mkString(" ") + " " + Seq.fill(30)("end").mkString(" "),
      Seq.fill(128)("the").mkString(" ") + " (the)")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // "fig" is NOT in the static published subset: the unguarded splitter
    // breaks before the capital
    assert(TreebankTokenize.sentences("See fig. Two for details.").toList ==
      List("See fig.", "Two for details."))
    val learned = Experiment.learnAbbrevs(corpus.select(col("text")))
    assert(learned.toSet == Set("fig", "u.s"))
    // the learned survivors ride the same extraAbbrevs seam as
    // --abbrev-list: the boundary period stops being a sentence break
    def toks(extra: Seq[String]) = Seq(("x", "See fig. Two for details."))
      .toDF("id", "t")
      .select(Text.nltkTokenize(col("t"), minLength = 1,
        stopwords = Nil, extraAbbrevs = extra).as("k"))
      .head.getSeq[String](0).toList
    assert(toks(Nil) == List("See", "fig", ".", "Two", "for", "details", "."))
    assert(toks(learned) == List("See", "fig.", "Two", "for", "details", "."))
    // CLI seam: --abbrev-learn parses as a flag, is rejected loudly with
    // the regex tokenizer, and a learned-survivor config composes into
    // the gated tokenizer (default minLength 3 + stopwords)
    val c = Experiment.parseArgs(Array(
      "--data", "x", "--blocker", "token", "--out", "y",
      "--tokenizer", "nltk", "--abbrev-learn"))
    assert(c.abbrevLearn)
    val ex = intercept[IllegalArgumentException] {
      Experiment.tokenizerFor(c.copy(tokenizer = "regex"))
    }
    assert(ex.getMessage.contains("abbrev-learn"), ex.getMessage)
    val tok = Experiment.tokenizerFor(c.copy(learnedAbbrevs = learned)).get
    val got = Seq(("x", "See fig. Two for details."))
      .toDF("id", "t").select(tok(col("t")).as("k"))
      .head.getSeq[String](0).toList
    assert(got == List("See", "fig.", "Two", "details"))
  }
}
