package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd expression (java.text.Normalizer
  * is JDK-built-in, so no UDF and no external dependency): canonical
  * composition NFC for cross-system text identity (the corpus-prep
  * default — DuckDB's `nfc_normalize` reproduces it, making the operator
  * oracle-checkable), compatibility forms NFKC/NFKD for
  * fold-width/ligature token normalization before hashing.
  *
  * Row-local and streaming-safe; the JDK normalizer short-circuits on
  * already-normalized (e.g. pure-ASCII) strings, so the common case is
  * a scan, not a rewrite. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, normForm))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.${normForm.name()}));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** N-Triples string-escape decoding (RDF 1.1 N-Triples §2.4 ECHAR +
  * UCHAR: \t \b \n \r \f \" \' \\ and \uXXXX / \UXXXXXXXX) as a
  * codegen'd expression, so a distributed N-Triples scan stays inside
  * whole-stage codegen with zero UDFs. The common case — no backslash
  * in the lexical form — is a single indexOf and returns the input
  * buffer untouched. Malformed escapes pass through verbatim rather
  * than failing the whole partition (dump files at 100 TB always carry
  * a few bad rows; filter them with a validity predicate, don't crash
  * the scan). */
case class RdfUnescape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rdf_unescape needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RdfUnescape.decode(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  org.apache.spark.sql.graft.RdfUnescape.decode($s.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RdfUnescape =
    copy(child = newChild)
}

object RdfUnescape {
  private def allHex(s: String, from: Int, until: Int): Boolean = {
    var j = from
    while (j < until) {
      val h = s.charAt(j)
      if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
            (h >= 'A' && h <= 'F'))) return false
      j += 1
    }
    true
  }

  /** JVM-static so generated code and interpreted eval share one body. */
  def decode(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\' || i + 1 >= s.length) { sb.append(c); i += 1 }
      else {
        s.charAt(i + 1) match {
          case 't'  => sb.append('\t'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case '"'  => sb.append('"');  i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          // Validate the whole window is hex digits BEFORE parseInt:
          // parseInt accepts a sign, so "\u-0ab" parses to -171 (then
          // appendCodePoint throws IAE — caught) but "\u+0ab" parses to
          // +171 and SILENTLY decodes to U+00AB instead of passing
          // through verbatim. The IAE catch still guards the one case
          // hex-validation can't: "\U00110000" is all hex digits yet
          // above 0x10FFFF — appendCodePoint rejects it, and the exact
          // pass-through must survive in non-strict mode.
          case 'u' if i + 6 <= s.length && allHex(s, i + 2, i + 6) =>
            try { sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 6), 16)); i += 6 }
            catch { case _: IllegalArgumentException => sb.append(c); i += 1 }
          case 'U' if i + 10 <= s.length && allHex(s, i + 2, i + 10) =>
            try { sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16)); i += 10 }
            catch { case _: IllegalArgumentException => sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      }
    }
    sb.toString
  }
}

/** Column-level entry point. */
/** `window_hit_count(text, n, grams)` — the number of DISTINCT n-token
  * windows of `text` that occur in the `grams` set, in one compiled
  * pass. Semantically identical to
  * `size(array_intersect(windowsArray(text, n), typedlit(grams)))`
  * ([[graft.dedup.Dedup.windowsArray]] — whitespace split, windows of
  * `n` joined with a single space, distinct), but ~10× faster: the
  * higher-order `transform`/`filter` form evaluates INTERPRETED, one
  * Catalyst expression tree walk per window, while this kernel is a
  * tight JVM loop reached by a single codegen'd static call. The gram
  * set rides the plan as a codegen reference object (the
  * [[BloomMightContain]] mechanics) — one HashSet per JVM per plan, the
  * same size class as the array literal it replaces, and an exact set
  * probe is O(1) itself, so no Bloom prefilter is needed.
  *
  * The caller lowercases/trims upstream (Spark's own `lower`/`trim`
  * semantics, kept OUT of the kernel so locale rules cannot diverge).
  */
case class WindowHitCount(child: Expression, n: Int, grams: Seq[String])
    extends UnaryExpression {

  require(n >= 1, "window size must be >= 1")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hit_count needs a string, got $other")
  }

  /** Built once per JVM per plan; tasks share it via the codegen
    * reference. */
  @transient private lazy val gramSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](grams.length * 2)
    grams.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    WindowHitCount.count(input.asInstanceOf[UTF8String].toString, n, gramSet)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val set = ctx.addReferenceObj("gramSet", gramSet,
        classOf[java.util.HashSet[String]].getName)
      s"${ev.value} = org.apache.spark.sql.graft.WindowHitCount.count(" +
        s"$s.toString(), $n, $set);"
    })

  override protected def withNewChildInternal(newChild: Expression): WindowHitCount =
    copy(child = newChild)
}

object WindowHitCount {
  /** JVM-static shared by generated and interpreted eval. Exact
    * replay of `windowsArray ∩ grams`: split on `\s+` (leading empty
    * token kept, like Spark's limit=-1 split on trimmed input), windows
    * of `n` joined by one space, DISTINCT matches counted. */
  def count(s: String, n: Int, grams: java.util.HashSet[String]): Long = {
    val toks = s.split("\\s+", -1)
    if (toks.length < n || grams.isEmpty) return 0L
    val sb = new java.lang.StringBuilder(64)
    var hits: java.util.HashSet[String] = null
    var p = 0
    while (p <= toks.length - n) {
      sb.setLength(0)
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(toks(p + i))
        i += 1
      }
      val w = sb.toString
      if (grams.contains(w)) {
        if (hits == null) hits = new java.util.HashSet[String](8)
        hits.add(w)
      }
      p += 1
    }
    if (hits == null) 0L else hits.size.toLong
  }
}

/** `treebank_tokenize(text)` — NLTK's `TreebankWordTokenizer` as a
  * codegen'd expression (SURVEY F1's parity caveat: klinker tokenizes
  * with `nltk.word_tokenize`, reference token_blocking.py:10,22-39, so
  * a user porting configs byte-for-byte needs its token boundaries,
  * not our pinned regex split). The Treebank rules are the published
  * public algorithm (Penn Treebank sed script, as shipped in NLTK):
  * ASCII quote conversion to \`\`/'', punctuation/bracket spacing,
  * comma/colon splits guarded against digits (dates like `11-12-1973`
  * and decimals survive whole), FINAL-period split, contraction
  * clitics (`don't` → `do` + `n't`), then whitespace split.
  *
  * Like `word_tokenize`, the input is sentence-segmented first and
  * tokenized per sentence — here by the Punkt-LITE rule subset
  * ([[TreebankTokenize.sentences]]: final punctuation + capitalized
  * lookahead, initials/internal-period abbreviation guards, and a
  * static published-subset abbreviation list — "Mr.", "Dr.", "etc."
  * never end a sentence), so interior sentence-final periods split off
  * (`"York. Please"` → `York`, `.`, `Please`). Documented residual
  * divergence: Punkt's corpus-LEARNED abbreviations beyond the static
  * list split before a capitalized word here, and a listed
  * abbreviation genuinely ending a sentence never splits (Punkt
  * decides that case from corpus statistics). Entity attribute
  * values — the blocking surface, single-phrase strings — coincide
  * under both.
  *
  * Same mechanics as [[WindowHitCount]]: one static JVM method shared
  * by interpreted eval and codegen, precompiled `java.util.regex`
  * patterns, no interpreted higher-order functions. */
case class TreebankTokenize(child: Expression,
    extraAbbrevs: Seq[String] = Nil) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"treebank_tokenize needs a string, got $other")
  }

  // the user-supplied abbreviation set (`--abbrev-list`), normalized
  // once per expression instance. Rides the serialized plan to the
  // executors as part of the expression (and as a codegen reference
  // object) — a driver-side mutable registry would NOT propagate to
  // executor JVMs on a real cluster. Nil keeps the static fast path.
  @transient private lazy val extraSet: java.util.HashSet[String] =
    TreebankTokenize.normalizeAbbrevs(extraAbbrevs)

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TreebankTokenize.tokenize(input.asInstanceOf[UTF8String].toString,
          if (extraAbbrevs.isEmpty) null else extraSet)
        .map(UTF8String.fromString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val extra =
        if (extraAbbrevs.isEmpty) "(java.util.HashSet) null"
        else ctx.addReferenceObj("extraAbbrevs", extraSet,
          "java.util.HashSet")
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"org.apache.spark.sql.graft.TreebankTokenize.tokenizeUtf8($s.toString(), $extra));"
    })

  override protected def withNewChildInternal(newChild: Expression): TreebankTokenize =
    copy(child = newChild)
}

object TreebankTokenize {
  import java.util.regex.Pattern

  // The published Treebank rule set, in NLTK's application order.
  // Each pair is (compiled pattern, replacement) with Java's $n group
  // syntax in place of Python's \n.
  private val startingQuotes = Seq(
    Pattern.compile("^\"") -> "``",
    Pattern.compile("(``)") -> " $1 ",
    Pattern.compile("([ \\(\\[{<])(\"|'{2})") -> "$1 `` ")
  private val punctuation = Seq(
    Pattern.compile("([:,])([^\\d])") -> " $1 $2",
    Pattern.compile("([:,])$") -> " $1 ",
    Pattern.compile("\\.\\.\\.") -> " ... ",
    Pattern.compile("[;@#$%&]") -> " $0 ",
    Pattern.compile("([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$") -> "$1 $2$3 ",
    Pattern.compile("[?!]") -> " $0 ",
    Pattern.compile("([^'])' ") -> "$1 ' ")
  private val parensBrackets =
    Pattern.compile("[\\]\\[\\(\\)\\{\\}<>]") -> " $0 "
  private val doubleDashes = Pattern.compile("--") -> " -- "
  private val endingQuotes = Seq(
    Pattern.compile("''") -> " '' ",
    Pattern.compile("\"") -> " '' ",
    Pattern.compile("([^' ])('[sS]|'[mM]|'[dD]|') ") -> "$1 $2 ",
    Pattern.compile("([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ") -> "$1 $2 ")
  private val contractions = Seq(
    "\\b(can)(not)\\b", "\\b(d)('ye)\\b", "\\b(gim)(me)\\b",
    "\\b(gon)(na)\\b", "\\b(got)(ta)\\b", "\\b(lem)(me)\\b",
    "\\b(more)('n)\\b", "\\b(wan)(na)(?=\\s)", " ('t)(is)\\b", " ('t)(was)\\b")
    .map(p => Pattern.compile("(?i)" + p))

  // Punkt-lite sentence boundary: sentence-final [.!?]+ (plus closing
  // quotes/brackets), whitespace, then a capitalized opener (optionally
  // behind opening quotes/brackets).
  private val sentenceBoundary =
    Pattern.compile("([.!?]+[\"')\\]]*)\\s+(?=[\"'(\\[]*\\p{Lu})")

  /** Static abbreviation list — the published common-English subset
    * that rule-based splitters ship (titles, ranks, latin/company/
    * street forms): a listed word before '.' never ends a sentence,
    * standing in for Punkt's corpus-learned abbreviation set. Common
    * standalone words ("no", "fig") are deliberately absent — listing
    * them would swallow genuine boundaries ("I said no. Then ...")
    * more often than they guard real abbreviations. */
  private val abbreviations: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("mr", "mrs", "ms", "dr", "prof", "rev", "hon", "st", "jr", "sr",
      "gen", "sen", "rep", "gov", "capt", "col", "lt", "maj", "sgt",
      "vs", "etc", "inc", "ltd", "corp", "ave", "blvd", "rd", "mt",
      "vol", "dept", "univ", "assn", "bros", "approx").foreach(s.add)
    s
  }

  /** Lowercase + dedupe a user-supplied abbreviation list (the
    * `--abbrev-list` contract: entries are matched like the static
    * list — the word before '.', leading quotes/brackets stripped,
    * case-insensitively; a trailing '.' in the entry is tolerated). */
  def normalizeAbbrevs(extra: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    extra.iterator
      .map(_.trim.stripSuffix(".").toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).foreach(s.add)
    s
  }

  /** Punkt-lite sentence segmentation — the published RULE subset of
    * what `nltk.word_tokenize` does before tokenizing (Punkt sentence
    * split, Kiss & Strunk 2006), with NO learned model: split after
    * sentence-final punctuation followed by whitespace and a
    * capitalized sentence opener, guarded for '.' boundaries by the
    * classic abbreviation rules — a single-letter initial ("A. Smith"),
    * an internal-period abbreviation ("U.S. Government"), and the
    * static [[abbreviations]] list ("Mr. Smith", "Dr. Brown") never end
    * a sentence. Residual divergence vs Punkt (stated at
    * [[TreebankTokenize]]): corpus-LEARNED abbreviations beyond the
    * static list still split before a capitalized word, and a listed
    * abbreviation that genuinely ends a sentence never splits here
    * (Punkt's orthographic sentence-starter heuristics decide that
    * case from corpus statistics). */
  def sentences(text: String): Array[String] = sentences(text, null)

  /** [[sentences]] with a user-supplied extra abbreviation set (already
    * normalized via [[normalizeAbbrevs]]; null = none) merged into the
    * static guard — the `--abbrev-list` seam closing the residual for
    * domain corpora whose abbreviations Punkt would LEARN. */
  def sentences(text: String, extra: java.util.HashSet[String]): Array[String] = {
    val m = sentenceBoundary.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (m.find()) {
      val isPeriod = text.charAt(m.start()) == '.'
      // the token carrying the period: text back to the last whitespace
      val wordStart = {
        var i = m.start() - 1
        while (i >= 0 && !Character.isWhitespace(text.charAt(i))) i -= 1
        i + 1
      }
      val word = text.substring(wordStart, m.start())
      // abbreviation checks on the word with leading quotes/brackets
      // stripped ("(Mr" → "mr", "(A" → "A") — but NOT digits:
      // "1st"/"3rd" must keep their ordinal prefix so they never
      // collide with the "st"/"rd" street abbreviations (ordinals end
      // sentences, exactly like NLTK)
      val core = word.dropWhile(c => !Character.isLetterOrDigit(c))
      val lowered = core.toLowerCase(java.util.Locale.ROOT)
      val abbrev = isPeriod &&
        ((core.length == 1 && Character.isLetter(core.charAt(0))) ||
          word.contains('.') ||
          abbreviations.contains(lowered) ||
          (extra != null && extra.contains(lowered)))
      if (!abbrev) {
        out += text.substring(start, m.end(1))
        start = m.end()
      }
    }
    if (start == 0) Array(text)
    else { out += text.substring(start); out.toArray }
  }

  /** JVM-static, shared by generated and interpreted eval:
    * `word_tokenize` parity — Punkt-lite sentence split, Treebank rules
    * per sentence. Single-phrase values (the blocking surface) take the
    * one-sentence fast path, bit-identical to the pre-split form. */
  def tokenize(text: String): Array[String] = tokenize(text, null)

  def tokenize(text: String, extra: java.util.HashSet[String]): Array[String] = {
    val ss = sentences(text, extra)
    if (ss.length <= 1) tokenizeSentence(text)
    else ss.flatMap(tokenizeSentence)
  }

  /** One sentence through the published Treebank rule set. */
  def tokenizeSentence(text: String): Array[String] = {
    var t = text
    def subAll(rules: Seq[(Pattern, String)]): Unit =
      rules.foreach { case (p, r) => t = p.matcher(t).replaceAll(r) }
    subAll(startingQuotes)
    subAll(punctuation)
    t = parensBrackets._1.matcher(t).replaceAll(parensBrackets._2)
    t = doubleDashes._1.matcher(t).replaceAll(doubleDashes._2)
    t = " " + t + " "
    subAll(endingQuotes)
    contractions.foreach(p => t = p.matcher(t).replaceAll(" $1 $2 "))
    t.trim.split("\\s+").filter(_.nonEmpty)
  }

  def tokenizeUtf8(text: String): Array[UTF8String] =
    tokenize(text, null).map(UTF8String.fromString)

  def tokenizeUtf8(text: String,
      extra: java.util.HashSet[String]): Array[UTF8String] =
    tokenize(text, extra).map(UTF8String.fromString)
}

/** `char_grams(text, q)` — all character q-grams of `text`, in order,
  * one per start position: exactly
  * `transform(sequence(1, length(v) - q + 1), i => substr(v, i, q))`
  * (with the short-string guard), but as one compiled pass. The
  * higher-order form evaluates INTERPRETED and `substr` on UTF8String
  * re-scans from the string start per call — O(n²) per document on the
  * winnowing path's ~10⁶-char normalized texts. Here the char→byte
  * offsets are computed once and each gram is a byte-range slice:
  * O(n·q). Character (code point) semantics match Spark's `substr`
  * exactly, including astral-plane characters. */
case class CharGrams(child: Expression, q: Int) extends UnaryExpression {

  require(q >= 1, "q must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_grams needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      CharGrams.grams(input.asInstanceOf[UTF8String], q))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"org.apache.spark.sql.graft.CharGrams.grams($s, $q));"
    })

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  /** JVM-static, shared by generated and interpreted eval. */
  def grams(s: UTF8String, q: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    // char-start byte offsets, one forward walk
    var n = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1
    }
    if (n < q) return Array.empty
    val offs = new Array[Int](n + 1)
    var ci = 0; i = 0
    while (i < bytes.length) {
      offs(ci) = i; ci += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(n) = bytes.length
    val out = new Array[UTF8String](n - q + 1)
    var p = 0
    while (p <= n - q) {
      out(p) = UTF8String.fromBytes(bytes, offs(p), offs(p + q) - offs(p))
      p += 1
    }
    out
  }
}

object TextOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def normalize(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))

  def rdfUnescape(c: Column): Column =
    ExpressionUtils.column(RdfUnescape(ExpressionUtils.expression(c)))

  def windowHitCount(c: Column, n: Int, grams: Seq[String]): Column =
    ExpressionUtils.column(WindowHitCount(ExpressionUtils.expression(c), n, grams))

  def treebankTokenize(c: Column, extraAbbrevs: Seq[String] = Nil): Column =
    ExpressionUtils.column(
      TreebankTokenize(ExpressionUtils.expression(c), extraAbbrevs))

  def charGrams(c: Column, q: Int): Column =
    ExpressionUtils.column(CharGrams(ExpressionUtils.expression(c), q))
}
