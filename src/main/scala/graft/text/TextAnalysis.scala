package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Text-corpus analysis operators for training-data pipelines: language
  * identification, quality scoring, token counting, and document
  * fingerprinting. All codegen-only column expressions (no UDFs) with
  * DuckDB-mirrorable semantics.
  */
object TextAnalysis {

  /** Tiny per-language function-word lexicons (n-gram-heuristic language
    * ID in its simplest deterministic form). */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "mit", "von", "ist"),
    "en" -> Seq("the", "and", "for", "with", "from", "that", "this"),
    "es" -> Seq("los", "las", "con", "para", "por", "una", "del"),
    "fr" -> Seq("les", "des", "est", "avec", "dans", "une", "sur"))

  /** Language-ID: count lexicon hits over the token array; winner is the
    * highest score, ties broken by language code ascending; all-zero →
    * "und" (ISO 639 undetermined). */
  def langId(text: Column): Column = {
    val toks = split(lower(text), Text.TokenSplitRegex)
    val scored = Lexicons.map { case (lang, words) =>
      (lang, size(filter(toks, t => array_contains(typedLit(words), t))))
    }
    // argmax with lang-asc tie-break: fold over languages in order,
    // strictly-greater replaces
    val best = scored.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    best._1
  }

  /** Per-language lexicon score (for inspection/thresholding). */
  def langScore(text: Column, lang: String): Column = {
    val words = Lexicons.toMap.apply(lang)
    size(filter(split(lower(text), Text.TokenSplitRegex),
      t => array_contains(typedLit(words), t)))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alphanumeric runs + single non-space symbols —
    * the standard cheap proxy for subword token counts. */
  def bpeIshTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"))

  /** Document-quality heuristics (length, stopword ratio, mean word
    * length) combined into one [0,1] score:
    * 0.4·min(n_tok/100, 1) + 0.3·(1 − stopword_ratio) + 0.3·min(mean_len/8, 1).
    */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val nTok = size(toks)
    val stopRatio = size(filter(toks,
      t => array_contains(typedLit(Text.Stopwords), t))).cast("double") / nTok
    val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok
    // floor-scaled to micro-units rather than round(…, 6): both engines
    // compute the identical double, but their ROUND implementations can
    // disagree at a .5 boundary of the 6th decimal; floor cannot
    floor((
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - stopRatio) * 0.3 +
        least(meanLen / 8.0, lit(1.0)) * 0.3) * 1e6).cast("long")
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * the token-hash sequence, acc ← (31·acc + md5Long(tok)) mod 2⁴⁰.
    * Bounded accumulator keeps 31·acc + h < 2⁶³ (no overflow). */
  val FingerprintMod: Long = 1L << 40

  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * 31 + Text.md5Long(t), lit(FingerprintMod)))
}
