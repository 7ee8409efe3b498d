package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.BloomFilter

import graft.dedup.Dedup
import graft.functions.Text
import graft.text.TextAnalysis

/** Curation AT INGEST: the batch verdict funnel
  * ([[graft.text.Curation]]) re-expressed streaming-safe, so a corpus
  * is tagged as it ARRIVES instead of in a nightly re-scan — the
  * incremental half of the "tag, don't drop" contract, same discipline
  * as [[AnnServing]] (index once / query many → curate once / ingest
  * forever).
  *
  * Streaming-safe construction (no window functions, ONE stateful op):
  *
  *   1. langid + quality tagging is the batch path's own row-local
  *      projection ([[TextAnalysis.qualityFilter]] with passthrough) —
  *      identical expressions, so signals agree bit-for-bit;
  *   2. contamination is row-local: the benchmark gram set (eval-suite-
  *      sized, the same broadcast contract as [[Dedup.decontaminate]])
  *      is snapshot at plan time into (a) a Bloom filter probed per
  *      window by the codegen'd
  *      [[org.apache.spark.sql.graft.BloomMightContain]] kernel and
  *      (b) an exact array literal that confirms ONLY the rare
  *      maybe-hits — no false positives survive, so `n_hits` equals the
  *      batch semi-join count exactly while the per-row cost stays
  *      O(windows) for the clean 99%+ of a corpus;
  *   3. the exact-duplicate canonical is the one stateful op:
  *      `flatMapGroupsWithState` keyed on the row-local dup_key (md5 of
  *      the sorted distinct token set — [[Dedup.exactDuplicates]]'s
  *      key), state = the first-seen surviving id. Gate failures bypass
  *      the state entirely (batch semantics: a dropped document never
  *      shadows a surviving copy) and are unioned back stateless.
  *
  * Canonical choice: FIRST-SEEN across micro-batches (ingest order —
  * the only meaningful order a stream has), lexicographic min id within
  * a batch. A batch invocation therefore reproduces
  * [[graft.text.Curation.verdicts]] row-for-row (one "batch" = whole
  * corpus → min id = the batch canonical; spec-asserted, and the
  * `st_curation_verdicts` driver query shares `cur_verdicts`' oracle).
  *
  * State size: one (dup_key → id) entry per DISTINCT surviving content
  * — bounded by corpus novelty, the same growth class as the exact
  * streaming dedup ([[StreamingOps]]); apply its TTL discipline if the
  * stream is unbounded and re-tagging old content is acceptable.
  */
object StreamingCuration {

  /** A gate-surviving document entering the dedup state op. */
  final case class GateDoc(id: String, lang: String, nTokens: Long,
      nHits: Long, dupKey: String)

  /** One per-document verdict row — the schema of
    * [[graft.text.Curation.verdicts]]. */
  final case class CurationVerdict(id: String, lang: String, n_tokens: Long,
      quality_reason: Option[String], dup_of: Option[String], n_hits: Long,
      drop_stage: Option[String], keep: Boolean)

  /** Per-document curation verdicts over a STREAM of documents against
    * a static `benchmark`. Same stages, knobs and output schema as
    * [[graft.text.Curation.verdicts]]; see the object doc for the
    * streaming-safe plan shape. */
  def verdicts(stream: DataFrame, benchmark: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               allowedLangs: Seq[String] = Seq("en"),
               contamN: Int = 8,
               minWords: Int = 20, maxWords: Int = 100000,
               minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
               minStopwords: Int = 1, maxDupFrac: Double = 0.6)(
      implicit spark: SparkSession): Dataset[CurationVerdict] = {
    import spark.implicits._

    // plan-time snapshot of the benchmark gram set (eval-suite-sized by
    // the decontaminate contract): bloom for the row-local prefilter,
    // exact literal for the confirm
    val grams = Dedup.benchmarkGrams(benchmark, idCol, textCol, contamN)
      .collect().map(_.getString(0))
    val nHits: Column =
      if (grams.isEmpty) lit(0L) // empty eval suite: nothing to hit (and
      // a zero-item bloom/empty literal has no well-defined type)
      else {
        val bloom = BloomFilter.create(math.max(grams.length.toLong, 1L), 0.001)
        grams.foreach(bloom.putString)
        val bloomBytes = org.apache.spark.sql.graft.BloomOps.serialize(bloom)
        Text.letBind(Dedup.windowsArray(col("_text"), contamN)) { w =>
          Text.letBind(filter(w, g =>
            org.apache.spark.sql.graft.BloomOps.mightContain(bloomBytes, g))) {
            maybe =>
              when(size(maybe) === 0, lit(0L))
                .otherwise(size(array_intersect(maybe, typedlit(grams.toSeq)))
                  .cast("long"))
          }
        }
      }

    val base = stream.select(col(idCol).cast("string").as("id"),
      col(textCol).as("_text"),
      TextAnalysis.langId(col(textCol)).as("lang"))
    val enriched = TextAnalysis.qualityFilter(base, "id", "_text",
        minWords, maxWords, minMeanLen, maxMeanLen, minStopwords,
        maxDupFrac, passthrough = Seq("lang", "_text"))
      .withColumnRenamed("reason", "quality_reason")
      .withColumn("n_hits", nHits)
      .withColumn("dup_key", md5(concat_ws(" ",
        array_sort(array_distinct(Text.tokenize(col("_text")))))))
    val langOk = col("lang").isin(allowedLangs: _*)

    // gate failures: stateless verdicts, first-failure attribution
    val failed = enriched.filter(!(col("keep") && langOk))
      .select(col("id"), col("lang"), col("n_tokens"),
        col("quality_reason"),
        lit(null).cast("string").as("dup_of"), col("n_hits"),
        when(!langOk, "lang").otherwise("quality").as("drop_stage"),
        lit(false).as("keep"))
      .as[CurationVerdict]

    // gate survivors: the one stateful op — first-seen canonical per
    // dup_key; min-id within a batch so batch replay = batch semantics
    val survivors = enriched.filter(col("keep") && langOk)
      .select(col("id"), col("lang"), col("n_tokens").as("nTokens"),
        col("n_hits").as("nHits"), col("dup_key").as("dupKey"))
      .as[GateDoc]
    val judged = survivors.groupByKey(_.dupKey)
      .flatMapGroupsWithState[String, CurationVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          val docs = it.toIndexedSeq.sortBy(_.id)
          val canon =
            if (state.exists) state.get
            else { state.update(docs.head.id); docs.head.id }
          docs.iterator.map { d =>
            val dupOf = if (d.id == canon) None else Some(canon)
            val drop =
              if (dupOf.isDefined) Some("duplicate")
              else if (d.nHits > 0) Some("contaminated")
              else None
            CurationVerdict(d.id, d.lang, d.nTokens, None, dupOf, d.nHits,
              drop, drop.isEmpty)
          }
      }
    judged.union(failed)
  }
}
