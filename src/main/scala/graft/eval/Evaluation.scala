package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Blocks
import graft.functions.Num

/** Blocking-quality metrics (reference src/klinker/eval.py:144-326).
  *
  * Fully distributed: candidate pairs stay a DataFrame (double explode +
  * distinct), the gold standard is broadcast into the TP join — the
  * reference's own `spark_eval.py:6-36` formulation, never the
  * driver-collecting `all_pairs` path (eval.py:201-215).
  */
final case class EvalResult(
    truePositive: Long, falsePositive: Long, falseNegative: Long,
    compWithBlocking: Long, compWithoutBlocking: Long) {

  private def harmonic(a: Double, b: Double): Double =
    if (a + b == 0) 0.0 else 2 * a * b / (a + b)

  def recall: Double = {
    val d = truePositive + falseNegative
    if (d == 0) 0.0 else truePositive.toDouble / d
  }
  def precision: Double = {
    val d = truePositive + falsePositive
    if (d == 0) 0.0 else truePositive.toDouble / d
  }
  def fMeasure: Double = harmonic(recall, precision)
  def reductionRatio: Double = 1.0 - compWithBlocking.toDouble / compWithoutBlocking
  def h3r: Double = harmonic(reductionRatio, recall)
  def pairsCompleteness: Double = recall

  def toMap: Map[String, Double] = Map(
    "recall" -> recall, "precision" -> precision, "f_measure" -> fMeasure,
    "reduction_ratio" -> reductionRatio, "h3r" -> h3r)
}

object Evaluation {

  /** gold: DataFrame(left_id, right_id) by position. */
  def evaluate(blocks: Blocks, gold: DataFrame, leftLen: Long, rightLen: Long): EvalResult = {
    val Array(gl, gr) = gold.columns.take(2)
    // Gold is a SET (eval.py gold_pair_set): dedup before the join, else
    // duplicate gold rows multiply candidate rows through the left join
    // and inflate pairs/tp.
    val g = gold.select(col(gl).cast("string").as("left_id"),
                        col(gr).cast("string").as("right_id")).distinct()
    val cand = blocks.distinctPairs
    // one pass: candidate count + TP count (gold broadcast)
    val counts = cand
      .join(broadcast(g.withColumn("_g", lit(1))), Seq("left_id", "right_id"), "left")
      .agg(count("*").as("pairs"), count(col("_g")).as("tp"))
      .head()
    val pairs = counts.getLong(0)
    val tp = counts.getLong(1)
    val goldCount = g.count()
    EvalResult(
      truePositive = tp,
      falsePositive = pairs - tp,
      falseNegative = goldCount - tp,
      compWithBlocking = pairs,
      compWithoutBlocking = leftLen * rightLen)
  }

  /** The metrics as a one-row DataFrame (rounded) — the oracle-checkable
    * surface of J7/A8. */
  def evaluateDF(spark: SparkSession, blocks: Blocks, gold: DataFrame,
                 leftLen: Long, rightLen: Long, scale: Int = 6): DataFrame = {
    val r = evaluate(blocks, gold, leftLen, rightLen)
    import spark.implicits._
    Seq((r.truePositive, r.compWithBlocking, r.recall, r.precision, r.fMeasure,
         r.reductionRatio, r.h3r))
      .toDF("tp", "pairs", "recall", "precision", "f_measure", "reduction_ratio", "h3r")
      .select(col("tp"), col("pairs"),
        Num.stableRound(col("recall"), scale).as("recall"),
        Num.stableRound(col("precision"), scale).as("precision"),
        Num.stableRound(col("f_measure"), scale).as("f_measure"),
        Num.stableRound(col("reduction_ratio"), scale).as("reduction_ratio"),
        Num.stableRound(col("h3r"), scale).as("h3r"))
  }

  /** The gold pairs a blocking finds, WITHOUT enumerating candidate
    * pairs: a gold pair is found iff some block key holds its left id on
    * the left side and its right id on the right side — two independent
    * single explodes (narrow rows, no arrays carried) joined through the
    * block key. Turns the O(Σ|L|·|R|) pair explosion into
    * O(Σ|L| + Σ|R|) work.
    *
    * Safe under duplicate block keys ([[Blocks.unionAll]] allows them): the
    * join key is a per-ROW fingerprint, not the block key alone, so a left
    * id in one row can never pair with a right id from a different row that
    * merely shares the key. (xxhash64 over the full row is deterministic —
    * unlike monotonically_increasing_id — so the two explode scans agree
    * without a persist; identical duplicate rows collide harmlessly since
    * their pair sets are identical and the result is distinct'd.) */
  def truePositivePairs(blocks: Blocks, gold: DataFrame): DataFrame = {
    val Array(gl, gr) = gold.columns.take(2)
    val g = broadcast(gold.select(col(gl).cast("string").as("left_id"),
                                  col(gr).cast("string").as("right_id")))
    val rows = blocks.df.select(
      xxhash64(col(Blocks.KeyCol), col(Blocks.LeftCol), col(Blocks.RightCol)).as("_row"),
      col(Blocks.LeftCol), col(Blocks.RightCol))
    val el = rows.select(col("_row"), explode(col(Blocks.LeftCol)).as("left_id"))
    val er = rows.select(col("_row"), explode(col(Blocks.RightCol)).as("right_id"))
    el.join(g, Seq("left_id"))
      .join(er, Seq("_row", "right_id"), "left_semi")
      .select("left_id", "right_id").distinct()
  }

  /** Sørensen-Dice coefficient of two blockings' true-positive sets
    * (eval.py:329-331) — distributed set algebra, no driver sets. All
    * three scalars (|A|, |B|, |A∩B|) come from ONE full-outer join with
    * presence flags in a single action, so each TP plan (a full
    * explode+join per blocking) is evaluated exactly once — no persists,
    * no triple execution. TP frames are distinct, so the outer join is
    * key-unique per side and the flag sums are exact set cardinalities. */
  def diceOfTruePositives(a: Blocks, b: Blocks, gold: DataFrame): Double = {
    val tpA = truePositivePairs(a, gold).withColumn("_a", lit(1L))
    val tpB = truePositivePairs(b, gold).withColumn("_b", lit(1L))
    val r = tpA.join(tpB, Seq("left_id", "right_id"), "full_outer")
      .agg(
        count(col("_a")).as("na"),
        count(col("_b")).as("nb"),
        count(when(col("_a").isNotNull && col("_b").isNotNull, 1)).as("ni"))
      .head()
    val (na, nb, ni) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (na + nb == 0) 0.0 else 2.0 * ni / (na + nb)
  }
}
