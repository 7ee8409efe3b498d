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

  /** Metric by its reference name (eval.py to_dict keys). */
  def metric(name: String): Double = toMap.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown metric '$name'; one of ${toMap.keys.mkString(", ")}"))
}

object Evaluation {

  /** gold: DataFrame(left_id, right_id) by position.
    *
    * Broadcast contract: by default the gold standard is BROADCAST into
    * the TP join — gold is benchmark-sized (labeled match pairs, the
    * reference's contract throughout eval.py) and broadcasting keeps the
    * candidate side shuffle-free no matter how many pairs blocking
    * generates. If gold ever outgrows the driver/executor broadcast
    * budget (pathological: machine-generated gold at corpus scale), pass
    * `broadcastGold = false` for a plain shuffle hash join — identical
    * metrics (spec-asserted), one extra exchange on the candidate side. */
  def evaluate(blocks: Blocks, gold: DataFrame, leftLen: Long, rightLen: Long,
               broadcastGold: Boolean = true): EvalResult =
    evaluateMany(Seq("_" -> blocks), gold, leftLen, rightLen, broadcastGold)("_")

  /** Reserved `_blocker` tag for the gold-count branch of the fused
    * counting action ([[evaluateMany]]). */
  private val GoldTag = "__gold"

  /** Evaluate N blockings against one gold in ONE Spark action: each
    * blocking's distinct candidate pairs are tagged with its name,
    * left-joined against the (broadcast) gold flags, unioned with a
    * gold-count branch, and rolled up per tag — so N evaluations plus
    * the gold cardinality cost one job instead of 2N+... separate
    * actions (the round-18 action-fusion lever; identical counts, hence
    * identical metrics, to N [[evaluate]] calls by construction: each
    * branch is the exact per-blocker plan the single-blocker form ran,
    * and a blocker whose candidate stream is empty simply contributes
    * no group row → (pairs 0, tp 0), the same row an ungrouped agg over
    * an empty frame produced). */
  def evaluateMany(blocks: Seq[(String, Blocks)], gold: DataFrame,
                   leftLen: Long, rightLen: Long,
                   broadcastGold: Boolean = true): Map[String, EvalResult] = {
    require(blocks.nonEmpty, "evaluateMany needs at least one blocking")
    require(blocks.map(_._1).distinct.size == blocks.size, "duplicate blocker names")
    require(!blocks.exists(_._1 == GoldTag), s"blocker name '$GoldTag' is reserved")
    val Array(gl, gr) = gold.columns.take(2)
    // Gold is a SET (eval.py gold_pair_set): dedup before the join, else
    // duplicate gold rows multiply candidate rows through the left join
    // and inflate pairs/tp.
    val g = gold.select(col(gl).cast("string").as("left_id"),
                        col(gr).cast("string").as("right_id")).distinct()
    val flagged = g.withColumn("_g", lit(1))
    val gb = if (broadcastGold) broadcast(flagged) else flagged
    val tagged = blocks.map { case (n, b) =>
      b.distinctPairs
        .join(gb, Seq("left_id", "right_id"), "left")
        .select(lit(n).as("_blocker"), col("_g"))
    }.reduce(_ unionByName _)
      // gold-count branch: pairs == tp == |gold| for the reserved tag
      .unionByName(g.select(lit(GoldTag).as("_blocker"), lit(1).as("_g")))
    val counts = tagged.groupBy("_blocker")
      .agg(count(lit(1)).as("pairs"), count(col("_g")).as("tp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val goldCount = counts.get(GoldTag).map(_._1).getOrElse(0L)
    blocks.map { case (n, _) =>
      val (pairs, tp) = counts.getOrElse(n, (0L, 0L))
      n -> EvalResult(
        truePositive = tp,
        falsePositive = pairs - tp,
        falseNegative = goldCount - tp,
        compWithBlocking = pairs,
        compWithoutBlocking = leftLen * rightLen)
    }.toMap
  }

  /** The metrics as a one-row DataFrame (rounded) — the oracle-checkable
    * surface of J7/A8. */
  def evaluateDF(spark: SparkSession, blocks: Blocks, gold: DataFrame,
                 leftLen: Long, rightLen: Long, scale: Int = 6): DataFrame =
    resultDF(spark, evaluate(blocks, gold, leftLen, rightLen), scale)

  /** Any [[EvalResult]] as the one-row oracle-checkable DataFrame. */
  def resultDF(spark: SparkSession, r: EvalResult, scale: Int = 6): DataFrame = {
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
  def truePositivePairs(blocks: Blocks, gold: DataFrame,
                        broadcastGold: Boolean = true): DataFrame = {
    val Array(gl, gr) = gold.columns.take(2)
    val gp = gold.select(col(gl).cast("string").as("left_id"),
                         col(gr).cast("string").as("right_id"))
    // same broadcast contract as [[evaluate]]
    val g = if (broadcastGold) broadcast(gp) else gp
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

  /** Joint evaluation of two blockings WITHOUT re-blocking — the
    * reference's `Evaluation.from_joined_evals` (eval.py:262-279): the
    * true-positive set is the UNION of the two TP sets, while candidate
    * comparisons and false positives are SUMMED per-blocking (a candidate
    * both blockings generate is paid for twice — the reference's exact
    * algebra, since each blocking's comparisons happen regardless). Gold
    * and search space must be identical; `jointTruePositive` is
    * |TP_a ∪ TP_b| (see [[jointTruePositiveCount]]).
    *
    * Pure arithmetic on two already-computed results — the point of the
    * combinator is that evaluating both blockings AND their union costs
    * two evaluations plus one distinct-count, never a third blocking. */
  def fromJoinedEvals(a: EvalResult, b: EvalResult, jointTruePositive: Long): EvalResult = {
    val goldA = a.truePositive + a.falseNegative
    val goldB = b.truePositive + b.falseNegative
    require(goldA == goldB && a.compWithoutBlocking == b.compWithoutBlocking,
      s"can only join evals over the identical dataset (gold $goldA vs $goldB, " +
        s"space ${a.compWithoutBlocking} vs ${b.compWithoutBlocking})")
    require(jointTruePositive >= math.max(a.truePositive, b.truePositive) &&
        jointTruePositive <= math.min(goldA, a.truePositive + b.truePositive),
      s"joint TP $jointTruePositive inconsistent with inputs")
    EvalResult(
      truePositive = jointTruePositive,
      falsePositive = a.falsePositive + b.falsePositive,
      falseNegative = goldA - jointTruePositive,
      compWithBlocking = a.compWithBlocking + b.compWithBlocking,
      compWithoutBlocking = a.compWithoutBlocking)
  }

  /** |TP_a ∪ TP_b| — one union-distinct count over the two TP plans. */
  def jointTruePositiveCount(a: Blocks, b: Blocks, gold: DataFrame): Long =
    truePositivePairs(a, gold).unionByName(truePositivePairs(b, gold))
      .distinct().count()

  /** End-to-end joint evaluation of two blockings in ONE Spark action:
    * the two per-blocker counting branches of [[evaluateMany]] plus a
    * third tagged branch carrying |TP_a ∪ TP_b| (the distinct TP union,
    * built from the shuffle-free [[truePositivePairs]] plans), rolled up
    * per tag in one job — vs. the former two evals + two gold counts +
    * one union count (five actions). Counts, and hence the joined
    * metrics, are identical by construction. */
  def joinedEvaluate(a: Blocks, b: Blocks, gold: DataFrame,
                     leftLen: Long, rightLen: Long): EvalResult = {
    val JointTag = "__joint"
    val Array(gl, gr) = gold.columns.take(2)
    val g = gold.select(col(gl).cast("string").as("left_id"),
                        col(gr).cast("string").as("right_id")).distinct()
    val flagged = broadcast(g.withColumn("_g", lit(1)))
    def candBranch(n: String, b: Blocks) =
      b.distinctPairs
        .join(flagged, Seq("left_id", "right_id"), "left")
        .select(lit(n).as("_blocker"), col("_g"))
    val jointBranch = truePositivePairs(a, gold)
      .unionByName(truePositivePairs(b, gold)).distinct()
      .select(lit(JointTag).as("_blocker"), lit(1).as("_g"))
    val counts = candBranch("_a", a)
      .unionByName(candBranch("_b", b))
      .unionByName(g.select(lit(GoldTag).as("_blocker"), lit(1).as("_g")))
      .unionByName(jointBranch)
      .groupBy("_blocker")
      .agg(count(lit(1)).as("pairs"), count(col("_g")).as("tp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val goldCount = counts.get(GoldTag).map(_._1).getOrElse(0L)
    def res(n: String) = {
      val (pairs, tp) = counts.getOrElse(n, (0L, 0L))
      EvalResult(tp, pairs - tp, goldCount - tp, pairs, leftLen * rightLen)
    }
    fromJoinedEvals(res("_a"), res("_b"),
      counts.get(JointTag).map(_._1).getOrElse(0L))
  }

  /** All pairwise TP-set cardinalities for N blockings in ONE shuffle
    * chain: tag each blocking's TP pairs, aggregate the set of blockings
    * per gold pair, expand to ordered blocker pairs, count. Returns
    * ordered-pair counts; the diagonal (n, n) is |TP_n|. N is small
    * (blockers under comparison), the gold-pair space is
    * benchmark-sized — the n² driver map is a few dozen longs, while the
    * reference holds every TP SET in driver memory (eval.py:150-166).
    * Each TP plan executes once, vs the reference's n² pairwise set ops
    * re-touching each set n−1 times. */
  private def tpIntersections(
      blocks: Seq[(String, Blocks)], gold: DataFrame): Map[(String, String), Long] = {
    val tagged = blocks.map { case (name, b) =>
      truePositivePairs(b, gold)
        .select(col("left_id"), col("right_id"), lit(name).as("blocker"))
    }.reduce(_.unionByName(_))
    tagged.groupBy("left_id", "right_id")
      .agg(collect_set("blocker").as("bs"))
      .select(explode(col("bs")).as("a"), col("bs"))
      .select(col("a"), explode(col("bs")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private def pct(joined: Double, base: Double): Double =
    if (base == 0) 0.0 else (joined - base) / base

  /** N-way blocker comparison — the reference's
    * `multiple_block_comparison` (eval.py:457-521): for every unordered
    * pair of blockings, two rows (base, other) with the percent
    * improvement each metric gains when the base is joined with the
    * other (`(joined − base) / base`), plus the Dice coefficient of
    * their TP sets. Each blocking is evaluated ONCE and all TP-set
    * intersections come from one aggregation ([[tpIntersections]]) —
    * n evaluations + 1 shuffle, vs the reference's n² driver set ops. */
  def multipleBlockComparison(
      spark: SparkSession, blocks: Seq[(String, Blocks)], gold: DataFrame,
      leftLen: Long, rightLen: Long,
      improvementMetrics: Seq[String] = Seq("h3r"),
      scale: Int = 6): DataFrame = {
    require(blocks.map(_._1).distinct.size == blocks.size, "duplicate blocker names")
    val evals = evaluateMany(blocks, gold, leftLen, rightLen)
    val inter = tpIntersections(blocks, gold)
    def tp(n: String) = inter.getOrElse((n, n), 0L)
    val names = blocks.map(_._1)
    val rows = for {
      i <- names.indices; j <- (i + 1) until names.size
      (a, b) = (names(i), names(j))
    } yield {
      val ni = inter.getOrElse((a, b), 0L)
      val (na, nb) = (tp(a), tp(b))
      val dice = if (na + nb == 0) 0.0 else 2.0 * ni / (na + nb)
      val joined = fromJoinedEvals(evals(a), evals(b), na + nb - ni)
      def improvements(base: String) =
        improvementMetrics.map(m => pct(joined.metric(m), evals(base).metric(m)))
      Seq((a, b, improvements(a), dice), (b, a, improvements(b), dice))
    }
    import spark.implicits._
    val flat = rows.flatten.map { case (base, other, ims, dice) =>
      (base, other, ims, dice)
    }
    val df = flat.toDF("base", "other", "_ims", "dice_tp")
    val imCols = improvementMetrics.zipWithIndex.map { case (m, i) =>
      Num.stableRound(col("_ims").getItem(i), scale).as(s"improvement_$m")
    }
    df.select(col("base") +: col("other") +: imCols :+
        Num.stableRound(col("dice_tp"), scale).as("dice_tp"): _*)
      .orderBy("base", "other")
  }

  /** One-row-per-blocker comparison report: each blocking's own metrics
    * plus how it relates to the BEST blocking (highest h3r, ties by
    * name): Dice of TP sets vs best and the percent h3r improvement the
    * best would gain by joining with it (what this blocker ADDS on top
    * of the best — 0 for the best itself). Same cost shape as
    * [[multipleBlockComparison]]. */
  def comparisonReport(
      spark: SparkSession, blocks: Seq[(String, Blocks)], gold: DataFrame,
      leftLen: Long, rightLen: Long, scale: Int = 6): DataFrame = {
    require(blocks.map(_._1).distinct.size == blocks.size, "duplicate blocker names")
    val evals = evaluateMany(blocks, gold, leftLen, rightLen)
    val inter = tpIntersections(blocks, gold)
    def tp(n: String) = inter.getOrElse((n, n), 0L)
    val best = blocks.map(_._1).maxBy(n => (evals(n).h3r, n))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String.reverse))
    val rows = blocks.map { case (name, _) =>
      val e = evals(name)
      val (na, nb) = (tp(name), tp(best))
      val ni = if (name == best) na else inter.getOrElse((name, best), 0L)
      val dice = if (na + nb == 0) 0.0 else 2.0 * ni / (na + nb)
      val addOnBest =
        if (name == best) 0.0
        else pct(fromJoinedEvals(evals(best), e, na + nb - ni).h3r, evals(best).h3r)
      (name, name == best, e.truePositive, e.compWithBlocking,
        e.recall, e.precision, e.fMeasure, e.reductionRatio, e.h3r, dice, addOnBest)
    }
    import spark.implicits._
    rows.toDF("blocker", "is_best", "tp", "pairs", "recall", "precision",
        "f_measure", "reduction_ratio", "h3r", "dice_vs_best", "improvement_h3r")
      .select(col("blocker"), col("is_best"), col("tp"), col("pairs"),
        Num.stableRound(col("recall"), scale).as("recall"),
        Num.stableRound(col("precision"), scale).as("precision"),
        Num.stableRound(col("f_measure"), scale).as("f_measure"),
        Num.stableRound(col("reduction_ratio"), scale).as("reduction_ratio"),
        Num.stableRound(col("h3r"), scale).as("h3r"),
        Num.stableRound(col("dice_vs_best"), scale).as("dice_vs_best"),
        Num.stableRound(col("improvement_h3r"), scale).as("improvement_h3r"))
      .orderBy("blocker")
  }
}
