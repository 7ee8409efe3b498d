package graft

import graft.eval.Evaluation

/** Eval-metric goldens (reference tests/test_eval.py:75-111; BASELINE.md). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gold = (1 to 7).map(i => (s"A:$i", s"B:$i")).toDF("A", "B")

  private val example = Map(
    "0" -> (Seq("A:1", "A:2"), Seq("B:1")),
    "1" -> (Seq("A:3", "A:2", "A:4"), Seq("B:4", "B:5")),
    "2" -> (Seq("A:6"), Seq("B:5", "B:7")))

  test("quality golden (test_eval.py:75-87)") {
    val e = Evaluation.evaluate(blocksOf(example), gold, 8, 7)
    assert(e.truePositive == 2)
    assert(e.falseNegative == 5)
    assert(e.falsePositive == 8)
    assert(math.abs(e.recall - 0.2857142857142857) < 1e-12)
    assert(math.abs(e.precision - 0.2) < 1e-12)
    assert(math.abs(e.fMeasure - 0.23529411764705882) < 1e-12)
    assert(math.abs(e.reductionRatio - 0.8214285714285714) < 1e-12)
    assert(math.abs(e.h3r - 0.42396313364055294) < 1e-12)
  }

  test("nothing found (test_eval.py:90-101)") {
    val nothing = Map(
      "0" -> (Seq("A:1", "A:2"), Seq("B:4")),
      "1" -> (Seq("A:3", "A:2", "A:4"), Seq("A:1", "A:5")),
      "2" -> (Seq("A:6"), Seq("A:5", "A:7")))
    val e = Evaluation.evaluate(blocksOf(nothing), gold, 8, 7)
    assert(e.truePositive == 0)
    assert(e.falseNegative == 7)
    assert(e.falsePositive == 10)
    assert(e.recall == 0.0 && e.precision == 0.0 && e.fMeasure == 0.0 && e.h3r == 0.0)
    assert(math.abs(e.reductionRatio - 0.8214285714285714) < 1e-12)
  }

  test("duplicate pairs don't change recall/tp (test_eval.py:104-111)") {
    val dup = Map(
      "0" -> (Seq("A:1", "A:2"), Seq("B:1", "B:4")),
      "1" -> (Seq("A:1", "A:2"), Seq("B:1")),
      "2" -> (Seq("A:1", "A:3", "A:2", "A:4"), Seq("B:1", "B:5")),
      "3" -> (Seq("A:1", "A:3", "A:2", "A:4"), Seq("B:1", "B:5")),
      "4" -> (Seq("A:1", "A:3", "A:4"), Seq("B:1", "B:5")),
      "5" -> (Seq("A:1", "A:3", "A:4"), Seq("B:1", "B:4", "B:5")),
      "6" -> (Seq("A:1", "A:3", "A:4", "A:5"), Seq("B:1", "B:4")),
      "7" -> (Seq("A:6"), Seq("B:5", "B:7")))
    val e = Evaluation.evaluate(blocksOf(dup), gold, 8, 7)
    assert(e.truePositive == 2)
    assert(e.falseNegative == 5)
    assert(math.abs(e.recall - 0.2857142857142857) < 1e-12)
  }

  test("dice of true-positive sets is 1 for identical blockings") {
    val b = blocksOf(example)
    assert(Evaluation.diceOfTruePositives(b, b, gold) == 1.0)
  }
}
