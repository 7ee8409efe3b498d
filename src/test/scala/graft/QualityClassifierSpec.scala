package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

/** Discriminative quality classifier: separation on hand-built
  * good/garbage docs, the literal-weight projection contract, and the
  * deterministic degrade bootstrap. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def good(tag: String): String =
    ("the quick brown fox jumps over a lazy dog and then runs far away " +
      "with great speed through green fields toward distant hills near " +
      "the old stone bridge while evening light settles over ") + tag

  private lazy val corpus = (
    (1 to 8).map(i => (i.toString, good(s"meadow $i"))) ++
      (9 to 12).map(i => (i.toString, s"zzz qqq xxx $i"))
    ).toDF("doc_id", "text")
  private lazy val ref = (1 to 4)
    .map(i => (s"r$i", good(s"reference $i"))).toDF("doc_id", "text")

  test("fitScore separates good text from stopword-free garbage") {
    val scored = QualityClassifier
      .fitScore(corpus, ref, "doc_id", "text", sampleMod = 2)
      .collect().map(r => r.getAs[String]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap
    assert(scored.size == 12)
    scored.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    val goodMean = (1 to 8).map(i => scored(i.toString)).sum / 8
    val badMean = (9 to 12).map(i => scored(i.toString)).sum / 4
    assert(goodMean > badMean,
      s"good $goodMean should outscore garbage $badMean")
  }

  test("scoring is a projection: no MLlib transform, no shuffle in the plan") {
    // sampleMod=2: the 12-doc fixture has no id with md5 % 7 == 0, and
    // the zero-negative guard now fails that loudly (as it should)
    val scored = QualityClassifier.fitScore(corpus, ref, "doc_id", "text", sampleMod = 2)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"corpus scoring must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("udf"), "literal-weight sigmoid, not a model UDF")
  }

  test("zero-negative sample fails loudly instead of fitting a single class") {
    // ids 1..12 contain no md5 % 7 == 0 hit, so the default sampleMod
    // yields zero bootstrap negatives — the guard must raise, because a
    // single-class logistic fit would score every document ~1.0
    val ex = intercept[IllegalArgumentException] {
      QualityClassifier.fitScore(corpus, ref, "doc_id", "text", sampleMod = 7)
    }
    assert(ex.getMessage.contains("0 bootstrap negatives"))
  }

  test("degrade strips stopwords and truncates deterministically") {
    val out = Seq(("1", "The quick AND the dead keep walking onward forever"))
      .toDF("id", "t")
      .select(QualityClassifier.degrade(col("t"), keep = 3).as("d"))
      .head().getString(0)
    assert(out == "quick dead keep")
  }

  test("model margin/score are consistent with the learned coefficients") {
    val pos = QualityClassifier.features(ref, "doc_id", "text")
      .withColumn("label", lit(1.0))
    val neg = QualityClassifier.features(
        corpus.filter(col("doc_id") > "8")
          .select(col("doc_id"), QualityClassifier.degrade(col("text")).as("text")),
        "doc_id", "text")
      .withColumn("label", lit(0.0))
    val m = QualityClassifier.fit(pos.unionByName(neg))
    assert(m.coefficients.length == QualityClassifier.FeatureNames.length)
    // train accuracy 1.0 on this separable fixture
    val posAcc = pos.withColumn("q", m.score)
      .filter(col("q") > 0.5).count()
    val negAcc = neg.withColumn("q", m.score)
      .filter(col("q") < 0.5).count()
    assert(posAcc == pos.count() && negAcc == neg.count())
  }
}
