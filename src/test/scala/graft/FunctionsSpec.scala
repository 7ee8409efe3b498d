package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Unit tests for the codegen-only text/vector primitives. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).head().getAs[T](0)

  private def arr[T](c: org.apache.spark.sql.Column): List[T] =
    spark.range(1).select(c).head().getSeq[T](0).toList

  test("tokenize: lowercase, split, min length, stopwords") {
    val got = arr[String](Text.tokenize(lit("The small RING-bearer, of 1990!")))
    assert(got == List("small", "ring", "bearer", "1990"))
  }

  test("qgrams: sliding character trigrams") {
    assert(arr[String](Text.qgrams(lit("small"), 3)) == Seq("sma", "mal", "all"))
    assert(arr[String](Text.qgrams(lit("ab"), 3)) == Seq.empty)
  }

  test("wordShingles: n-token windows") {
    val toks = array(lit("a"), lit("b"), lit("c"), lit("d"))
    assert(arr[String](Text.wordShingles(toks, 3)) == Seq("a b c", "b c d"))
    assert(arr[String](Text.wordShingles(array(lit("a")), 3)) == Seq.empty)
  }

  test("stripDatatype") {
    assert(one[String](Text.stripDatatype(lit("42^^xsd:int"))) == "42")
    assert(one[String](Text.stripDatatype(lit("plain"))) == "plain")
  }

  test("md5Long is deterministic, positive, and oracle-reproducible") {
    // DuckDB: SELECT ('0x'||substr(md5('abc'),1,15))::bigint = 648541476951500027
    assert(one[Long](Text.md5Long(lit("abc"))) == 648541476951500027L)
    assert(one[Long](Text.md5Long(lit(""))) >= 0L)
  }

  test("vector math") {
    val a = array(lit(1.0f), lit(2.0f), lit(2.0f))
    val b = array(lit(2.0f), lit(0.0f), lit(0.0f))
    assert(one[Double](Vectors.dot(a, b)) == 2.0)
    assert(one[Double](Vectors.l2Norm(a)) == 3.0)
    assert(math.abs(one[Double](Vectors.cosine(a, b)) - (2.0 / 6.0)) < 1e-12)
    assert(one[Double](Vectors.sqDist(a, b)) == 9.0)
    assert(arr[Double](Vectors.normalize(b)) == Seq(1.0, 0.0, 0.0))
    assert(arr[Double](Vectors.normalize(array(lit(0.0)))) == Seq(0.0))
  }

  test("dot_product is callable from SQL after extension registration") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(got == 11.0)
    // idempotent re-registration
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1.0D), array(2.0D))").head.getDouble(0) == 2.0)
  }

  test("graft_* scalar surface is callable from SQL and matches the Column API") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val df = Seq(("The small RING-bearer, of 1990!", "42^^xsd:int"))
      .toDF("text", "lit")
    df.createOrReplaceTempView("sqlfn_probe")
    val viaSql = spark.sql(
      """SELECT graft_tokenize(text)       AS toks,
        |       graft_tokenize(text, 5)    AS toks5,
        |       graft_qgrams(text, 4)      AS qg,
        |       graft_strip_datatype(lit)  AS stripped,
        |       graft_md5_long(text)       AS h,
        |       graft_lang_id(text)        AS lang,
        |       graft_ws_tokens(text)      AS ws,
        |       graft_bpe_tokens(text)     AS bpe,
        |       graft_fingerprint(graft_tokenize(text)) AS fp,
        |       graft_hamming(5L, 6L)      AS ham
        |FROM sqlfn_probe""".stripMargin).head
    val viaCol = df.select(
      graft.functions.Text.tokenize(col("text")),
      graft.functions.Text.tokenize(col("text"), 5),
      graft.functions.Text.qgrams(col("text"), 4),
      graft.functions.Text.stripDatatype(col("lit")),
      graft.functions.Text.md5Long(col("text")),
      graft.text.TextAnalysis.langId(col("text")),
      graft.text.TextAnalysis.wsTokenCount(col("text")),
      graft.text.TextAnalysis.bpeIshTokenCount(col("text")),
      graft.text.TextAnalysis.fingerprint(graft.functions.Text.tokenize(col("text"))),
      graft.functions.SimHash.hamming(lit(5L), lit(6L))).head
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.getSeq[String](0) == Seq("small", "ring", "bearer", "1990"))
    // foldable (but non-literal) parameter: builders run before constant
    // folding, so intLit must evaluate it itself
    val folded = spark.sql(
      "SELECT graft_qgrams(text, 2 + 2) AS qg FROM sqlfn_probe").head
    assert(folded.getSeq[String](0) ==
      viaSql.getSeq[String](2), "2 + 2 must behave as literal 4")
    // non-foldable parameter where a constant is required → clear error
    val err = intercept[Exception](
      spark.sql("SELECT graft_tokenize(text, length(text)) FROM sqlfn_probe")
        .collect())
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("graft_bloom_might_contain: SQL hex-literal filter probe ≡ driver filter") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val f = keys.stat.bloomFilter("k", 3L, 0.01)
    val hex = org.apache.spark.sql.graft.BloomOps.serialize(f)
      .map("%02X".format(_)).mkString
    val got = spark.sql(
      s"""SELECT v, graft_bloom_might_contain(X'$hex', v) AS m
         |FROM (VALUES ('alpha'), ('beta'), ('delta'), ('omega')) t(v)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    Seq("alpha", "beta", "delta", "omega").foreach { v =>
      assert(got(v) == f.mightContainString(v), v)
    }
    assert(got("alpha") && got("beta"), "members can never be false")
  }

  test("concatValues wide vs triple agree on fixture A") {
    val wide = tableA.concatValues().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val trip = graft.core.EntityFrame.unpivot(tableA).concatValues().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // same token multiset per entity (triple path sorts distinct tails)
    assert(wide.keySet == trip.keySet)
    wide.foreach { case (k, v) =>
      assert(v.split(" ").toSet == trip(k).split(" ").toSet, s"entity $k")
    }
  }

  test("MinHash.optimalParam: datasketch threshold->(b,r) tuning properties") {
    import graft.functions.MinHash.optimalParam
    // capacity respected
    for (t <- Seq(0.2, 0.5, 0.8); np <- Seq(16, 64, 128)) {
      val (b, r) = optimalParam(t, np)
      assert(b >= 1 && r >= 1 && b * r <= np, s"t=$t np=$np -> ($b,$r)")
    }
    // higher threshold needs more selective bands (more rows per band)
    val loR = optimalParam(0.2, 128)._2
    val hiR = optimalParam(0.9, 128)._2
    assert(hiR > loR)
    // penalizing false positives pushes toward more selective bands too
    val fpHeavy = optimalParam(0.5, 128, 0.9, 0.1)._2
    val fnHeavy = optimalParam(0.5, 128, 0.1, 0.9)._2
    assert(fpHeavy >= fnHeavy)
    // at the threshold the tuned S-curve sits near its steep middle:
    // collision probability strictly between the tails
    val (b, r) = optimalParam(0.5, 128)
    val p = 1.0 - math.pow(1.0 - math.pow(0.5, r), b)
    assert(p > 0.2 && p < 0.98, s"p@threshold=$p for ($b,$r)")
  }

  test("MinHashLSHBlocker.fromThreshold produces a runnable tuned blocker") {
    val blocker = graft.blockers.MinHashLSHBlocker.fromThreshold(
      threshold = 0.4, numPerm = 32)
    assert(blocker.numPerm % blocker.bands == 0)
    val blocks = blocker.assign(tableA, tableA)
    // every entity collides with itself in every band (identical sets)
    val selfPairs = blocks.pairs.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    Seq("a1", "a2", "a3", "a4", "a5").foreach { id =>
      assert(selfPairs.contains((id, id)))
    }
  }

  test("UnicodeNormalize: NFC collapses decomposed sequences; NFKC folds compatibility forms") {
    import spark.implicits._
    import org.apache.spark.sql.graft.TextOps
    val df = Seq(("cafe\u0301", "caf\u00e9"), ("\ufb01le", "file")).toDF("raw", "want")
    val nfc = df.select(TextOps.normalize(col("raw")).as("n"), col("raw"), col("want")).collect()
    assert(nfc(0).getString(0) == "caf\u00e9", "NFC must compose e+combining-acute")
    assert(nfc(1).getString(0) == "\ufb01le", "NFC must NOT fold the fi ligature")
    val nfkc = df.select(TextOps.normalize(col("raw"), "NFKC").as("n")).collect()
    assert(nfkc(0).getString(0) == "caf\u00e9" && nfkc(1).getString(0) == "file",
      "NFKC must fold compatibility ligatures")
    // SQL registration
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    // NB: Spark's chr() is ASCII-mod-256 (unlike DuckDB's codepoint
    // chr), so the combining char goes in as a literal
    val viaSql = spark.sql("SELECT graft_normalize('cafe\u0301'), graft_normalize('\ufb01le', 'NFKC')").head()
    assert(viaSql.getString(0) == "caf\u00e9" && viaSql.getString(1) == "file")
  }
}
