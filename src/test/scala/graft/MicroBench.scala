package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.text.TextAnalysis

/** Scratch timing harness (test scope). Run: sbt 'Test/runMain graft.MicroBench'. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime; val n = f
      println(f"[micro] $name%-28s ${(System.nanoTime - s) / 1e9}%.2f s  rows=$n")
    }
    def feats(df: org.apache.spark.sql.DataFrame) = {
      val toks = Text.tokenize(coalesce(col("text"), lit("")), 1, Nil)
      df.select(col("doc_id").cast("string").as("id"),
          explode(concat(toks, Text.wordShingles(toks, 2))).as("f"))
        .select(col("id"), pmod(Text.md5Long(col("f")), lit(1024L)).as("bkt"))
    }
    t("feats-scan")(feats(docs).count())
    t("feats-scan-2")(feats(docs).count())
    val en = docs.filter(col("lang") === "en")
    t("dsir-full")(TextAnalysis.dsirWeights(docs, en, "doc_id", "text").count())
    t("dsir-full-2")(TextAnalysis.dsirWeights(docs, en, "doc_id", "text").count())
    t("dsir-full-3")(TextAnalysis.dsirWeights(docs, en, "doc_id", "text").count())
    spark.stop()
  }
}
