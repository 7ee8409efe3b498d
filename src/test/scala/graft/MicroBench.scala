package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness (test scope). Run: sbt 'Test/runMain graft.MicroBench'. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime; val n = f
      println(f"[micro] $name%-28s ${(System.nanoTime - s) / 1e9}%.2f s  rows=$n")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val or = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val pairs = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("su")).distinct()
    t("pairs-distinct")(pairs.count())
    val arcs = pairs.select(col("c").as("src"), col("su").as("dst"))
      .unionByName(pairs.select(col("su").as("src"), col("c").as("dst")))
    t("arcs")(arcs.count())
    t("pagerank-1")(graft.relational.PageRank.pageRank(arcs, 1).count())
    t("pagerank-3")(graft.relational.PageRank.pageRank(arcs, 3).count())
    t("pagerank-3-again")(graft.relational.PageRank.pageRank(arcs, 3).count())
    spark.stop()
  }
}
