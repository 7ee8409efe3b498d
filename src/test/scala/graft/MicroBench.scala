package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness (test scope). Run: sbt 'Test/runMain graft.MicroBench'.
  *
  * Current scratch: same-JVM A/B of Density.boruvkaMstIdx's streamed
  * (toLocalIterator past streamCollectRows) vs collect() minima path on
  * a rehearsal-shaped edge set built ONCE and persisted — the box's
  * cross-run wall variance (29→250 s on identical code in the round-18
  * session) makes separate-process A/Bs unusable, so the toggle runs
  * interleaved in one process against the same cached input.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val b = 64 // cluster size: within-cluster complete graphs, the rehearsal shape
    import graft.functions.Text
    import graft.similarity.Density
    // (ia, ib, _w): node i connects to every j > i in its 64-node cluster
    val edges = spark.range(0, n.toLong)
      .select(col("id").cast("int").as("ia"),
        least(lit(n - 1), (floor(col("id") / b) * b + (b - 1)).cast("int"))
          .as("_ce"))
      // sequence(a, b) DESCENDS when a > b — guard the cluster-end node
      .select(col("ia"), explode(when(col("ia") < col("_ce"),
        sequence(col("ia") + 1, col("_ce")))
        .otherwise(array().cast("array<int>"))).as("ib"))
      .withColumn("_w",
        (pmod(Text.md5Long(concat_ws(":", col("ia"), col("ib"))), lit(1000000))
          / 1000.0) + 0.001)
      .repartition(32)
      .persist()
    println(s"[micro] edges built: ${edges.count()} rows, n=$n")
    def mst(tag: String, thresh: Long): (Array[Int], Array[Int]) = {
      val prev = Density.streamCollectRows
      Density.streamCollectRows = thresh
      val s = System.nanoTime
      val (a, bb, _) = Density.boruvkaMstIdx(edges, n.toLong,
        maxDriverRows = 5000000L, guardWho = "MicroBench")
      println(f"[micro] $tag%-28s ${(System.nanoTime - s) / 1e9}%.2f s  mstRows=${a.length}")
      Density.streamCollectRows = prev
      (a, bb)
    }
    // interleaved pairs; first pair is warm-up territory, trust the later ones
    val r = Seq(
      mst("collect-1", Long.MaxValue), mst("stream-1", 1L << 18),
      mst("collect-2", Long.MaxValue), mst("stream-2", 1L << 18),
      mst("collect-3", Long.MaxValue), mst("stream-3", 1L << 18))
    val sets = r.map { case (a, bb) => a.zip(bb).sorted.toSeq }
    println(s"[micro] forests identical across all runs: ${sets.distinct.size == 1}")
    spark.stop()
  }
}
