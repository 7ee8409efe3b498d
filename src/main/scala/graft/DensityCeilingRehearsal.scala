package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Num, Text, Vectors}
import graft.similarity.{Density, Similarity}

/** Measures [[graft.similarity.Density.hdbscanExact]]'s DRIVER ceiling —
  * the one contract the operator states but (before this) never measured
  * at its intended scale: `maxDriverRows` guards the n core rows + n−1
  * MST rows the driver collects and the 2n-slot condensed-tree arrays it
  * builds. This main stages the operator's own code path on a ≥1M-value
  * corpus and records the driver-side heap each stage retains, so the
  * default can be a measured number instead of an assertion.
  *
  * Fixture: `clusters` far-separated tight clusters of `B` points each in
  * 16-D (md5-derived centers in ±10, per-point displacement ≲ 2e-3).
  * Sign-LSH buckets resolve clusters (cluster width ≪ separation), so
  * the candidate graph is ~clusters × B²/2 pairs — the distance pass
  * stays distributed-cheap while the DRIVER sees the full n: n core
  * rows, ~n − clusters MST forest rows, 2n tree slots. That isolates
  * exactly what the guard bounds; a same-JVM local-mode run would
  * otherwise fold executor shuffle memory into the "driver" number, so
  * the driver stages are measured BETWEEN Spark jobs (post-GC retained
  * deltas), with a 50 ms peak sampler for the in-stage transient.
  *
  *   runMain graft.DensityCeilingRehearsal [values=1000000] [B=64]
  *
  * Writes one JSON line to density_ceiling.json
  * (SPARK_GRAFT_DENSITY_CEILING_OUT overrides).
  */
object DensityCeilingRehearsal {

  private val memBean = java.lang.management.ManagementFactory.getMemoryMXBean

  private def gcHeapMb(): Double = {
    System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
    memBean.getHeapMemoryUsage.getUsed / 1e6
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val b = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val planes = 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // peak sampler (the in-stage transient the retained deltas miss)
    @volatile var peakMb = 0.0
    val sampler = new Thread(() => {
      while (true) {
        peakMb = math.max(peakMb, memBean.getHeapMemoryUsage.getUsed / 1e6)
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true); sampler.start()

    def timed[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ceiling] $what%-28s $dt%8.1f s")
      (r, dt)
    }

    // ---- fixture ----------------------------------------------------------
    val clusters = n / b
    val emb = spark.range(0, n)
      .select(col("id"),
        transform(sequence(lit(1), lit(16)), d =>
          (pmod(Text.md5Long(concat_ws(":", floor(col("id") / b), d)), lit(20000))
            - 10000) / 1000.0 +
            pmod(Text.md5Long(concat_ws(":", col("id"), d)), lit(100)) / 50000.0
        ).as("vec"))
      .select(format_string("v%09d", col("id")).as("id"), col("vec"))

    // ---- the operator's own bucketed distance/core/reach construction
    // (Density.coreReachEdges with lshPlanes=24, planeDims=16) ----------
    val withB = emb.withColumn("_b",
      Similarity.hyperplaneBucket(slice(col("vec"), 1, 16), planes, 16))
    val dists = withB.select(col("_b"), col("id").as("ia"), col("vec").as("va"))
      .join(withB.select(col("_b"), col("id").as("ib"), col("vec").as("vb")),
        Seq("_b"))
      .filter(col("ia") < col("ib")).drop("_b")
      .select(col("ia"), col("ib"),
        Num.stableRound(sqrt(Vectors.sqDist(col("va"), col("vb"))), 6).as("d"))
    val sym = dists.unionByName(
      dists.select(col("ib").as("ia"), col("ia").as("ib"), col("d"))).persist()
    val w = Window.partitionBy("ia").orderBy(col("d").asc, col("ib").asc)
    val core = sym.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 2)
      .select(col("ia").as("id"), col("d").as("_c")).persist()
    val edges = sym
      .join(core.select(col("id").as("ia"), col("_c").as("_ca")), Seq("ia"))
      .join(core.select(col("id").as("ib"), col("_c").as("_cb")), Seq("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        greatest(col("_ca"), col("_cb"), col("d")).as("reach"))
    val (nPairs, wallEdges) = timed("distance+core (distributed)") {
      core.count(); sym.count() / 2
    }

    // ---- stage A: Borůvka MST (driver retains the n−1 forest rows) --------
    val h0 = gcHeapMb()
    peakMb = h0
    val (mst, wallMst) = timed("boruvkaMst") {
      val m = Density.boruvkaMst(edges)
      m.persist().count()
      m
    }
    val hMst = gcHeapMb()

    // ---- stage B: the hdbscanExact collects (core + MST on the driver) ----
    val ((coreArr, mstArr), wallCollect) = timed("driver collects") {
      (core.collect().map(r => (r.getString(0), r.getDouble(1))),
        mst.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))))
    }
    val hCollected = gcHeapMb()

    // ---- stage C: condensed tree (the 2n-slot arrays + ladder + labels) ---
    val (assigned, wallTree) = timed("exactDendrogram") {
      Density.exactDendrogram(coreArr, mstArr, 2)
    }
    val hTree = gcHeapMb()
    val clustered = assigned.size

    val inputsMb = hCollected - h0
    val treeMb = hTree - hCollected
    val peak = peakMb
    // linear driver contract → the 5M-default extrapolation
    val perRowBytes = (hTree - h0) * 1e6 / coreArr.length
    val at5mGb = perRowBytes * 5e6 / 1e9
    val json =
      s"""{"metric":"density_ceiling","values":$n,"clusters":$clusters,""" +
        s""""pairs":$nPairs,"core_rows":${coreArr.length},"mst_rows":${mstArr.length},""" +
        s""""clustered":$clustered,""" +
        s""""wall_edges_s":${f"$wallEdges%.1f"},"wall_mst_s":${f"$wallMst%.1f"},""" +
        s""""wall_collect_s":${f"$wallCollect%.1f"},"wall_tree_s":${f"$wallTree%.1f"},""" +
        s""""heap_base_mb":${f"$h0%.0f"},"heap_after_mst_mb":${f"$hMst%.0f"},""" +
        s""""heap_inputs_retained_mb":${f"$inputsMb%.0f"},""" +
        s""""heap_tree_retained_mb":${f"$treeMb%.0f"},"heap_peak_mb":${f"$peak%.0f"},""" +
        s""""per_row_bytes":${f"$perRowBytes%.0f"},"extrapolated_5m_gb":${f"$at5mGb%.1f"}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_DENSITY_CEILING_OUT", "density_ceiling.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
