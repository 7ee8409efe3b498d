package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic MinHash + banded LSH (reference src/klinker/blockers/
  * lsh.py:99-213, datasketch MinHashLSH).
  *
  * Design decisions vs both the reference and MLlib:
  *   - the hash family is md5-derived (one `Text.md5Long` per token,
  *     then fixed md5-derived affine permutations — see [[signature]]),
  *     so signatures are reproducible ANYWHERE — including the DuckDB
  *     oracle — with no seed plumbing. datasketch uses sha1 with random
  *     permutations; MLlib uses seeded `(a*x+b) % prime` (the same
  *     affine scheme, seeded instead of content-derived). Semantics
  *     (uniform hash family) are equivalent; exact outputs differ —
  *     SURVEY.md M1 documents the divergence.
  *   - banding is explicit (b bands × r rows): two entities become
  *     candidates iff one band of their signatures is identical — the
  *     same OR-of-ANDs scheme datasketch builds from (threshold,
  *     weights). We expose (b, r) directly.
  *
  * Scale: signatures are one `groupBy(id)` over exploded tokens (map-side
  * combined mins); banding is a narrow projection; candidate generation
  * is a shuffle on the band key. Nothing is ever collected.
  */
object MinHash {

  /** Permutation family: ONE md5 per token (the expensive part), then
    * per-permutation affine mixing `h_i = (a_i·x + b_i) mod P` over the
    * md5's low 32 bits — the classic universal-hash permutation of Z_P,
    * with (a_i, b_i) themselves md5-derived build-time CONSTANTS (baked
    * as literals into both the Catalyst plan and the DuckDB oracle SQL,
    * so the family stays bit-reproducible everywhere). Replaces the
    * previous numPerm-md5s-per-token formulation: the signature stage's
    * digest cost drops by numPerm× while candidate quality is unchanged
    * in expectation (any affine map with a ≠ 0 permutes Z_P; the
    * md5-derived multipliers avoid the correlated-slope degeneracy of
    * sequential constants).
    *
    * Overflow discipline (same bound both engines): x < 2^32,
    * a < 2^28 → a·x + b < 2^60 + 2^61 — safe in int64 arithmetic. */
  val Modulus: Long = 4294967311L            // smallest prime > 2^32
  val Space: Long = 4294967296L              // 2^32
  private val MaxA: Long = (1L << 28) - 1

  /** Driver-side md5Long (first 15 hex chars as long) for constant
    * generation — same semantics as [[Text.md5Long]]'s column form. */
  private def md5Long15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Permutation constants (deterministic, engine-independent). */
  def permA(i: Int): Long = (md5Long15(s"a:$i") % MaxA) + 1
  def permB(i: Int): Long = md5Long15(s"b:$i") % Modulus

  /** (id, key)-pairs → (id, h0..h{n-1} min columns). The md5 is
    * computed ONCE per token row in a child projection (not once per
    * permutation inside each aggregate — subexpression elimination in
    * aggregate codegen is best-effort, a guaranteed single digest is
    * not); the numPerm mins then aggregate pure multiply-add-mod
    * expressions. */
  def signature(tokenPairs: DataFrame, numPerm: Int): DataFrame = {
    val mins = (0 until numPerm).map(i =>
      min((lit(permA(i)) * col("_x") + lit(permB(i))) % lit(Modulus)).as(s"h$i"))
    tokenPairs
      .select(col("id"), (Text.md5Long(col("key")) % lit(Space)).as("_x"))
      .groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Band key for band j over signature columns h{j*r}..h{j*r+r-1}:
    * `"<j>:" + md5(h.. joined by ',')`. */
  private def bandKey(j: Int, rows: Int): Column =
    concat(lit(s"$j:"), md5(concat_ws(",",
      (0 until rows).map(i => col(s"h${j * rows + i}").cast("string")): _*)))

  /** (id, sig cols) → exploded (id, key) band-bucket pairs, ready for
    * [[graft.blockers.Blocker.blockJoin]]. */
  def bandBuckets(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("id"),
      explode(array((0 until bands).map(j => bandKey(j, rows)): _*)).as("key"))

  /** tokens → band buckets in one go. */
  def buckets(tokenPairs: DataFrame, numPerm: Int, bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    bandBuckets(signature(tokenPairs, numPerm), bands, numPerm / bands)
  }

  /** datasketch's `_optimal_param` (the tuning MinHashLSH applies to the
    * reference's `(threshold, weights)` contract, lsh.py:99-141): over
    * all (b, r) with b·r ≤ numPerm, minimize
    * `fpWeight·∫₀^t (1−(1−sʳ)ᵇ) ds + fnWeight·∫_t¹ (1−(1−(1−sʳ)ᵇ)) ds`
    * where `1−(1−sʳ)ᵇ` is the band-collision probability at Jaccard s.
    * Midpoint integration at 1e-3 step — the argmin over the discrete
    * (b, r) grid is insensitive to quadrature error. Driver-side O(numPerm²)
    * arithmetic, no data touched. */
  def optimalParam(
      threshold: Double, numPerm: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(math.abs(fpWeight + fnWeight - 1.0) < 1e-9, "weights must sum to 1")
    def integrate(f: Double => Double, a: Double, b: Double): Double = {
      val n = math.max(1, ((b - a) / 0.001).toInt)
      val h = (b - a) / n
      (0 until n).map(i => f(a + h * (i + 0.5))).sum * h
    }
    var best = (1, 1)
    var bestErr = Double.MaxValue
    for (b <- 1 to numPerm; r <- 1 to numPerm / b) {
      def collide(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      val fp = integrate(collide, 0.0, threshold)
      val fn = integrate(s => 1.0 - collide(s), threshold, 1.0)
      val err = fp * fpWeight + fn * fnWeight
      if (err < bestErr) { bestErr = err; best = (b, r) }
    }
    best
  }

  // ---------- DuckDB oracle SQL generators (kept in lockstep) ----------

  /** SQL mirroring [[signature]] over a `(id, key)` relation — same
    * single-md5 + affine-constant structure, same literals. */
  def signatureSql(tokenRel: String, numPerm: Int): String = {
    val mins = (0 until numPerm)
      .map(i => s"min((${permA(i)} * x + ${permB(i)}) % $Modulus) AS h$i")
      .mkString(", ")
    s"""SELECT id, $mins FROM (
       |  SELECT id, ('0x'||substr(md5(key), 1, 15))::bigint % $Space AS x
       |  FROM ($tokenRel)) GROUP BY id""".stripMargin
  }

  /** SQL mirroring [[bandBuckets]]. */
  def bandBucketsSql(sigRel: String, bands: Int, rows: Int): String =
    (0 until bands).map { j =>
      val parts = (0 until rows).map(i => s"h${j * rows + i}::varchar")
        .mkString("||','||")
      s"SELECT id, '$j:'||md5($parts) AS key FROM ($sigRel)"
    }.mkString(" UNION ALL ")

  /** LSH (b, r) tuning curve: for each candidate banding (b bands × r
    * rows, b·r = numPerm) and Jaccard similarity s on a grid, the
    * collision probability 1 − (1 − sʳ)ᵇ — the S-curve whose threshold
    * ≈ (1/b)^(1/r) governs the recall/candidate-volume trade-off
    * (Leskovec/Rajaraman/Ullman, MMDS ch. 3). Principled parameter
    * selection before a corpus-scale run costs one 100-row table. */
  def lshTuningCurve(spark: org.apache.spark.sql.SparkSession,
      configs: Seq[(Int, Int)], steps: Int = 20): DataFrame = {
    import spark.implicits._
    val grid = spark.range(1, steps.toLong)
      .select((col("id").cast("double") / steps).as("s"))
    val br = configs.toDF("b", "r")
    grid.crossJoin(broadcast(br))
      .select(Num.stableRound(col("s"), 6).as("s"), col("b"), col("r"),
        Num.stableRound(
          lit(1.0) - pow(lit(1.0) - pow(col("s"), col("r")), col("b")),
          6).as("p_collide"))
  }
}

/** SimHash: 60-bit near-duplicate fingerprints from the same md5 hash
  * family (public algorithm: Charikar, STOC'02 — standard LLM-corpus
  * dedup tool; not present in the reference, part of this engine's
  * training-data-pipeline charter).
  *
  * fingerprint bit i = sign of Σ_tokens (bit_i(md5Long(token)) ? +1 : -1),
  * computed distributively: explode tokens → per-(id, bit) sums via a
  * 60-element transform → groupBy id.
  */
object SimHash {
  val Bits = 60

  /** (id, key) pairs → (id, simhash: long). One shuffle: 60 conditional
    * ±1 sums (static shifts, fully codegen'd, map-side combined), then
    * the fingerprint word is rebuilt from the sign of each sum. */
  def fingerprint(tokenPairs: DataFrame): DataFrame = {
    val hashed = tokenPairs.select(col("id"), Text.md5Long(col("key")).as("h"))
    val sums = (0 until Bits).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$i"))
    hashed.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until Bits).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _).as("simhash"))
  }

  /** SQL mirroring [[fingerprint]] over a `(id, key)` relation. */
  def fingerprintSql(tokenRel: String): String = {
    val terms = (0 until Bits).map(i =>
      s"(CASE WHEN sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT id, $terms AS simhash
       |FROM (SELECT id, ('0x'||substr(md5(key), 1, 15))::bigint AS h FROM ($tokenRel))
       |GROUP BY id""".stripMargin
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
