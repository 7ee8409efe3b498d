package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational skew diagnostics — the measurement you run BEFORE
  * choosing a salting factor, a hot-key cap, or a broadcast threshold
  * (every skew lever in this library — `maxBlockComparisons`,
  * `maxBucketSize`, `maxDocFreq`, AQE skew-join — starts from "how bad
  * is the key distribution actually?").
  */
object Diagnostics {

  /** One-row skew profile of `keyCol`'s distribution in `df`:
    *
    *   - `n_keys`, `total_rows` — distinct keys and total rows;
    *   - `max_key_rows`, `top1_share` — the heaviest key and its share
    *     of all rows (the broadcast-hot-partition hazard in one number);
    *   - `p50/p90/p99` — exact percentiles of the per-key row counts;
    *   - `skew_ratio` — p99/p50, the "how lopsided" headline: ~1 means
    *     uniform keys (salting buys nothing), ≫1 means the tail
    *     dominates (cap or salt before any key-partitioned join).
    *
    * Cost: one key-count aggregate (map-side combined) + one percentile
    * aggregate over the #keys-sized count table. The `percentile` here
    * is EXACT (single-reducer over #keys values) so the operator stays
    * DuckDB-oracle-checkable; at corpus scale swap in
    * `percentile_approx` — same output shape, bounded memory. */
  def keySkew(df: DataFrame, keyCol: String, scale: Int = 6): DataFrame =
    skewProfile(df, keyCol, scale,
      expr("percentile(_c, array(0.5, 0.9, 0.99))"))

  /** [[keySkew]] with `percentile_approx` percentiles — the corpus-scale
    * form promised there: the exact `percentile` is a single-reducer sort
    * over #keys values, while the approx sketch (Greenwald–Khanna) merges
    * map-side in bounded memory, so this variant survives a key table
    * that itself no longer fits one reducer. Rank error ≤ 1/`accuracy`;
    * at the default 10⁴ the percentiles are exact whenever #keys < 10⁴
    * (the `diag_token_skew_approx` oracle grades the bounded-error
    * contract explicitly). Same output shape as [[keySkew]]. */
  def keySkewApprox(df: DataFrame, keyCol: String, scale: Int = 6,
                    accuracy: Int = 10000): DataFrame =
    skewProfile(df, keyCol, scale,
      percentile_approx(col("_c"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)))

  private def skewProfile(df: DataFrame, keyCol: String, scale: Int,
                          percentiles: org.apache.spark.sql.Column): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("_c")).as("total_rows"),
        max(col("_c")).as("max_key_rows"),
        percentiles.as("_p"))
      .select(col("n_keys"), col("total_rows"), col("max_key_rows"),
        graft.functions.Num.stableRound(
          col("max_key_rows") / col("total_rows"), scale).as("top1_share"),
        graft.functions.Num.stableRound(col("_p").getItem(0), scale).as("p50"),
        graft.functions.Num.stableRound(col("_p").getItem(1), scale).as("p90"),
        graft.functions.Num.stableRound(col("_p").getItem(2), scale).as("p99"),
        graft.functions.Num.stableRound(
          col("_p").getItem(2) / col("_p").getItem(0), scale).as("skew_ratio"))
  }

  /** Per-key detail behind [[keySkew]]: the `topN` heaviest keys with
    * row counts and cumulative share — the list you actually salt or
    * cap. Deterministic ties on the key itself.
    *
    * The top-N itself is `orderBy.limit`, which Spark plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge — no
    * global sort shuffle); the rank/cumulative window then runs over
    * only the N surviving rows. */
  def heavyHitters(df: DataFrame, keyCol: String, topN: Int = 10,
                   scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("key_rows"))
    // sum over zero rows is NULL — coalesce so an empty input yields an
    // empty result instead of a ROW_VALUE_IS_NULL crash on getLong.
    val total =
      counts.agg(coalesce(sum(col("key_rows")), lit(0L))).head().getLong(0)
    if (total == 0L) {
      return counts.sparkSession.emptyDataFrame
        .select(lit(0).as("rank"), lit("").as("key"),
          lit(0L).as("key_rows"), lit(0.0).as("cum_share"))
        .limit(0)
    }
    val top = counts.orderBy(col("key_rows").desc, col("key").asc).limit(topN)
    val w = Window.orderBy(col("key_rows").desc, col("key").asc)
    top
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_share", graft.functions.Num.stableRound(
        sum(col("key_rows")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / lit(total.toDouble), scale))
      .select("rank", "key", "key_rows", "cum_share")
  }
}
