package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Batch event-log analytics: ordered funnels, cohort retention, exact
  * per-group quantiles. These are the product-analytics counterparts of
  * the streaming operators in [[graft.streaming.StreamingOps]] — pure
  * declarative plans (keyed joins + partial aggregations only), no
  * windows over unpartitioned data, no driver collects.
  */
object EventAnalytics {

  /** Ordered funnel over an event log: for each stage i, the users who
    * reached stage i — i.e. performed `stages(i)` strictly after their
    * stage-(i−1) time and within `horizonSec` of their stage-0 entry.
    * Stage times are the EARLIEST qualifying occurrence (min-time
    * semantics, so the result is deterministic and a user converts iff
    * any qualifying path exists — the standard product-analytics
    * "first touch" funnel).
    *
    * Output: one row per stage — (stage int, event_type, users bigint).
    *
    * Scale shape: stage i is one equi-join keyed on the user column
    * between the (monotonically shrinking) converted-user set and the
    * type-filtered event scan, followed by a partial-agg min — all
    * shuffles are keyed by user, so a hot event type cannot skew a
    * global key, and the per-stage state is one timestamp per surviving
    * user. The final per-stage counts are output-sized aggregates.
    * Timestamps are compared in integer micros end-to-end (no double
    * rounding at second boundaries).
    */
  def funnel(events: DataFrame, stages: Seq[String], horizonSec: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val us = unix_micros(col(tsCol))
    val horizonUs = horizonSec * 1000000L

    // stage 1: first entry per user
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(us).as("t0"))
      .withColumn("t_prev", col("t0"))

    var counts = Seq(
      reached.agg(count(lit(1)).as("users"))
        .select(lit(1).as("stage"), lit(stages.head).as("event_type"),
          col("users")))

    for (i <- 1 until stages.size) {
      reached = events.filter(col(typeCol) === stages(i))
        .select(col(userCol), us.as("u"))
        .join(reached, Seq(userCol))
        .filter(col("u") > col("t_prev") &&
          col("u") <= col("t0") + lit(horizonUs))
        // t0 is functionally dependent on the user key; grouping by both
        // keeps it available without a re-join and does not change
        // cardinality.
        .groupBy(col(userCol), col("t0"))
        .agg(min(col("u")).as("t_prev"))
      counts = counts :+ reached.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("event_type"),
          col("users"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** Cohort retention: users grouped by the calendar day of their first
    * event (the cohort), counted on each later day-offset they were
    * active. Output: (cohort_day 'yyyy-MM-dd' string, day_offset int,
    * users bigint) for offsets 0..maxOffsetDays.
    *
    * Scale shape: first-touch is a partial-agg min keyed by user; the
    * activity set is a (user, day) distinct — keyed by user so the
    * shuffle partitioner can reuse the first-touch partitioning; the
    * cohort×offset rollup is output-sized (days × offsets). The cohort
    * day is emitted as a string so both engines hash the same rendering.
    */
  def retention(events: DataFrame, maxOffsetDays: Int,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(firsts, Seq(userCol))
      .withColumn("day_offset", datediff(col("day"), col("cohort")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("int").as("day_offset"), col("users"))
  }

  /** Exact linear-interpolated quantiles of a value column per group:
    * count plus p25/p50/p90/p99, rounded engine-stably to 4 decimals.
    *
    * Built on Spark's exact `percentile` aggregate, which holds a
    * value→count map per group — right for the oracle gate and fine
    * whenever per-group distinct cardinality is bounded; at 100-TB scale
    * with unbounded distinct values swap in `percentile_approx`
    * (t-digest, mergeable, bounded memory) — same call shape, no longer
    * bit-comparable to an exact oracle. Both engines interpolate at rank
    * q·(n−1) over the sorted values, so the doubles agree to an ulp and
    * the stable rounding makes them hash-identical.
    */
  def valueQuantiles(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    def q(p: Double, name: String): Column =
      Num.stableRound(percentile(col(valueCol), lit(p)), 4).as(name)
    events.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        q(0.25, "p25"), q(0.50, "p50"), q(0.90, "p90"), q(0.99, "p99"))
  }
}
