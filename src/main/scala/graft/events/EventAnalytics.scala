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
    * Scale shape: TWO user-keyed shuffles, invariant in stage count — a
    * partial-agg min for the first-touch time, then one groupBy(user)
    * over the HORIZON-FILTERED stage-typed events, time-sorted
    * row-locally, with the greedy stage chain as a single `aggregate`
    * fold over the sorted array — the earliest qualifying event is
    * picked at each stage, which is exactly the min-time join chain
    * (fixed first-touch t0; a smaller t_prev only weakens later
    * constraints, so greedy is optimal). The per-user state is
    * (reached, t0, t_prev); the rollup to per-stage counts is
    * output-sized. A k-stage funnel previously cost k user-keyed joins
    * (k shuffles of the event scan, and O(k²) scans when the lineage
    * was re-evaluated per stage count). The horizon prefilter is what
    * bounds the per-user array: only events in [t0, t0 + horizon] can
    * participate, so a bot user with unbounded history contributes at
    * most its in-horizon events — no global key exists for an
    * event-type hotspot to skew. Stage lists may REPEAT a type
    * ("view", "purchase", "view"): the fold matches the event type
    * against stages(reached) positionally. Timestamps are compared in
    * integer micros end-to-end (no double rounding at second
    * boundaries).
    */
  def funnel(events: DataFrame, stages: Seq[String], horizonSec: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val k = stages.size
    val horizonUs = horizonSec * 1000000L
    val us = unix_micros(col(tsCol))
    val stagesArr = array(stages.map(lit): _*)
    // Horizon prefilter — this is what BOUNDS the per-user array below:
    // t0 (the first-touch time) is a partial-agg min, and only
    // stage-typed events inside [t0, t0 + horizon] can ever participate
    // in the chain, so a bot user with years of activity contributes at
    // most its in-horizon events to the collect_list. Users with no
    // stage-0 event drop here (they reach no stage).
    val firsts = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(us).as("t0"))
    // sorted (ts-micros, first-stage-index, type) triples per user;
    // struct sort is lexicographic, so timestamp ties process the
    // EARLIER stage first — and the strict `u > tp` guard below then
    // rejects the same-instant advance, matching the join formulation's
    // strict inequality. The event TYPE rides along so a stage list with
    // a REPEATED type ("view", "purchase", "view") matches positionally
    // against stages(r) — a first-match index alone cannot reach the
    // second occurrence.
    val stageIdx = stages.zipWithIndex.tail.foldLeft(
      when(col(typeCol) === stages.head, lit(0))) { case (w, (s, i)) =>
      w.when(col(typeCol) === s, lit(i))
    }
    val perUser = events.filter(col(typeCol).isin(stages.distinct.map(lit): _*))
      .select(col(userCol), us.as("u"), stageIdx.as("s"), col(typeCol).as("t"))
      .join(firsts, Seq(userCol))
      .filter(col("u") >= col("t0") && col("u") <= col("t0") + lit(horizonUs))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col("u"), col("s"), col("t")))).as("ev"))
    // greedy chain fold: r = stages completed, t0 = first-touch micros,
    // tp = previous stage's time. Advance when the event's TYPE equals
    // the next stage's type, strictly after tp and within the horizon.
    val init = struct(lit(0).as("r"), lit(0L).as("t0"), lit(0L).as("tp"))
    val reached = perUser.select(
      aggregate(col("ev"), init, (acc, e) => {
        val r = acc.getField("r"); val t0 = acc.getField("t0")
        val tp = acc.getField("tp")
        val u = e.getField("u"); val t = e.getField("t")
        when(r === 0 && t === lit(stages.head),
          struct(lit(1).as("r"), u.as("t0"), u.as("tp")))
          .when(r > 0 && r < k && t === element_at(stagesArr, r + 1) &&
              u > tp && u <= t0 + lit(horizonUs),
            struct((r + 1).as("r"), t0.as("t0"), u.as("tp")))
          .otherwise(acc)
      }).getField("r").as("r"))
    // per-stage counts: each user contributes to stages 1..r; emit every
    // stage row even at zero users (join-form parity).
    val cum = reached.filter(col("r") >= 1)
      .select(explode(sequence(lit(1), col("r"))).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("users"))
    val stageRows = array(stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage"), lit(s).as("event_type"))
    }: _*)
    events.sparkSession.range(1)
      .select(explode(stageRows).as("x")).select(col("x.*"))
      .join(cum, Seq("stage"), "left")
      .select(col("stage"), col("event_type"),
        coalesce(col("users"), lit(0L)).as("users"))
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

  /** Rolling z-score anomaly signal: each event's value standardized
    * against the mean/stddev of that user's previous `window` events
    * (strictly preceding — the frame ends at −1, so the score never
    * sees its own value). Events with fewer than `minPrev` predecessors
    * are omitted (warm-up); a zero stddev (constant history) scores 0.
    * Emitting the score for EVERY qualifying event rather than
    * thresholding keeps the row set integer-deterministic across
    * engines — the consumer applies its own |z| cut.
    *
    * Scale shape: one window partitioned BY USER ordered by (ts, id) —
    * per-key sort, bounded frame, no global ordering; the streaming
    * analog is a per-key ring buffer in mapGroupsWithState. */
  def rollingZScore(events: DataFrame, window: Int = 20, minPrev: Int = 10,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    events
      .withColumn("_n", count(col(valueCol)).over(w))
      .withColumn("_mean", avg(col(valueCol)).over(w))
      .withColumn("_sd", stddev_samp(col(valueCol)).over(w))
      .filter(col("_n") >= minPrev)
      .select(col(idCol), col(keyCol), col("_n").as("n_prev"),
        Num.stableRound(
          when(col("_sd") > 0, (col(valueCol) - col("_mean")) / col("_sd"))
            .otherwise(lit(0.0)), 4).as("z"))
  }

  /** Z-order (Morton) layout statistics: interleave the low 16 bits of
    * the user id with the event's epoch-hour index ([[Num.zOrder16]]),
    * bucket the 32-bit z-value by its top bits, and report per bucket
    * how many rows, distinct users, and what hour span it covers. Small
    * per-bucket spans in BOTH dimensions are the locality property that
    * makes ZORDER-clustered layouts prune on either predicate — at
    * scale the companion write path is `repartitionByRange(z)` before
    * the sink; this query is the measurement side. */
  def zOrderStats(events: DataFrame, bucketShift: Int = 26,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val hr = expr(s"unix_micros($tsCol) div 3600000000")
    val base = events.select(col(userCol).as("u"), hr.as("hr"))
    // Range-normalize each dimension to its full 16-bit span before
    // interleaving (integer arithmetic only — bit-identical in any
    // engine): raw ids/hours occupy a narrow sub-range, which would
    // leave the z-value's HIGH bits constant and collapse every row
    // into one bucket. This is what production ZORDER writers do too
    // (Delta range-partitions on the dimension's observed range).
    val bounds = base.agg(min(col("u")).as("ulo"), max(col("u")).as("uhi"),
      min(col("hr")).as("hlo"), max(col("hr")).as("hhi"))
    base.crossJoin(broadcast(bounds))
      .select(
        Num.zOrder16(
          expr("(u - ulo) * 65535 div greatest(uhi - ulo, 1)"),
          expr("(hr - hlo) * 65535 div greatest(hhi - hlo, 1)")).as("z"),
        col("u"), col("hr"))
      .groupBy(shiftright(col("z"), bucketShift).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("u")).as("users"),
        (max(col("hr")) - min(col("hr"))).as("hour_span"))
  }

  /** First-order Markov transition counts over each user's event-type
    * sequence in event-time order: (from_type, to_type, n, p) where p
    * is the row-normalized transition probability. The behavioral
    * fingerprint behind next-event prediction and bot detection.
    *
    * Scale shape: one lag window partitioned BY USER (per-key ordering
    * only), then a type-pair rollup — output is |types|² regardless of
    * corpus size. */
  def markovTransitions(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_type"))
    trans.withColumn("p",
      Num.stableRound(col("n") / sum(col("n")).over(totals), 6))
  }

  /** Z-order clustered write — the layout whose statistics
    * [[zOrderStats]] measures: range-normalize (user, hour) to 16 bits,
    * interleave, `repartitionByRange` on the z-value (one range
    * exchange — the same cost as any global sort-write), sort within
    * partitions, drop the helper column, write parquet. Every output
    * file then covers a small rectangle in BOTH dimensions, so parquet
    * row-group min/max stats prune reads for predicates on EITHER
    * column — the Delta/Iceberg OPTIMIZE ZORDER effect with nothing but
    * vanilla Spark operators. */
  def zOrderWrite(events: DataFrame, outDir: String, partitions: Int = 16,
      userCol: String = "user_id", tsCol: String = "ts"): Unit = {
    val hr = expr(s"unix_micros($tsCol) div 3600000000")
    val bounds = events.agg(
      min(col(userCol)).as("_ulo"), max(col(userCol)).as("_uhi"),
      min(hr).as("_hlo"), max(hr).as("_hhi"))
    events.crossJoin(broadcast(bounds))
      .withColumn("_hr", hr)
      .withColumn("_z", Num.zOrder16(
        expr(s"($userCol - _ulo) * 65535 div greatest(_uhi - _ulo, 1)"),
        expr("(_hr - _hlo) * 65535 div greatest(_hhi - _hlo, 1)")))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_ulo", "_uhi", "_hlo", "_hhi", "_hr", "_z")
      .write.mode("overwrite").parquet(outDir)
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

  /** Robust outlier report per group — median/MAD (median absolute
    * deviation), the heavy-tail-safe alternative to mean/stddev z-scores
    * (Iglewicz & Hoaglin 1993; the modified z-score M = 0.6745·(x −
    * med)/MAD with the standard |M| > 3.5 cut). Mean/stddev anomaly
    * scoring breaks exactly when it matters — the outliers drag the
    * mean; the median and MAD have 50% breakdown.
    *
    * Three passes by construction (MAD needs the median, the cut needs
    * the MAD): each is a per-group exact-percentile/count aggregate with
    * the group-count-sized result broadcast back — all keyed by the
    * group column, no global sort. A constant group (MAD = 0) reports 0
    * outliers rather than dividing by zero.
    *
    * Output: (groupCol, n, med, mad, n_outliers). */
  def madOutliers(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", cut: Double = 3.5): DataFrame = {
    val meds = events.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("_med"))
    val stats = events.join(broadcast(meds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("_med")).as("_med"),
        percentile(abs(col(valueCol) - col("_med")), lit(0.5)).as("_mad"))
    events.join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        Num.stableRound(first(col("_med")), 4).as("med"),
        Num.stableRound(first(col("_mad")), 4).as("mad"),
        sum(when(col("_mad") > 0 &&
            lit(0.6745) * abs(col(valueCol) - col("_med")) >
              lit(cut) * col("_mad"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
