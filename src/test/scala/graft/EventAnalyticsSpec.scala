package graft

import org.apache.spark.sql.functions._
import graft.events.EventAnalytics

/** Hand-case coverage for the batch event-analytics operators (funnel,
  * retention, exact quantiles). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def evts(rows: Seq[(Long, String, Long)]) =
    rows.toDF("user_id", "event_type", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")

  test("funnel: first-touch ordering, horizon cut, missing-entry users") {
    val day = 86400L
    val df = evts(Seq(
      // u1 converts all three stages in order
      (1L, "signup", 1000L), (1L, "view", 1010L), (1L, "purchase", 1020L),
      // u2: purchase BEFORE its first view → stops at stage 2
      (2L, "signup", 1000L), (2L, "purchase", 1005L), (2L, "view", 1010L),
      // u3 never signs up → not in the funnel at all
      (3L, "view", 1000L), (3L, "purchase", 1001L),
      // u4: view lands beyond the 7-day horizon from signup
      (4L, "signup", 1000L), (4L, "view", 1000L + 8 * day),
      // u5: only activity before its signup
      (5L, "view", 900L), (5L, "signup", 1000L)))
    val got = EventAnalytics.funnel(df, Seq("signup", "view", "purchase"),
        horizonSec = 7 * day)
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1, "signup", 4L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel: strict after — same-timestamp stage event does not count") {
    val df = evts(Seq(
      (1L, "signup", 1000L), (1L, "view", 1000L), // simultaneous: no
      (2L, "signup", 1000L), (2L, "view", 1001L)))
    val got = EventAnalytics.funnel(df, Seq("signup", "view"), 86400L)
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L), (2, 1L)))
  }

  test("funnel: repeated stage types match positionally") {
    // view → purchase → view: the SECOND view occurrence must be
    // reachable (a first-match stage index would leave stage 3 at 0)
    val df = evts(Seq(
      (1L, "view", 1000L), (1L, "purchase", 1010L), (1L, "view", 1020L),
      (2L, "view", 1000L), (2L, "purchase", 1010L)))
    val got = EventAnalytics.funnel(df, Seq("view", "purchase", "view"), 86400L)
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1, "view", 2L), (2, "purchase", 2L), (3, "view", 1L)), got.toSeq.toString)
  }

  test("madOutliers: robust to the outlier itself; constant groups score none") {
    import spark.implicits._
    // group a: 9 values near 10 plus one wild outlier — mean/std z would
    // be dragged by the outlier; median/MAD flags exactly it
    val a = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.2, 10.5, 10.8, 11.0, 1000.0)
    val b = Seq(5.0, 5.0, 5.0, 5.0) // constant: MAD 0 → no outliers
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("event_type", "value")
    val got = graft.events.EventAnalytics.madOutliers(df)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(4)))
    assert(got(0) == ("a", 10L, 10.1, 1L), got(0).toString)
    assert(got(1) == ("b", 4L, 5.0, 0L), got(1).toString)
  }

  test("retention: cohort day from first event, distinct days, offset cap") {
    val day = 86400L
    val jan1 = 1704067200L // 2024-01-01 00:00:00 UTC
    val df = evts(Seq(
      // u1: cohort Jan 1, active days 0, 1, 3 and one far day (offset 40)
      (1L, "view", jan1 + 10), (1L, "view", jan1 + 20), // same day: 1 row
      (1L, "view", jan1 + day + 5), (1L, "view", jan1 + 3 * day + 5),
      (1L, "view", jan1 + 40 * day),
      // u2: cohort Jan 1, active days 0, 1
      (2L, "view", jan1 + 99), (2L, "view", jan1 + day + 1),
      // u3: cohort Jan 2, active day 0 only
      (3L, "view", jan1 + day + 7)))
    val got = EventAnalytics.retention(df, maxOffsetDays = 30)
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 2L), ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("zOrder16 matches a reference bit-interleave") {
    def ref(a: Int, b: Int): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1).toLong << (2 * i)
        z |= ((b >> i) & 1).toLong << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0, 0), (3, 5), (65535, 0), (0, 65535), (12345, 54321),
      (65535, 65535), (1, 2))
    val df = cases.toDF("a", "b")
      .select(graft.functions.Num.zOrder16(col("a"), col("b")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
  }

  test("rollingZScore: hand-computed window stats, warm-up cut, self-exclusion") {
    val rows = (1 to 15).map(i => (1L, 1000L + i, i.toLong, i.toDouble))
    val df = rows.toDF("user_id", "sec", "event_id", "value")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val got = graft.events.EventAnalytics.rollingZScore(df)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // first scored event is #11 (10 predecessors); prev = 1..10 →
    // mean 5.5, sd = sqrt(82.5/9); z = (11 − 5.5)/sd
    assert(got.head._1 == 11L && got.head._2 == 10L)
    val sd = math.sqrt(82.5 / 9)
    val expect = math.floor((11 - 5.5) / sd * 1e4 + 0.5) / 1e4
    assert(got.head._3 == expect)
    assert(got.length == 5, "events 11..15 scored, 1..10 are warm-up")
  }

  test("zOrderStats: buckets cover small spans in BOTH dimensions") {
    val jan1 = 1704067200L
    val rows = for (u <- 0 until 64; h <- 0 until 64)
      yield (u.toLong, jan1 + h * 3600L)
    val df = rows.toDF("user_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val got = graft.events.EventAnalytics.zOrderStats(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 64, "top-6-bit buckets over a full 64×64 grid")
    // each bucket must be local in BOTH dimensions: 1/8 of the users AND
    // 1/8 of the hour range (the z-order guarantee a 1-D sort cannot give)
    assert(got.forall(_._3 <= 8), "≤ 1/8 of users per bucket")
    assert(got.forall(_._4 <= 8), "≤ 1/8 of the hour range per bucket")
  }

  test("markovTransitions: per-user sequences, counts, row-normalized p") {
    val df = Seq(
      // u1: a → b → a → b ; u2: a → a
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (1L, "b", 40L, 4L),
      (2L, "a", 10L, 5L), (2L, "a", 20L, 6L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val got = graft.events.EventAnalytics.markovTransitions(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // from a: a→b twice (u1), a→a once (u2) → p = 2/3, 1/3
    assert(got(("a", "b")) == ((2L, math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6)))
    assert(got(("a", "a")) == ((1L, math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6)))
    // from b: only b→a once (u1, crossing its own boundary) → p = 1.0
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3, "no cross-user transitions")
  }

  test("HLL: daily partial sketches union-merge to the whole-stream estimate") {
    val rows = for (d <- 1 to 5; u <- 1 to (20 * d)) yield (s"day$d", u.toLong)
    val df = rows.toDF("day", "uid")
    val viaDaily = df.groupBy("day").agg(hll_sketch_agg(col("uid")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("uid"))))
      .collect()(0).getLong(0)
    assert(viaDaily == direct, "sketch merge must be lossless vs one-shot")
    // 100 distinct uids; default lgK sketches are near-exact at this size
    assert(math.abs(viaDaily - 100L) <= 5)
  }

  test("lshTuningCurve: S-curve values and shape") {
    val curve = graft.functions.MinHash.lshTuningCurve(
        spark, Seq((4, 4), (1, 16)))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getInt(2),
        r.getDouble(3)))
    // b=1, r=16 → p = s^16 exactly
    curve.filter(_._2 == 1).foreach { case (s, _, r, p) =>
      assert(math.abs(p - math.floor(math.pow(s, 16) * 1e6 + 0.5) / 1e6) < 1e-9)
    }
    // monotone non-decreasing in s for fixed (b, r)
    val p44 = curve.filter(_._2 == 4).sortBy(_._1).map(_._4)
    assert(p44.zip(p44.tail).forall { case (a, b) => a <= b })
  }

  test("zOrderWrite: per-file bounding boxes beat a time-sorted layout") {
    val jan1 = 1704067200L
    val rows = for (u <- 0 until 64; h <- 0 until 64)
      yield (u.toLong, jan1 + h * 3600L)
    val df = rows.toDF("user_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val zDir = s"/tmp/graft-test-zorder-${System.nanoTime()}"
    val tDir = s"/tmp/graft-test-tsorder-${System.nanoTime()}"
    graft.events.EventAnalytics.zOrderWrite(df, zDir, partitions = 16)
    df.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .write.parquet(tDir)
    def avgBoxArea(dir: String): Double = {
      val spans = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
        .groupBy("f")
        .agg(((max(col("user_id")) - min(col("user_id")) + 1) *
          (max(col("hr")) - min(col("hr")) + 1)).as("area"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length / (64.0 * 64.0)
    }
    val (zArea, tArea) = (avgBoxArea(zDir), avgBoxArea(tDir))
    // a time-sorted file spans ALL users (area ≈ 1/16 of hours × all
    // users = 1/16 … wait: ts-sorted files cover every user but 1/16 of
    // hours → area ≈ 1/16); z-order covers ≈1/16 in a ~square, also 1/16
    // by area but bounded in BOTH dims. The discriminating assert is the
    // per-dimension span, not the area product:
    val zSpans = spark.read.parquet(zDir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max(col("user_id")) - min(col("user_id"))).as("us"))
      .collect().map(_.getLong(1))
    assert(zSpans.forall(_ <= 32), s"z-order user span per file: ${zSpans.max}")
    val tSpans = spark.read.parquet(tDir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max(col("user_id")) - min(col("user_id"))).as("us"))
      .collect().map(_.getLong(1))
    assert(tSpans.forall(_ == 63), "time-sorted files span every user")
    assert(zArea <= tArea * 1.5, s"z $zArea vs t $tArea")
  }

  test("valueQuantiles: linear interpolation on a known grid") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0), ("b", 20.0))
      .toDF("event_type", "value")
    val got = EventAnalytics.valueQuantiles(df)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // a: ranks q·(n−1) over [1..5] → p25=2, p50=3, p90=4.6, p99=4.96
    assert(got(0) == (("a", 5L, 2.0, 3.0, 4.6, 4.96)))
    // b: two points → p = 10 + q·10
    assert(got(1) == (("b", 2L, 12.5, 15.0, 19.0, 19.9)))
  }
}
