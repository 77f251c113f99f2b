package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal analytics whose naive forms don't scale: interval
  * concurrency (the quadratic interval self-join, done as a sweep)
  * and recency-decayed scoring (exact integer weights).
  */
object TemporalOps {

  private val HourUs = 3600L * 1000000L

  /** Peak session concurrency per hour — "how many vehicles/users were
    * active simultaneously" (reference: active-trips-in-window reading
    * of Part3's time-range queries). The naive plan is an interval
    * self-join (quadratic in overlapping sessions); this is the
    * sweep-line as a distributed plan: sessions → ±1 boundary events
    * (+1 at start, −1 at end+1µs, departures before arrivals at equal
    * timestamps), then a TWO-PHASE prefix sum — per-hour local running
    * sums off one hour-bucket exchange, plus a one-row-per-hour global
    * offset table (bounded by the time range, never by data volume;
    * same shape as `seq_pack`).
    *
    * Peak per hour accounts for the FULL hour, not just its
    * boundaries: the carry-in plateau before the hour's first boundary
    * counts (unless that boundary sits exactly on the hour start, when
    * the plateau has zero width), and hours with NO boundaries at all
    * — a session spanning them end to end — are emitted with the
    * carried concurrency and n_boundaries = 0 (generated per gap from
    * the bounded offsets table, the spine-free backfill shape).
    * Boundary-free hours with nothing active are omitted. Everything
    * is integer arithmetic on an exactly tie-broken ROWS window, so
    * the result is layout-independent and hash-matches the SQL twin. */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    val sess = Analytics.sessionsCore(spark, dir)
      .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"))
    val bounds = sess
      .select(col("start_us").as("t_us"), lit(1L).as("delta"),
        col("user_id"), col("session_id"))
      .unionByName(sess.select((col("end_us") + 1L).as("t_us"),
        lit(-1L).as("delta"), col("user_id"), col("session_id")))
      .withColumn("hour", expr(s"t_us div $HourUs"))
    // phase 1: local running concurrency within each hour bucket,
    // reduced to one row per hour BEFORE any join (max prefix, first
    // boundary instant, boundary count)
    val byHour = Window.partitionBy("hour")
      .orderBy(col("t_us"), col("delta"), col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourPeaks = bounds.withColumn("local_run", sum("delta").over(byHour))
      .groupBy("hour")
      .agg(max("local_run").as("mlr"), min("t_us").as("t0"),
        count(lit(1)).as("n_boundaries"))
    // phase 2: one row per hour → carry-in of all prior hours + the
    // next observed hour (for gap generation)
    val byBucket = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bounds.groupBy("hour")
      .agg(sum("delta").as("hour_total"))
      .withColumn("carry_in", coalesce(sum("hour_total").over(byBucket), lit(0L)))
      .withColumn("next_hour", lead("hour", 1).over(Window.orderBy("hour")))
    // boundary hours: the carry plateau [hour start, first boundary)
    // is attained only if the first boundary is strictly inside the
    // hour — otherwise the hour's values are exactly the prefixes
    val boundaryHours = hourPeaks.join(broadcast(offsets), Seq("hour"))
      .select(col("hour"),
        (col("carry_in") + when(col("t0") > col("hour") * HourUs,
          greatest(col("mlr"), lit(0L))).otherwise(col("mlr"))).as("max_concurrent"),
        col("n_boundaries"))
    // boundary-free hours: constant concurrency = carry out of the
    // last observed hour before the gap; emitted only while nonzero
    val gapHours = offsets
      .filter(col("next_hour") > col("hour") + 1 &&
        col("carry_in") + col("hour_total") > 0)
      .select(explode(sequence(col("hour") + 1, col("next_hour") - 1)).as("hour"),
        (col("carry_in") + col("hour_total")).as("max_concurrent"),
        lit(0L).as("n_boundaries"))
    boundaryHours.unionByName(gapHours)
      .select((col("hour") * HourUs).as("hour_us"),
        col("max_concurrent"), col("n_boundaries"))
      .orderBy("hour_us")
  }

  /** Recency-decayed engagement score: each user's last 5 events
    * weighted 16/8/4/2/1 by recency rank — the time-decay scoring
    * behind "active user" metrics, kept EXACT by using halving integer
    * weights on integer cents instead of float exp() decay (IEEE pow
    * reproduces nowhere). One user_id exchange: rank window + filter +
    * aggregation all share it. */
  def decayedScore(spark: SparkSession, dir: String): DataFrame = {
    val byRecency = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        Analytics.cents(col("value")).as("value_cents"))
      .withColumn("rn", row_number().over(byRecency).cast("long"))
      .filter(col("rn") <= 5)
      .withColumn("weight", expr("shiftleft(1, CAST(5 - rn AS INT))").cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_recent"),
        sum(col("weight") * col("value_cents")).as("decayed_cents"))
      .orderBy("user_id")
  }

  /** Gaps-and-islands interval coalescing: every event opens a 10-min
    * activity interval [ts, ts+10min]; overlapping or touching
    * intervals per user merge into maximal "activity islands"
    * (interval union — the classic coverage/merge operator, distinct
    * from `sessionize`'s gap-split which keys on inter-event deltas).
    * An island break is `start > running-max(end) of all previous
    * intervals`; the running max, the island counter (a running sum of
    * break flags), and the per-island aggregation all ride ONE user_id
    * hash exchange — no interval self-join anywhere, so per-user cost
    * is sort + linear scan at any scale. Integer-exact micros. */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val SpanUs = 600L * 1000000L
    val byTs = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val prevMax = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("iv_end", col("ts_us") + SpanUs)
      .withColumn("new_island",
        when(col("ts_us") > max("iv_end").over(prevMax), 1L)
          .when(max("iv_end").over(prevMax).isNull, 1L).otherwise(0L))
      .withColumn("island_id", sum("new_island").over(byTs))
      .groupBy("user_id", "island_id")
      .agg(min("ts_us").as("start_us"), max("iv_end").as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("span_s", expr("(end_us - start_us) div 1000000"))
      .select("user_id", "island_id", "start_us", "end_us", "n_events", "span_s")
      .orderBy("user_id", "island_id")
  }

  /** Time-grid regularization with linear interpolation: each user's
    * irregular event stream becomes a dense hourly series — observed
    * hours carry the hour's mean value, missing hours interpolate
    * linearly between the nearest observed neighbors (the resampling
    * step before any fixed-step model: forecasting, FFT, change
    * detection).
    *
    * Scale shape: the hourly rollup is one map-side-combinable
    * aggregate; the per-user spine (`sequence` over [min,max] hour)
    * explodes to user×hours rows with NO join against a global
    * calendar; the neighbor lookup is two IGNORE-NULLS window scans on
    * the SAME user_id exchange the rollup already created — sort +
    * linear scan per user, no self-join, no spine table. Interior gaps
    * always have both neighbors by construction (the spine is bounded
    * by observed hours). */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    // BOTH neighbor scans are RUNNING frames (unbounded-preceding →
    // current): the forward pass rides a descending sort instead of an
    // unbounded-FOLLOWING frame, which Spark's WindowExec evaluates by
    // re-scanning the partition tail per row — O(rows²) per key, 79 s
    // on the 1M-row sf0.1 grid vs ~3 s for the two linear passes. Same
    // user_id exchange either way; the extra sort is the cheap part.
    val back = Window.partitionBy("user_id").orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy("user_id").orderBy(col("hour_us").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // INTEGER arithmetic end-to-end: the hour mean is (cents sum, count)
    // and the interpolated value is emitted as exact micro-units via a
    // common-denominator rational — v = [pc·nn·span + (nc·pn − pc·nn)·dh]
    // / (100·pn·nn·span), scaled by 1e6 with integral `div`. A float
    // pipeline here lands on exact binary ties (cent averages are
    // dyadic rationals) where engines' round() modes disagree; integers
    // are layout- and engine-reproducible. Hour offsets are in hours
    // (≤ 1e3), counts ≤ per-key-hour volume, cents ≤ 1e8 — every
    // intermediate stays far inside BIGINT until per-key-hour counts
    // reach ~1e6, where the same expressions move to DECIMAL(38,0).
    // value non-null too: otherwise an all-null hour desynchronizes
    // the (c, n) neighbor pair — last-ignoreNulls skips the null c but
    // picks up that hour's n, corrupting the interpolated mean
    // UNPINNED (r12 — reverts the r11 lazy localCheckpoint on the
    // hourly rollup, which feeds both the per-user spine aggregate and
    // the join's right side). The pin was measured SLOWER at BOTH
    // probed scales: driver sf0.1 3.38 → 6.56 s (two independent
    // runs), and the r12 sf10 A/B read 33.2 s unpinned vs 72.3 s
    // pinned (3-pass medians) — serializing the user×hour rollup to
    // block storage and reading it twice costs more than re-running a
    // pushdown parquet scan + map-side-combinable aggregate, at 2 MB
    // and at 200 MB alike. The duplicate subtree is the measured
    // winner; evidence in OPTIMIZATION_r12.md.
    val hourly = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"),
        count(lit(1)).as("n"))
    val spine = hourly.groupBy("user_id")
      .agg(min("hour_us").as("h0"), max("hour_us").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(3600000000L))).as("hour_us"))
    val obsHour = when(col("c").isNotNull, col("hour_us"))
    spine.join(hourly, Seq("user_id", "hour_us"), "left")
      .withColumn("pc", last("c", ignoreNulls = true).over(back))
      .withColumn("pn", last("n", ignoreNulls = true).over(back))
      .withColumn("ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("nc", last("c", ignoreNulls = true).over(fwd))
      .withColumn("nn", last("n", ignoreNulls = true).over(fwd))
      .withColumn("nh", last(obsHour, ignoreNulls = true).over(fwd))
      .withColumn("dh", expr("(hour_us - ph) div 3600000000"))
      .withColumn("span", expr("(nh - ph) div 3600000000"))
      .withColumn("value_uv",
        when(col("c").isNotNull, expr("c * 10000 div n"))
          .otherwise(expr(
            "(pc*nn*span + (nc*pn - pc*nn)*dh) * 10000 div (pn*nn*span)")))
      .withColumn("interpolated", col("c").isNull)
      .select("user_id", "hour_us", "value_uv", "interpolated")
      .orderBy("user_id", "hour_us")
  }
}
