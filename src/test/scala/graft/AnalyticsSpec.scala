package graft

import graft.analytics.Analytics
import graft.etl.EventsEtl
import org.apache.spark.sql.functions.{col, round}

class AnalyticsSpec extends SparkSpec {

  test("q1_agg groups by flag+status with positive exact-cents sums") {
    val rows = Analytics.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_base_price_cents") > 0)
      assert(r.getAs[Long]("sum_disc_price_cents") <= r.getAs[Long]("sum_base_price_cents"))
    }
  }

  test("trip view keeps every order (left join semantics)") {
    val orders = graft.sources.Tables.orders(spark, sfDir).count()
    val viewOrders = Analytics.tripView(spark, sfDir)
      .select("o_orderkey").distinct().count()
    assert(viewOrders == orders)
  }

  test("sessionize: session ids are dense per user and gaps respected") {
    val df = Analytics.sessionize(spark, sfDir)
    val perUser = df.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("session_id").as("max_s"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_s"))
      .collect()
    perUser.foreach(r => assert(r.getAs[Long]("max_s") == r.getAs[Long]("n_s")))
  }

  test("running agg is monotone per user for nonnegative values") {
    import org.apache.spark.sql.functions._
    val df = Analytics.runningAgg(spark, sfDir)
    val bad = df.join(graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us")), "event_id")
      .withColumn("prev", lag("running_cents", 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts_us")))
      .filter(col("prev").isNotNull && col("running_cents") < col("prev"))
      .count()
    assert(bad == 0)
  }

  test("speed derivation backfills group head and never goes negative") {
    val df = EventsEtl.deriveSpeed(spark, sfDir)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("speed") < 0).count() == 0)
    // every user's first event has a (backfilled) non-null speed
    assert(df.filter(col("speed").isNull).count() == 0)
  }

  test("clean + quarantine partition the input exactly") {
    val total = graft.sources.Tables.events(spark, sfDir).count()
    val clean = EventsEtl.cleanEvents(spark, sfDir).count()
    val quar = EventsEtl.quarantine(spark, sfDir).count()
    assert(clean + quar == total)
  }

  test("correlated avg: decorrelated predicate matches a per-row correlated check") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
    // independent formulation: per-part stats via a window, then the same rational predicate
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val expected = li
      .withColumn("s", sum("qty").over(w)).withColumn("c", count(lit(1)).over(w))
      .filter(lit(2) * col("qty") * col("c") < col("s")).count()
    val got = Analytics.correlatedAvg(spark, sfDir)
      .agg(sum("n_small_lots")).collect()(0).getLong(0)
    assert(got == expected && expected > 0)
  }

  test("nested semi join: every returned supplier has a >80-qty widget part") {
    import org.apache.spark.sql.functions._
    val out = Analytics.nestedSemiJoin(spark, sfDir).cache()
    val suppliers = out.select("s_suppkey").distinct().count()
    assert(out.count() == suppliers && suppliers > 0) // semi-join: no fan-out
    val heavyWidget = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.part(spark, sfDir)
        .filter(col("p_name").contains("widget")), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("q")).filter(col("q") > 80)
      .select(col("l_suppkey").as("s_suppkey")).distinct()
    assert(out.join(heavyWidget, Seq("s_suppkey"), "left_anti").count() == 0)
    out.unpersist()
  }

  test("funnel: step counts monotonically decrease and completers did all steps in order") {
    import org.apache.spark.sql.functions._
    val steps = Analytics.funnel(spark, sfDir).collect()
    assert(steps.length == 3)
    val ns = steps.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(0) > 0 && ns(2) > 0)
    // step-1 count is exactly the users with a 'view' event
    val viewers = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(ns(0) == viewers)
  }

  test("retention: day-0 cell covers every user exactly once per cohort") {
    import org.apache.spark.sql.functions._
    val out = Analytics.retention(spark, sfDir).cache()
    assert(out.filter(col("day_offset") < 0).count() == 0)
    val day0 = out.filter(col("day_offset") === 0)
      .agg(sum("n_active")).collect()(0).getLong(0)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(day0 == users) // everyone is active on their own cohort day
    out.unpersist()
  }

  test("zorder layout: every curve bucket bounds BOTH dimensions to a 2^11 slab") {
    import org.apache.spark.sql.functions._
    val out = Analytics.zorderLayout(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_zx") - r.getAs[Long]("min_zx") < 2048L)
      assert(r.getAs[Long]("max_zy") - r.getAs[Long]("min_zy") < 2048L)
    }
    // profile covers every timestamped row exactly once
    val total = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) == total)
    out.unpersist()
  }

  test("streaks: longest streak bounded by active days and islands are consecutive") {
    import org.apache.spark.sql.functions._
    val out = Analytics.activityStreaks(spark, sfDir).cache()
    assert(out.filter(col("longest_streak") > col("n_active_days")).count() == 0)
    assert(out.filter(col("longest_streak") < 1).count() == 0)
    // user count matches the events table
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(out.count() == users)
    out.unpersist()
  }

  test("two-phase bucketed global rank reproduces rank() tie-and-gap semantics exactly") {
    val got = graft.analytics.Analytics.globalRank(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("price_cents"),
        r.getAs[Long]("global_rank"))).toSeq
    // sequential reference: rank = 1 + #rows strictly greater
    val base = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("vc")).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("vc")))
    val sorted = base.sortBy { case (k, v) => (-v, k) }
    val rankOf = scala.collection.mutable.Map[Long, Long]()
    sorted.zipWithIndex.foreach { case ((_, v), i) =>
      if (!rankOf.contains(v)) rankOf(v) = i + 1L
    }
    val want = sorted.map { case (k, v) => (k, v, rankOf(v)) }.toSeq
    assert(got.size == want.size)
    assert(got == want, "bucketed global rank diverged from the full-order reference")
  }

  test("two-phase RFM quintiles are row-identical to the global ntile window") {
    val tp = Analytics.rfmSegmentation(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rfm_cell"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toSeq
    val win = Analytics.rfmNtileWindow(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rfm_cell"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toSeq
    assert(tp.nonEmpty && tp == win,
      "bucketed two-phase ntile diverged from the window formulation")
  }

  test("forecast backtest: WAPE bounded, self-forecast scores zero error") {
    import org.apache.spark.sql.functions._
    val out = Analytics.forecastEval(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cells") > 0)
      assert(r.getAs[Long]("abs_err_cents") >= 0)
      assert(r.getAs[Long]("wape_ppm") >= 0)
    }
    // sanity of the alignment: a 0-day shift (self-forecast) has zero
    // error by construction — recompute with the same rollup
    val hourly = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"), hour(col("ts")).as("h"))
      .agg(sum(round(col("value") * 100).cast("long")).as("a"))
    val self = hourly.alias("x").join(hourly.alias("y"), Seq("event_type", "d", "h"))
      .agg(sum(abs(col("x.a") - col("y.a")))).collect()(0).getLong(0)
    assert(self == 0L)
  }

  test("robust anomalies match a sequential median/MAD reference exactly") {
    import org.apache.spark.sql.functions._
    val got = Analytics.robustAnomalies(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("vc"),
        r.getAs[Double]("med"), r.getAs[Double]("mad"))).toSet
    // sequential reference: interpolated median = avg of middle two
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val rows = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("vc")))
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      val med = median(g.map(_._3.toDouble).toSeq)
      val mad = median(g.map(t => math.abs(t._3 - med)).toSeq)
      g.filter(t => math.abs(t._3 - med) > 5.0 * mad)
        .map(t => (t._1, t._3, med, mad)).toSeq
    }.toSet
    assert(got == want, "anomaly set diverged from the sequential reference")
    assert(want.nonEmpty, "testdata should contain at least one >5-MAD outlier")
  }

  test("heatmap grid: cells bounded by the grid and counts cover the filtered scan") {
    import org.apache.spark.sql.functions._
    val out = Analytics.heatmapGrid(spark, sfDir).cache()
    assert(out.count() <= 240) // 10 value deciles x 24 hours, data-size independent
    out.collect().foreach { r =>
      val b = r.getAs[Long]("value_bucket"); val h = r.getAs[Long]("hour_of_day")
      assert(b >= 0 && b <= 9 && h >= 0 && h <= 23)
      assert(r.getAs[Long]("n") > 0)
    }
    val expected = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("value") >= 0 && col("value") < 1000)
      .count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) == expected)
    out.unpersist()
  }

  test("trace downsample keeps endpoints, every 10th point, and dense kept ranks") {
    import org.apache.spark.sql.functions._
    val out = Analytics.traceDownsample(spark, sfDir).cache()
    // independent reference: recompute the kept set with a window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val ref = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("seq", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("seq") % 10 === 1 || col("seq") === col("n"))
      .select("user_id", "event_id").cache()
    assert(out.count() == ref.count())
    assert(out.join(ref, Seq("user_id", "event_id"), "left_anti").count() == 0)
    // kept_rank is dense 1..k per user and the FIRST point of every trace survives
    val perUser = out.groupBy("user_id")
      .agg(min("kept_rank").as("lo"), max("kept_rank").as("hi"),
        count(lit(1)).as("k")).collect()
    perUser.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("k"))
    }
    // every user with events appears (first+last always kept)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(perUser.length.toLong == users)
    out.unpersist(); ref.unpersist()
  }

  test("clamped balance closed form equals the sequential max(0, b+d) recurrence") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        (expr("CAST(round(value * 100) AS BIGINT)") - 5000L).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, g) =>
      var b = 0L; var peak = Long.MinValue; var hits = 0L
      g.sortBy(x => (x._2, x._3)).foreach { case (_, _, _, d) =>
        b = math.max(0L, b + d) // the REAL recurrence, not the closed form
        peak = math.max(peak, b)
        if (b == 0) hits += 1
      }
      (u, g.size.toLong, b, peak, hits)
    }
    val got = Analytics.clampedBalance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // the floor actually engages somewhere (non-degenerate contract)
    assert(got.exists(_._5 > 0))
  }

  test("bootstrap replicates equal the sequential hash-weighted resample") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def weight(id: Long, b: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$b".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 1000000L
      if (u < 367879) 0 else if (u < 735759) 1 else if (u < 919699) 2
      else if (u < 981012) 3 else if (u < 996340) 4 else 5
    }
    val exp = (0L until Analytics.BootstrapReps.toLong).map { b =>
      var n = 0L; var s = 0L
      ev.foreach { case (id, v) => val w = weight(id, b); n += w; s += w * v }
      (b, n, s, s / n)
    }
    val got = Analytics.bootstrap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // replicate means vary (the resample is real) but stay in-range
    assert(got.map(_._4).distinct.length > 1)
  }

  test("ts cv folds are leakage-free, gap-purged, and count-exact") {
    import org.apache.spark.sql.functions._
    val ts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull).select(unix_micros(col("ts")).as("t"))
      .collect().map(_.getLong(0))
    val t0 = ts.min; val slice = (ts.max - t0) / 6
    val exp = (1L to Analytics.CvFolds).map { k =>
      val trainEnd = t0 + k * slice
      val valStart = trainEnd + Analytics.CvGapUs
      val valEnd = t0 + (k + 1) * slice
      (k, trainEnd, valStart, valEnd,
        ts.count(_ < trainEnd).toLong,
        ts.count(t => t >= valStart && t < valEnd).toLong)
    }
    val got = Analytics.tsCvFolds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    got.foreach { case (_, trainEnd, valStart, valEnd, nTrain, nVal) =>
      assert(valStart - trainEnd == Analytics.CvGapUs) // purge gap enforced
      assert(valStart <= valEnd && nTrain > 0 && nVal > 0)
    }
    // expanding windows: each fold trains on at least as much data
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted)
  }

  test("value share matches the sequential global-total threshold") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1)) * (100 - r.getLong(2))))
    val perPart = li.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val tot = perPart.values.sum
    val np = perPart.size
    val exp = perPart.toSeq.filter { case (_, v) => v * np * 2 > tot * 3 }
      .map { case (k, v) => (k, v.toLong, (v * 1000000 / tot).toLong) }
      .sortBy(x => (-x._2, x._1))
    val got = Analytics.valueShare(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty) // the threshold actually selects something
  }

  test("late blame equals the sequential exists/not-exists evaluation") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val pairs = rows.groupBy(x => (x._1, x._2))
      .map { case ((ok, sk), g) => (ok, sk, g.exists(_._3)) }.toSeq
    val byOrder = pairs.groupBy(_._1)
    val blamed = pairs.filter(_._3).filter { case (ok, sk, _) =>
      val others = byOrder(ok).filter(_._2 != sk)
      others.nonEmpty && !others.exists(_._3) // EXISTS other, NOT EXISTS other-late
    }
    val exp = blamed.groupBy(_._2).map { case (sk, g) => sk -> g.size.toLong }
    val got = Analytics.lateBlame(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // the query reports the top-20 slice of exactly this map
    assert(got.toSeq == exp.toSeq.sortBy(x => (-x._2, x._1)).take(20))
    assert(got.nonEmpty)
  }

  test("dormant rich equals the sequential avg-threshold anti join") {
    import org.apache.spark.sql.functions._
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("b"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue, r.getLong(2)))
    val withOrders = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pos = cust.filter(_._3 > 0)
    val avg = pos.map(_._3).sum / pos.length
    val exp = cust.filter(c => c._3 > avg && !withOrders.contains(c._1))
      .groupBy(_._2).toSeq
      .map { case (n, g) => (n, g.size.toLong, g.map(_._3).sum) }
      .sortBy(_._1)
    val got = Analytics.dormantRich(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  private def seqSessions(evs: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    // (user, ts_us, event_id) -> (user, s_us, e_us) under the 30-min gap
    val GapUs = 30L * 60 * 1000000
    evs.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val sorted = g.map(x => (x._2, x._3)).sortBy(identity)
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for ((ts, _) <- sorted) {
        if (sessions.nonEmpty && ts - sessions.last._2 <= GapUs)
          sessions(sessions.length - 1) = (sessions.last._1, ts)
        else sessions += ((ts, ts))
      }
      sessions.map { case (s, e) => (u, s, e) }
    }
  }

  test("bucketed overlap join equals the all-pairs sequential interval join") {
    import org.apache.spark.sql.functions._
    def evs(t: String) = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("event_type") === t)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val Pad = 3600L * 1000000
    val clicks = seqSessions(evs("click").toSeq)
    val errors = seqSessions(evs("error").toSeq).groupBy(_._1)
    val exp = clicks.flatMap { case (u, as, ae) =>
      errors.getOrElse(u, Nil)
        .filter { case (_, bs, be) => as - Pad <= be && bs <= ae + Pad }
        .map { case (_, bs, be) =>
          (u, as, ae, bs, be, math.min(ae + Pad, be) - math.max(as - Pad, bs))
        }
    }.sortBy(x => (x._1, x._2, x._4))
    val got = Analytics.overlapJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // exact recall AND exactly-once emission (the canonical-bucket dedup)
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("twap equals the sequential hold-until-next weighting") {
    import org.apache.spark.sql.functions._
    val HourUs = 3600L * 1000000
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, g) =>
      val s = g.sortBy(x => (x._2, x._3))
      var num = BigInt(0); var den = 0L
      for (i <- s.indices) {
        val w = if (i + 1 < s.length) math.min(s(i + 1)._2 - s(i)._2, HourUs) else HourUs
        num += BigInt(s(i)._4) * w; den += w
      }
      (u, s.length.toLong, den, (num / den).toLong)
    }
    val got = Analytics.twap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
  }

  test("hhi equals the sequential share-squared sum") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("s_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        BigInt(r.getLong(2)) * (100 - r.getLong(3))))
    val exp = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (n, g) =>
      val perSupp = g.groupBy(_._2).values.map(_.map(_._3).sum).toSeq
      val tot = perSupp.sum
      (n, perSupp.size.toLong,
        (perSupp.map(v => v * v).sum * 1000000 / (tot * tot)).toLong)
    }
    val got = Analytics.hhi(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp)
    // sanity: HHI of a perfectly even 1/n split is 1e6/n — everything
    // real sits strictly between that floor and monopoly
    got.foreach { case (_, n, h) => assert(h >= 1000000 / n && h <= 1000000) }
  }

  test("cohort ltv equals the sequential cohort accumulation") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val cohortDay = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val sizes = cohortDay.values.groupBy(_ / 7).map { case (w, g) => w -> g.size.toLong }
    val rev = ev.filter(e => e._3 == "purchase" && e._4.isDefined)
      .groupBy(e => (cohortDay(e._1) / 7, (e._2 - cohortDay(e._1)) / 7))
      .map { case (k, g) => (k._1, k._2, g.flatMap(_._4).sum) }
      .toSeq.sortBy(x => (x._1, x._2))
    var exp = Seq.empty[(Long, Long, Long, Long, Long, Long)]
    rev.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (cw, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, aw, r) =>
        cum += r
        exp = exp :+ ((cw, aw, sizes(cw), r, cum, cum / sizes(cw)))
      }
    }
    val got = Analytics.cohortLtv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
    // per-capita LTV is cumulative: non-decreasing within a cohort
    got.groupBy(_._1).foreach { case (_, rows) =>
      val l = rows.sortBy(_._2).map(_._5).toSeq
      assert(l == l.sorted)
    }
  }

  test("min-cost supplier equals the sequential correlated-min over offers") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val offers = li.groupBy(x => (x._1, x._2))
      .map { case (k, g) => (k._1, k._2, g.map(_._3).min) }.toSeq
    val best = offers.groupBy(_._1).map { case (p, g) => p -> g.map(_._3).min }
    val parts = graft.sources.Tables.part(spark, sfDir)
      .filter(col("p_size") <= 14).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val supp = graft.sources.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_nationkey").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val nations = graft.sources.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val exp = offers.filter(o => o._3 == best(o._1) && parts.contains(o._1))
      .map { o =>
        val (sn, nk) = supp(o._2)
        (o._1, parts(o._1), o._2, sn, nations(nk), o._3)
      }.sortBy(x => (x._1, x._3))
    val got = Analytics.minCostSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("top supplier equals the sequential scalar-max over quarterly revenue") {
    import org.apache.spark.sql.functions._
    val lo = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli * 1000
    val hi = java.time.Instant.parse("1997-04-01T00:00:00Z").toEpochMilli * 1000
    val rev = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("ship_us"),
        expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))""").as("cp"))
      .collect()
      .filter { r => val t = r.getLong(1); t >= lo && t < hi }
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(x => BigInt(x._2)).sum }
    val mx = rev.values.max
    val names = graft.sources.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = rev.filter(_._2 == mx).toSeq
      .map { case (s, v) => (s, names(s), v.toLong) }.sortBy(_._1)
    val got = Analytics.topSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("parts-supplier diversity equals the sequential anti-joined distinct count") {
    import org.apache.spark.sql.functions._
    val pairs = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val bad = graft.sources.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey").collect()
      .map(_.getLong(0)).toSet
    val dims = graft.sources.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val exp = pairs.filter(p => !bad(p._2))
      .map(p => (dims(p._1)._1, dims(p._1)._2, p._2)).distinct
      .groupBy(x => (x._1, x._2))
      .map { case (k, g) => (k._1, k._2, g.length.toLong) }
      .toSeq.sortBy(x => (-x._3, x._1, x._2))
    val got = Analytics.partsSuppCount(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("active users: rolling distinct windows equal the sequential definition") {
    import org.apache.spark.sql.functions._
    val ud = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2).distinct.sorted
    val exp = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(x => x._2 <= d && x._2 >= d - 6).map(_._1).distinct.length.toLong
      val mau = ud.filter(x => x._2 <= d && x._2 >= d - 27).map(_._1).distinct.length.toLong
      (d, dau, wau, mau, dau * 1000000L / mau)
    }.toSeq
    val got = Analytics.activeUsers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
    // containment: dau <= wau <= mau everywhere
    got.foreach { x => assert(x._2 <= x._3 && x._3 <= x._4) }
  }

  test("order priority equals the sequential correlated-exists count") {
    import org.apache.spark.sql.functions._
    val lo = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli * 1000
    val hi = java.time.Instant.parse("1997-04-01T00:00:00Z").toEpochMilli * 1000
    val ords = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("od_us"),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(o => o._2 >= lo && o._2 < hi)
    val shipDays = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000").as("sd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val exp = ords.filter { o =>
      val od = o._2 / 86400000000L
      shipDays.getOrElse(o._1, Seq.empty[Long]).exists(_ - od > 60)
    }.groupBy(_._3).map { case (p, g) => (p, g.length.toLong) }
      .toSeq.sortBy(_._1)
    val got = Analytics.orderPriority(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("new-vs-returning split conserves daily actives and events") {
    import org.apache.spark.sql.functions._
    val ud = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val first = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = ud.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, g) =>
      val users = g.map(_._1).distinct
      (d, g.length.toLong,
        users.count(u => first(u) == d).toLong,
        users.count(u => first(u) != d).toLong)
    }
    val got = Analytics.newVsReturning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // new-user counts across all days sum to the distinct user count
    assert(got.map(_._3).sum == ud.map(_._1).distinct.length.toLong)
    assert(exp.exists(_._4 > 0))
  }

  test("top-percent-per-group equals the sequential dynamic-k selection") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val n = g.length.toLong
      val k = (n + 9) / 10
      val top = g.sortBy(x => (-x._3, x._2)).take(k.toInt)
      val sumTop = top.map(_._3).sum
      val sumAll = g.map(_._3).sum
      (t, n, k, sumTop,
        if (sumAll == 0) -1L else sumTop * 1000000L / sumAll)
    }
    val got = Analytics.topPercentPerGroup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
    // the top decile of a positive-valued stream holds >= its share
    got.foreach { x => assert(x._5 >= 100000L, s"decile share ${x._5}") }
  }

  test("skyline equals the brute-force non-dominated set") {
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Tables.lineitem(spark, sfDir)
      .select(expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    // brute force: dominated if some other point has qty >= and
    // price <= with at least one strict
    val exp = pts.filter { case (q, p) =>
      !pts.exists { case (q2, p2) =>
        q2 >= q && p2 <= p && (q2 > q || p2 < p)
      }
    }.sortBy(x => (-x._1, x._2)).toSeq
    val got = Analytics.skyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == exp)
    // non-trivial frontier, and the frontier law: walking qty DOWN,
    // every surviving price is strictly cheaper than all before it
    assert(exp.length > 1)
    val prices = exp.map(_._2)
    assert(prices == prices.sorted.reverse && prices.distinct == prices)
  }

  test("quintile mobility matrix equals the sequential rank-cut-join") {
    import org.apache.spark.sql.functions._
    val uw = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    val tiles = uw.keys.groupBy(_._2).flatMap { case (wk, ks) =>
      val n = ks.size.toLong
      ks.toSeq.sortBy(k => (uw(k), k._1)).zipWithIndex.map { case (k, i) =>
        k -> ((i.toLong * 5) / n + 1)
      }
    }
    val exp = tiles.toSeq.flatMap { case ((u, wk), tf) =>
      tiles.get((u, wk + 1)).map(tt => (tf, tt))
    }.groupBy(identity).map { case ((tf, tt), g) => (tf, tt, g.size.toLong) }
      .toSeq.sortBy(x => (x._1, x._2))
    val got = Analytics.quintileShift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
    // totals: every counted transition pairs two consecutive weeks
    assert(got.map(_._3).sum == exp.map(_._3).sum)
  }

  test("largest-remainder allocation conserves the budget exactly") {
    import org.apache.spark.sql.functions._
    val per = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tot = per.map(_._2).sum
    val based = per.map { case (t, n) => (t, n, n * 1000 / tot, n * 1000 % tot) }
    val left = 1000 - based.map(_._3).sum
    val granted = based.sortBy(x => (-x._4, x._1)).zipWithIndex.map {
      case ((t, n, b, r), i) => (t, n, b, r, b + (if (i < left) 1L else 0L))
    }
    val exp = granted.sortBy(_._1).toSeq
    val got = Analytics.allocation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // the invariant the method exists for: granted sums to the budget
    assert(got.map(_._5).sum == 1000L)
    // and allocation is within one slot of the exact proportion
    got.foreach { x => assert(x._5 - x._3 <= 1 && x._5 >= x._3) }
  }

  test("lead time per priority equals the sequential per-order max-ship walk") {
    import org.apache.spark.sql.functions._
    val lastShip = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000").as("sd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val exp = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("od"),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .flatMap(o => lastShip.get(o._1).map(ls => (o._3, ls - o._2)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
        val ds = g.map(_._2)
        (p, ds.length.toLong, ds.min, ds.max, ds.sum / ds.length)
      }
    val got = Analytics.leadTime(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty && exp.exists(_._4 > 0))
  }

  test("week profile conserves events and pins ISO weekday semantics") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(expr("unix_micros(ts) div 86400000000").as("ed"),
        expr("(unix_micros(ts) % 86400000000) div 3600000000").as("hod"),
        col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // epoch day 0 = 1970-01-01 = a THURSDAY = ISO weekday 3
    val exp = ev.groupBy(e => (((e._1 + 3) % 7 + 7) % 7, e._2)).toSeq
      .sortBy(x => (x._1._1, x._1._2))
      .map { case ((dow, hod), g) =>
        (dow, hod, g.length.toLong, g.map(_._3).distinct.length.toLong,
          g.flatMap(_._4).sum)
      }
    val got = Analytics.weekProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    assert(got.map(_._3).sum == ev.length.toLong)
  }

  test("pareto cut equals the sequential smallest-k cumulative crossing") {
    import org.apache.spark.sql.functions._
    val pu = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type") === "purchase")
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val tot = pu.map(_._2).sum
    val ordered = pu.sortBy(x => (-x._2, x._1))
    var cum = 0L; var k = 0L; var found = 0L
    for ((_, v) <- ordered if found == 0) {
      cum += v; k += 1
      if (cum * 5 >= tot * 4) found = k
    }
    val row = Analytics.pareto8020(spark, sfDir).collect().head
    assert(row.getLong(0) == pu.length.toLong)
    assert(row.getLong(1) == tot)
    assert(row.getLong(2) == found)
    assert(row.getLong(3) == found * 1000000L / pu.length)
    // concentration exists: fewer than 80% of users cover 80% of revenue
    assert(found * 5 < pu.length.toLong * 4)
  }

  test("user feature matrix equals the sequential per-user aggregation") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, g) =>
      val days = g.map(_._2)
      val nAct = days.distinct.length.toLong
      (u, days.min, days.max, days.max - days.min + 1, g.length.toLong,
        g.count(_._3 == "purchase").toLong,
        g.filter(_._3 == "purchase").flatMap(_._4).sum,
        nAct, g.length.toLong * 1000 / nAct)
    }
    val got = Analytics.userFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
    // feature sanity: active days never exceed tenure
    got.foreach { x => assert(x._8 <= x._4) }
  }

  test("promo share equals the sequential conditional aggregate") {
    import org.apache.spark.sql.functions._
    val lo = java.time.Instant.parse("1997-03-01T00:00:00Z").toEpochMilli * 1000
    val hi = java.time.Instant.parse("1997-04-01T00:00:00Z").toEpochMilli * 1000
    val brands = graft.sources.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("us"),
        expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))""").as("cp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => x._2 >= lo && x._2 < hi)
    val promo = li.filter(x => brands(x._1).startsWith("Brand#1")).map(_._3).sum
    val total = li.map(_._3).sum
    val row = Analytics.promoShare(spark, sfDir).collect().head
    assert(row.getLong(0) == promo && row.getLong(1) == total)
    assert(row.getLong(2) == promo * 1000000L / total)
    assert(total > 0 && promo > 0 && promo < total)
  }

  test("returned revenue top-20 equals the sequential rollup") {
    import org.apache.spark.sql.functions._
    val lo = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli * 1000
    val hi = java.time.Instant.parse("1997-04-01T00:00:00Z").toEpochMilli * 1000
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(o => o._3 >= lo && o._3 < hi)
      .map(o => o._1 -> o._2).toMap
    val rev = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT))""").as("cp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(x => orders.get(x._1).map(c => (c, x._2)))
      .groupBy(_._1).view.mapValues(g => g.map(x => BigInt(x._2)).sum).toMap
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val nations = graft.sources.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val exp = rev.toSeq.sortBy(x => (-x._2, x._1)).take(20)
      .map { case (c, v) =>
        (c, cust(c)._1, nations(cust(c)._2), v.toLong)
      }
    val got = Analytics.returnedRevenue(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty)
  }

  test("bi-nation volume conserves lines and excludes the diagonal") {
    import org.apache.spark.sql.functions._
    val got = Analytics.nationVolume(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { x => assert(x._1 != x._2) }
    // conservation: line counts across all (pairs, years) equal the
    // cross-nation lineitem population computed independently
    val nations = graft.sources.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val sup = graft.sources.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> nations(r.getInt(1))).toMap
    val cst = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> nations(r.getInt(1))).toMap
    val ordCust = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCross = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").collect()
      .count(r => sup(r.getLong(1)) != cst(ordCust(r.getLong(0))))
    assert(got.map(_._4).sum == nCross.toLong)
  }
}
