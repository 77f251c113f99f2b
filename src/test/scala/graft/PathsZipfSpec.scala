package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.etl.EventsEtl
import graft.ops.Baskets
import graft.text.CorpusOps

/** Path mining, skew profiling, Zipf vocabulary profile, basket lift. */
class PathsZipfSpec extends SparkSpec {

  test("path trigrams match a hand walk of per-(user,day) sequences") {
    val rows = Analytics.pathMining(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("date").cast("string").as("d"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("d"),
        r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val hand = ev.groupBy(r => (r._1, r._2)).values.flatMap { g =>
      val seq = g.sortBy(r => (r._3, r._4)).map(_._5)
      seq.sliding(3).filter(_.length == 3).map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (r <- rows) {
      val key = (r.getAs[String]("step1"), r.getAs[String]("step2"), r.getAs[String]("step3"))
      assert(hand(key) == r.getAs[Long]("n"), s"trigram $key")
    }
    // the reported top-1 must be a global maximum
    assert(rows.head.getAs[Long]("n") == hand.values.max)
  }

  test("skew profile reports the true hottest keys and exact shares") {
    val rows = Analytics.skewProfile(spark, sfDir).collect()
    assert(rows.length == 10)
    val counts = graft.sources.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    val total = counts.map(_._2).sum
    val top = counts.sortBy { case (u, n) => (-n, u) }.take(10)
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[Long]("user_id") == top(i)._1)
      assert(r.getAs[Long]("n") == top(i)._2)
      assert(r.getAs[Long]("share_ppm") == top(i)._2 * 1000000L / total)
      assert(r.getAs[Long]("n_total_rows") == total)
      assert(r.getAs[Long]("n_distinct_keys") == counts.length.toLong)
    }
  }

  test("zipf profile ranks the vocabulary with exact cumulative shares") {
    val rows = CorpusOps.zipfProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val uni = texts.flatMap(_.toLowerCase.replaceAll("[^a-z ]", "")
      .split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = uni.values.sum
    val sorted = uni.toSeq.sortBy { case (w, n) => (-n, w) }.take(500)
    assert(rows.length == math.min(500, sorted.length))
    var cum = 0L
    for ((r, i) <- rows.zipWithIndex) {
      val (w, n) = sorted(i)
      cum += n
      assert(r.getAs[String]("word") == w, s"rank ${i + 1}")
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[Long]("rank_x_n") == (i + 1L) * n)
      assert(r.getAs[Long]("cum_share_ppm") == cum * 1000000L / total)
    }
    // ranks strictly ordered by count desc
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("gini concentration matches the textbook formula per segment") {
    val rows = Analytics.giniConcentration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rev = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("rev"))
      .join(graft.sources.Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), Seq("o_custkey"))
      .collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("o_custkey"),
        r.getAs[Long]("rev")))
    for (r <- rows) {
      val seg = r.getAs[String]("c_mktsegment")
      val xs = rev.filter(_._1 == seg).sortBy(x => (x._3, x._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      val num = BigInt(2) * s1 - BigInt(n + 1) * sx
      val expect = (num * 1000000 / (BigInt(n) * sx)).toLong
      assert(r.getAs[Long]("n_customers") == n)
      assert(r.getAs[Long]("total_cents") == sx)
      assert(r.getAs[Long]("gini_ppm") == expect, s"segment $seg")
      // a revenue distribution is neither perfectly equal nor degenerate
      assert(expect > 0 && expect < 1000000)
    }
  }

  test("dq rule engine counts violations per declarative rule") {
    val rows = EventsEtl.dqRules(spark, sfDir).collect()
      .map(r => r.getAs[String]("rule_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"))).toMap
    assert(rows.size == EventsEtl.DefaultDqRules.size)
    val e = graft.sources.Tables.events(spark, sfDir)
    val n = e.count()
    assert(rows.values.forall(_._1 == n))
    assert(rows("ts_not_null")._2 == e.filter(col("ts").isNull).count())
    assert(rows("value_in_range")._2 ==
      e.filter(!(col("value") >= 0 && col("value") <= 300)).count())
    // custom rule sets compile and evaluate too (the engine is generic)
    val custom = EventsEtl.dqRules(spark, sfDir,
      Seq(("always_true", "1 = 1"), ("id_even", "event_id % 2 = 0"))).collect()
    assert(custom.length == 2)
    assert(custom.find(_.getAs[String]("rule_name") == "always_true")
      .get.getAs[Long]("n_violations") == 0L)
  }

  test("chi-square matches a hand computation on the hand-built contingency") {
    val r = Analytics.abTest(spark, sfDir).collect().head
    val (ac, an, bc, bn) = (r.getAs[Long]("a_conv"), r.getAs[Long]("a_not"),
      r.getAs[Long]("b_conv"), r.getAs[Long]("b_not"))
    // a saturated or empty margin would make the test vacuous
    assert(ac + an > 0 && bc + bn > 0 && ac + bc > 0 && an + bn > 0)
    val n = (ac + an + bc + bn).toDouble
    def e(row: Long, colSum: Long) = row * colSum / n
    val hand = math.rint((
      math.pow(ac - e(ac + an, ac + bc), 2) / e(ac + an, ac + bc) +
      math.pow(an - e(ac + an, an + bn), 2) / e(ac + an, an + bn) +
      math.pow(bc - e(bc + bn, ac + bc), 2) / e(bc + bn, ac + bc) +
      math.pow(bn - e(bc + bn, an + bn), 2) / e(bc + bn, an + bn)) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("chi2") - hand) < 1e-9)
    // contingency cells recount from raw events (early conversion)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(rr => (rr.getLong(0), rr.getString(1), rr.getLong(2)))
    val conv = ev.groupBy(_._1).map { case (u, rows) =>
      val first = rows.map(_._3).min
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      u -> fp.exists(_ - first <= 86400000000L)
    }
    assert(ac == conv.count { case (u, c) => u % 2 == 0 && c }.toLong)
    assert(bn == conv.count { case (u, c) => u % 2 == 1 && !c }.toLong)
  }

  test("burst detection flags exactly the hours above the trailing Poisson band") {
    val rows = Analytics.burstDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every row has a full 24h baseline and a consistent flag
    for (r <- rows) {
      val thr = r.getAs[Double]("threshold")
      val mean = r.getAs[Double]("base_mean")
      assert(math.abs(thr - math.rint((mean + 3.0 * math.sqrt(mean)) * 1e6) / 1e6) < 1e-9)
      assert(r.getAs[Boolean]("is_burst") == (r.getAs[Long]("n") > thr))
    }
    // hourly counts recheck for one flagged-or-not hour
    val hourUs = 3600L * 1000000L
    val counts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy((expr(s"unix_micros(ts) div $hourUs") * hourUs).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("n")).toMap
    for (r <- rows.take(5))
      assert(counts(r.getAs[Long]("hour_us")) == r.getAs[Long]("n"))
  }

  test("changepoint peak is the exact CUSUM argmax per type") {
    val rows = Analytics.changepoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), Analytics.cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts_us"), r.getAs[Long]("vc")))
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val seq = ev.filter(_._1 == t).sortBy(x => (x._3, x._2))
      val n = seq.length.toLong
      val sx = seq.map(_._4).sum
      var s = 0L
      val cusums = seq.zipWithIndex.map { case ((_, _, ts, vc), idx) =>
        s += vc; (ts, idx + 1L, s * n - (idx + 1L) * sx)
      }
      val maxAbs = cusums.map(c => math.abs(c._3)).max
      val peak = cusums.filter(c => math.abs(c._3) == maxAbs)
        .minBy(c => (c._1, c._2))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("max_abs_cusum") == maxAbs, s"type $t")
      assert(r.getAs[Long]("peak_ts_us") == peak._1)
      assert(r.getAs[Long]("peak_pos") == peak._2)
      assert(r.getAs[Long]("peak_cusum") == peak._3)
      // last CUSUM is identically zero — the telescoping sanity check
      assert(cusums.last._3 == 0L)
    }
  }

  test("disorder audit: lateness bounded by the injected source delay") {
    val rows = EventsEtl.disorderAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalLate = rows.map(_.getAs[Long]("n_late")).sum
    assert(totalLate > 0, "no late events — disorder audit vacuous")
    for (r <- rows) {
      // lateness can never exceed the 5-min two-source skew
      assert(r.getAs[Long]("max_lateness_us") <= 300L * 1000000L)
      assert(r.getAs[Long]("late_ppm") ==
        r.getAs[Long]("n_late") * 1000000L / r.getAs[Long]("n_events"))
    }
    // hand-replay one user's arrival stream
    val u = rows.filter(_.getAs[Long]("n_late") > 0).head.getAs[Long]("user_id")
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id") === u)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, ts) => (ts + (id % 2) * 300000000L, id, ts) }
      .sortBy(x => (x._1, x._2))
    var hwm = Long.MinValue; var nLate = 0L
    for ((_, _, ts) <- ev) {
      if (hwm != Long.MinValue && ts < hwm) nLate += 1
      hwm = math.max(hwm, ts)
    }
    assert(rows.find(_.getAs[Long]("user_id") == u).get.getAs[Long]("n_late") == nLate)
  }

  test("rfm cells partition all users with quintile-consistent scores") {
    val rows = Analytics.rfmSegmentation(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    for (r <- rows) {
      val cell = r.getAs[Long]("rfm_cell")
      val (rr, f, m) = (cell / 100, cell / 10 % 10, cell % 10)
      assert(rr >= 1 && rr <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5, s"cell $cell")
    }
    // quintiles are balanced: each r-score holds ~1/5 of users
    val byR = rows.groupBy(_.getAs[Long]("rfm_cell") / 100)
      .view.mapValues(_.map(_.getAs[Long]("n_users")).sum)
    assert(byR.values.max - byR.values.min <= 1,
      s"r-quintiles unbalanced: $byR")
  }

  test("k-anonymity audit finds exactly the sub-k equivalence classes") {
    val rows = EventsEtl.kAnonymity(spark, sfDir).collect()
    assert(rows.nonEmpty, "no sub-25 classes at spec SF — audit vacuous")
    val classes = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("h"),
        floor(col("value") / 30).cast("long").as("b"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("h"),
        r.getAs[Long]("b")), r.getAs[Long]("n"))).toMap
    val kMin = classes.values.min
    for (r <- rows) {
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("event_hour"),
        r.getAs[Long]("value_band"))
      assert(r.getAs[Long]("n") == classes(key) && classes(key) < 25)
      assert(r.getAs[Long]("k_min") == kMin)
      assert(r.getAs[Long]("n_classes") == classes.size.toLong)
    }
    // completeness: every sub-25 class is reported
    assert(rows.length == classes.values.count(_ < 25))
  }

  test("dup coverage counts cross-document shingle sharing exactly") {
    val rows = graft.text.TextOps.dupCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = texts.map { case (id, t) =>
      val ws = t.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = perDoc.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    for (r <- rows.take(20)) {
      val id = r.getAs[Long]("doc_id")
      val sh = perDoc(id)
      val nDup = sh.count(s => df(s) >= 2).toLong
      assert(r.getAs[Long]("n_shingles") == sh.size.toLong)
      assert(r.getAs[Long]("n_dup_shingles") == nDup)
      assert(r.getAs[Long]("dup_ppm") == nDup * 1000000L / sh.size)
    }
  }

  test("week-over-week change is the exact ppm delta of adjacent weeks") {
    val rows = Analytics.weekOverWeek(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    for ((_, rs) <- byType) {
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("week_start").toString)
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_cents")))
      for (Array(prev, cur) <- sorted.sliding(2)) {
        assert(cur.getAs[Long]("prev_cents") == prev.getAs[Long]("rev_cents"))
        val expect = (cur.getAs[Long]("rev_cents") - cur.getAs[Long]("prev_cents")) *
          1000000L / cur.getAs[Long]("prev_cents")
        assert(cur.getAs[Long]("wow_change_ppm") == expect)
      }
      // week starts must be Mondays (ISO week truncation)
      for (r <- sorted)
        assert(r.getAs[java.sql.Date]("week_start").toLocalDate.getDayOfWeek ==
          java.time.DayOfWeek.MONDAY)
    }
  }

  test("basket lift reproduces hand-computed supports for its top pairs") {
    val rows = Baskets.basketLift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val nOrders = li.map(_._1).distinct.length.toLong
    val single = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (r <- rows.take(10)) {
      val (pa, pb) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val nAb = pairs((pa, pb))
      assert(nAb >= 3 && r.getAs[Long]("n_ab") == nAb)
      assert(r.getAs[Long]("n_a") == single(pa))
      assert(r.getAs[Long]("n_b") == single(pb))
      assert(r.getAs[Long]("lift_ppm") ==
        nAb * nOrders * 1000000L / (single(pa) * single(pb)))
    }
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }
}
