package graft

import graft.analytics.{Analytics, TemporalOps}
import graft.ops.PageRank

/** Concurrency sweep, decayed scoring, and degree distribution. */
class TemporalSpec extends SparkSpec {

  test("sweep concurrency equals the brute-force interval count per hour") {
    val sessions = Analytics.sessionize(spark, sfDir)
      .select("start_us", "end_us").collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
    val got = TemporalOps.concurrency(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hour_us") -> r.getAs[Long]("max_concurrent")).toMap
    assert(got.nonEmpty)
    // Brute force over EVERY hour in the data's span, not just hours
    // that appear in the output: the step function changes only at
    // boundaries, so its max over the hour is attained at the hour
    // start (the carry-in plateau) or at a boundary instant inside it.
    val hourUs = 3600L * 1000000L
    val minHour = sessions.map(_._1).min / hourUs
    val maxHour = sessions.map(_._2 + 1).max / hourUs
    for (h <- minHour to maxHour) {
      val hour = h * hourUs
      val instants = hour +: sessions.flatMap { case (s, e) => Seq(s, e + 1) }
        .filter(t => t >= hour && t < hour + hourUs).distinct
      val brute = instants
        .map(t => sessions.count { case (s, e) => s <= t && t <= e }.toLong)
        .max
      val nBounds = sessions.flatMap { case (s, e) => Seq(s, e + 1) }
        .count(t => t >= hour && t < hour + hourUs)
      if (nBounds > 0 || brute > 0)
        assert(got.get(hour).contains(brute),
          s"hour $hour: brute $brute vs sweep ${got.get(hour)} (n_bounds=$nBounds)")
      else
        assert(!got.contains(hour), s"hour $hour: emitted but idle")
    }
    // peak concurrency must exceed 1 somewhere or the sweep is vacuous
    assert(got.values.max > 1)
  }

  test("decayed score weights the most recent events geometrically") {
    val rows = TemporalOps.decayedScore(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_recent") <= 5))
    // recompute one user's score by hand off the raw events
    val u = rows.head.getAs[Long]("user_id")
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id") === u)
      .select(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")).as("ts_us"),
        org.apache.spark.sql.functions.col("event_id"),
        Analytics.cents(org.apache.spark.sql.functions.col("value")).as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (ts, id, _) => (-ts, -id) }.take(5)
    val hand = ev.zipWithIndex.map { case ((_, _, vc), i) => (16L >> i) * vc }.sum
    assert(rows.head.getAs[Long]("decayed_cents") == hand)
  }

  test("sketch rollup merges exactly and lands within the HLL error envelope") {
    import org.apache.spark.sql.functions._
    val rolled = Analytics.sketchRollup(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est_users")).toMap
    // mergeability identity: union of daily sketches == one-shot sketch
    val oneShot = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est")).toMap
    assert(rolled == oneShot, s"sketch union drifted from one-shot: $rolled vs $oneShot")
    // lgK=12 standard error ~1.6%; 5% is a safe deterministic envelope
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    for ((t, n) <- exact) {
      val est = rolled(t)
      assert(math.abs(est - n) <= math.max(1L, (n * 0.05).toLong),
        s"type $t: est $est vs exact $n")
    }
  }

  test("nearest as-of dominates the backward as-of gap, same rows") {
    def gaps(df: org.apache.spark.sql.DataFrame, tsCol: String) =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        (r.get(r.fieldIndex("gap_us")), r.get(r.fieldIndex(tsCol)))).toMap
    val near = gaps(Analytics.asofNearest(spark, sfDir), "nearest_click_us")
    val back = gaps(Analytics.asofJoin(spark, sfDir), "last_click_us")
    assert(near.keySet == back.keySet, "variants disagree on the error set")
    var strictly = 0
    for ((id, (bGap, _)) <- back; (nGap, nTs) <- near.get(id)) {
      if (bGap != null) {
        assert(nGap != null && math.abs(nGap.asInstanceOf[Long]) <=
          bGap.asInstanceOf[Long], s"event $id: nearest worse than backward")
        if (math.abs(nGap.asInstanceOf[Long]) < bGap.asInstanceOf[Long]) strictly += 1
      }
      if (nGap != null && nGap.asInstanceOf[Long] < 0) assert(nTs != null)
    }
    assert(strictly > 0, "forward candidates never won — vacuous data")
    // both directional frames + the argmin ride ONE user_id exchange
    val plan = Analytics.asofNearest(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx")
  }

  test("MAD anomaly screen is robust: outlier count survives an extreme value") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.anomalyMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Double]("mad_cents") >= 0.0)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n") / 4,
        "a robust screen should flag a minority")
      // med/mad of integer cents are exact half-steps
      assert(r.getAs[Double]("med_cents") * 2 == (r.getAs[Double]("med_cents") * 2).round.toDouble)
      assert(r.getAs[Double]("mad_cents") * 2 == (r.getAs[Double]("mad_cents") * 2).round.toDouble)
    }
    // hand-check one type against a driver-side median/MAD
    val t = rows.head.getAs[String]("event_type")
    val vs = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(Analytics.cents(col("value")).as("vc")).collect()
      .map(_.getAs[Long]("vc")).sorted
    def med(a: Array[Long]): Double =
      if (a.length % 2 == 1) a(a.length / 2).toDouble
      else (a(a.length / 2 - 1) + a(a.length / 2)) / 2.0
    val m = med(vs)
    assert(rows.head.getAs[Double]("med_cents") == m)
    val madHand = med(vs.map(v => math.abs(v - m))
      .map(d => (d * 2).toLong).sorted) / 2.0 // half-steps as integers
    assert(rows.head.getAs[Double]("mad_cents") == madHand)
  }

  test("degree distribution accounts for every graph node once") {
    val dist = PageRank.degreeDist(spark, sfDir).collect()
    val nodes = dist.map(_.getAs[Long]("n_nodes")).sum
    val ranked = PageRank.pageRank(spark, sfDir).count()
    assert(nodes == ranked, s"degree-dist nodes $nodes vs pagerank nodes $ranked")
    assert(dist.map(_.getAs[String]("side")).distinct.sorted.toSeq ==
      Seq("customer", "supplier"))
    // bipartite sanity: total degree mass equal on both sides
    def mass(side: String) = dist.filter(_.getAs[String]("side") == side)
      .map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(mass("customer") == mass("supplier"))
  }
}
