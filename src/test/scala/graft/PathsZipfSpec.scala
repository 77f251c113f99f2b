package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
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
