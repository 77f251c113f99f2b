package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.analytics.Analytics
import graft.etl.EventsEtl
import graft.ops.Triangles
import graft.streaming.StreamingEtl
import graft.streaming.StreamingEtl.EventRow

/** Debounce (batch + streaming twin), last-touch attribution,
  * winsorization, and k-core peeling. */
class DebounceAttrSpec extends SparkSpec {

  private val GapUs = 7200L * 1000000L

  test("debounce keeps exactly the lead event of every same-action burst") {
    val got = EventsEtl.debounce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_suppressed")))
    assert(got.nonEmpty)
    val raw = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us")))
    val expect = raw.groupBy(r => (r._2, r._3)).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      var bursts = List.empty[(Long, Long, String, Long)] // (lead_id,u,t,n_sup)
      var lastRaw = Long.MinValue
      for ((id, u, t, ts) <- sorted) {
        if (lastRaw == Long.MinValue || ts - lastRaw >= GapUs)
          bursts = (id, u, t, 0L) :: bursts
        else {
          val (lid, lu, lt, n) = bursts.head
          bursts = (lid, lu, lt, n + 1) :: bursts.tail
        }
        lastRaw = ts
      }
      bursts
    }.toSeq.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) == expect)
    // the threshold must actually suppress something on the test data
    assert(got.exists(_._4 > 0))
  }

  test("streaming debounce agrees with the batch rule on in-order input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def row(id: Long, tsMs: Long, uid: Long, tpe: String) =
      EventRow(id, new Timestamp(tsMs), uid, tpe, 1.0, "{}")
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.debounceStream(stream.toDS())
      .writeStream.format("memory").queryName("debounce_out")
      .outputMode("append").start()
    // user 7 clicks: lead, +1h repeat (suppressed), +3h (new burst);
    // same user different action at +1h passes; user 8 unaffected
    stream.addData(row(1, base, 7, "click"), row(2, base + 3600000, 7, "click"))
    q.processAllAvailable()
    // state must persist across batches: the +3h click is 2h after the
    // LAST RAW click (the suppressed one), so it is itself suppressed...
    stream.addData(row(3, base + 3600000 * 3, 7, "click"),
      row(4, base + 3600000, 7, "view"), row(5, base + 1000, 8, "click"))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("debounce_out").select("event_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L, 5L),
      s"got $ids") // id=3 IS emitted: gap from id=2 raw is 2h >= 2h
    // cross-check each emitted id against the batch rule replay
    val events = Seq((1L, 0L), (2L, 3600000L), (3L, 3600000L * 3))
    var lastRaw = Long.MinValue; var kept = Set.empty[Long]
    for ((id, off) <- events) {
      if (lastRaw == Long.MinValue || (off - lastRaw) * 1000 >= GapUs) kept += id
      lastRaw = off
    }
    assert(kept == Set(1L, 3L))
  }

  test("watermark audit reports late rows the engine silently dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def row(id: Long, tsMs: Long) =
      EventRow(id, new Timestamp(tsMs), 7L, "click", 1.0, "{}")
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("wm_audit_out")
      .outputMode("append").start()
    // on-time data, then a 2 h jump that advances the watermark
    stream.addData(row(1, base), row(2, base + 60000))
    q.processAllAvailable()
    stream.addData(row(3, base + 7200000))
    q.processAllAvailable()
    // a row 2 h behind the watermark: silently dropped by the engine
    stream.addData(row(4, base + 1000))
    q.processAllAvailable()
    val (dropped, stateRows) = StreamingEtl.watermarkAudit(q)
    q.stop()
    assert(dropped >= 1L, s"late row not counted as dropped (dropped=$dropped)")
    assert(stateRows >= 1L)
    // and the dropped row really is absent: its bucket closed with n=2
    val n = spark.table("wm_audit_out")
      .filter(col("bucket_start") === new Timestamp(base))
      .select("n").as[Long].collect()
    assert(n.forall(_ == 2L), s"late row leaked into a closed bucket: ${n.toSeq}")
  }

  test("attribution credits the last touch within 24h and books the rest to none") {
    val rows = Analytics.attribution(spark, sfDir).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("attributed_cents"))).toMap
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        Analytics.cents(col("value")).as("vc")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us"), r.getAs[Long]("vc")))
    val DayUs = 86400L * 1000000L
    val hand = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    for ((_, _, _, _, _) <- Seq.empty[(Long, Long, String, Long, Long)]) ()
    ev.groupBy(_._2).foreach { case (_, rows0) =>
      val sorted = rows0.sortBy(r => (r._4, r._1))
      var lastTouch: Option[(Long, String)] = None
      for ((_, _, tpe, ts, vc) <- sorted) {
        if (tpe == "purchase") {
          val credit = lastTouch match {
            case Some((tts, ttype)) if ts - tts <= DayUs => ttype
            case _ => "none"
          }
          val (n, c) = hand(credit); hand(credit) = (n + 1, c + vc)
        } else lastTouch = Some((ts, tpe))
      }
    }
    assert(rows.keySet == hand.keySet)
    for ((k, v) <- hand) assert(rows(k) == v, s"channel $k")
    assert(hand.keySet.contains("none") && hand.size >= 2)
  }

  test("winsorize clips at the exact rank-based p05/p95 order statistics") {
    val rows = Analytics.winsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        Analytics.cents(col("value")).as("vc")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("vc")))
      .groupBy(_._1)
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val vs = byType(t).sortBy(x => (x._3, x._2)).map(_._3)
      val n = vs.length
      val lo = vs(((n - 1) * 5 / 100 + 1).toInt - 1)
      val hi = vs(((n - 1) * 95 / 100 + 1).toInt - 1)
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("lo_cents") == lo, s"$t lo")
      assert(r.getAs[Long]("hi_cents") == hi, s"$t hi")
      assert(r.getAs[Long]("sum_raw_cents") == vs.sum)
      assert(r.getAs[Long]("sum_winsorized_cents") ==
        vs.map(v => math.min(math.max(v, lo), hi)).sum)
      assert(r.getAs[Long]("n_clip_lo") == vs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clip_hi") == vs.count(_ > hi).toLong)
      assert(r.getAs[Long]("n_clip_lo") > 0 || r.getAs[Long]("n_clip_hi") > 0)
    }
  }

  test("stream-static enrichment joins the dimension per batch with provenance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def row(id: Long, uid: Long) =
      EventRow(id, new Timestamp(base + id * 1000), uid, "click", 1.0, "{}")
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "segment")
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.enrichStream(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    stream.addData(row(1, 7), row(2, 8), row(3, 99)) // 99: unknown key
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
      .select("event_id", "segment", "dim_matched").collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[String]("segment")),
        r.getAs[Boolean]("dim_matched"))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some("gold"), true), (2L, Some("silver"), true),
      (3L, None, false)), s"got ${out.toSeq}")
  }

  test("3-core equals brute-force iterative peeling") {
    // replicate the thresholded edge build: parts co-occurring in >= 3
    // distinct orders (sf0.001's non-vacuous threshold)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("ok"), r.getAs[Long]("pk")))
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3).keys.toSet
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.length).toMap
      val bad = deg.filter(_._2 < 3).keySet
      changed = bad.nonEmpty
      es = es.filter { case (a, b) => !bad(a) && !bad(b) }
    }
    val expect = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Triangles.kCore(spark, sfDir, 3, 3L).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
    assert(got == expect)
    // peeling must remove something relative to the raw graph, and the
    // core must be non-empty, or the test is vacuous
    val rawNodes = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }.distinct.length
    assert(got.nonEmpty && got.size < rawNodes)
  }
}
