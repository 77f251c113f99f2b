package graft

import graft.streaming.StreamingEtl
import graft.streaming.StreamingEtl.{EventRow, SpeedOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def row(id: Long, tsMs: Long, uid: Long, typ: String, v: Double) =
    EventRow(id, new Timestamp(tsMs), uid, typ, v, s"""{"k": $id}""")

  private val base = 1704067200000L // 2024-01-01T00:00:00Z

  test("windowed counts match the batch tumbling aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      row(1, base + 60_000, 1, "click", 10.0),
      row(2, base + 120_000, 1, "click", 20.0),
      row(3, base + 660_000, 2, "view", 30.0),   // next 10-min bucket
      row(4, base + 700_000, 1, "click", 40.0))
    val stream = MemoryStream[EventRow]
    stream.addData(events)
    val q = StreamingEtl.windowedCounts(StreamingEtl.validate(stream.toDF()))
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wincounts")
      .select("bucket_start", "event_type", "n", "sum_cents")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = events.toDF()
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("sum_cents"))
      .select($"w.start", $"event_type", $"n", $"sum_cents")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("rolling actives: chained window aggs equal the batch twin once closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86_400_000L
    // three users across four days: u1 every day, u2 days 0+2, u3 day 3
    val events = Seq(
      row(1, base, 1, "click", 1.0),
      row(2, base + day, 1, "click", 1.0),
      row(3, base + 2 * day, 1, "click", 1.0),
      row(4, base + 3 * day, 1, "click", 1.0),
      row(5, base, 2, "view", 1.0),
      row(6, base + 2 * day, 2, "view", 1.0),
      row(7, base + 3 * day, 3, "view", 1.0))
    // sentinel far past every real window: pushes the watermark so all
    // real windows CLOSE and emit in append mode
    val sentinel = row(99, base + 40 * day, 9, "click", 1.0)
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.rollingActives(stream.toDF())
      .writeStream.format("memory").queryName("actives")
      .outputMode("append").start()
    stream.addData(events)
    q.processAllAvailable()
    stream.addData(Seq(sentinel))
    q.processAllAvailable(); q.stop()
    val got = spark.table("actives").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
    val want = events.toDF()
      .groupBy(window($"ts", "7 days", "1 day").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_ev"))
      .groupBy($"w")
      .agg(count(lit(1)).as("actives"), sum("n_ev").as("n_events"))
      .select($"w.start", $"actives", $"n_events")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // peak window covers all four active days: all three users counted
    assert(got.map(_._2).max == 3L)
  }

  test("stateful speed derivation carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.statefulSpeed(stream.toDS())
      .writeStream.format("memory").queryName("speeds")
      .outputMode("append").start()
    // batch 1: first observation per user -> no speed
    stream.addData(row(1, base, 7, "click", 100.0))
    q.processAllAvailable()
    // batch 2: 10 seconds later, +50 value -> 5.0 units/sec
    stream.addData(row(2, base + 10_000, 7, "click", 150.0))
    q.processAllAvailable()
    // batch 3: 20 seconds later, value drops -> clipped to 0
    stream.addData(row(3, base + 30_000, 7, "click", 100.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("speeds").as[SpeedOut].collect()
      .map(s => s.event_id -> s.speed).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(5.0))
    assert(got(3L).contains(0.0))
  }

  test("stream-stream interval join matches clicks in the 5-min lookback only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val errors = MemoryStream[EventRow]
    val q = StreamingEtl.clickErrorJoin(clicks.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    clicks.addData(
      row(10, base, 1, "click", 1.0),            // 2 min before error: match
      row(11, base + 60_000, 1, "click", 2.0),   // 1 min before: match
      row(12, base - 600_000, 1, "click", 3.0),  // 10 min before: outside window
      row(13, base + 60_000, 2, "click", 4.0),   // other user: no match
      row(14, base + 300_000, 1, "click", 5.0))  // after the error: no match
    errors.addData(row(20, base + 120_000, 1, "error", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin")
      .select("event_id", "c_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 100L), (20L, 200L)))
  }

  test("streaming session windows close at the gap and match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.sessionCounts(stream.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // session 1: two events 10 min apart (same 30-min-gap session)
    stream.addData(
      row(1, base, 5, "click", 10.0),
      row(2, base + 600_000, 5, "click", 20.0))
    q.processAllAvailable()
    // an event 2 hours later: starts session 2 AND advances the
    // watermark past session 1's close, so session 1 is emitted
    stream.addData(row(3, base + 7_200_000, 5, "click", 30.0))
    q.processAllAvailable()
    // push the watermark far ahead to flush session 2 as well
    stream.addData(row(4, base + 100_000_000, 6, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions")
      .filter($"user_id" === 5)
      .select("session_start", "session_end", "n_events", "sum_cents")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3))).toSet
    val gap = 1_800_000L // 30 min
    assert(got == Set(
      (base, base + 600_000 + gap, 2L, 3000L),
      (base + 7_200_000, base + 7_200_000 + gap, 1L, 3000L)))
  }

  test("stateful sessionizer closes on in-batch gaps and on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.statefulSessions(stream.toDS())
      .writeStream.format("memory").queryName("statefulsessions")
      .outputMode("append").start()
    // session 1: two events 10 min apart
    stream.addData(
      row(1, base, 5, "click", 10.0),
      row(2, base + 600_000, 5, "click", 20.0))
    q.processAllAvailable()
    // 2 hours later: the arriving event itself closes session 1 inline
    stream.addData(row(3, base + 7_200_000, 5, "click", 30.0))
    q.processAllAvailable()
    // far-future event for ANOTHER user: advances the watermark so
    // session 2 closes via the EventTimeTimeout callback, not an event
    stream.addData(row(4, base + 100_000_000, 6, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("statefulsessions")
      .filter($"user_id" === 5)
      .select("start_ms", "end_ms", "n_events", "sum_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (base, base + 600_000, 2L, 3000L),
      (base + 7_200_000, base + 7_200_000, 1L, 3000L)))
  }

  test("streaming validation drops the same rows as batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      row(1, base, 1, "click", 10.0),
      row(2, base, 1, "bogus_type", 10.0), // invalid type
      row(3, base, 1, "view", 500.0))      // over max value
    val stream = MemoryStream[EventRow]
    stream.addData(events)
    val q = StreamingEtl.validate(stream.toDF())
      .writeStream.format("memory").queryName("validated")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("validated").select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("streaming Misra-Gries keeps <=k counters yet never loses a true heavy hitter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.HeavyHittersStream.ItemIn
    val k = 10
    // zipf-ish stream: "hot" is 30% of mass, "warm" 15%, the rest a
    // long tail of distinct items that would blow an exact groupBy state
    def batch(tag: String): Seq[ItemIn] = {
      val hot = Seq.fill(60)(ItemIn("g", "hot"))
      val warm = Seq.fill(30)(ItemIn("g", "warm"))
      val tail = (1 to 110).map(i => ItemIn("g", s"tail$tag$i"))
      hot ++ warm ++ tail
    }
    val stream = MemoryStream[ItemIn]
    val q = graft.streaming.HeavyHittersStream.heavyHittersStream(stream.toDS(), k)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    stream.addData(batch("a"): _*)
    q.processAllAvailable()
    stream.addData(batch("b"): _*)
    q.processAllAvailable(); q.stop()
    // latest report per item for the group (update mode re-reports)
    val last = spark.table("hh_out").filter(col("n_seen") === 400)
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("est"), r.getAs[Long]("err_bound"))).toMap
    assert(last.size <= k)
    // completeness: items with freq > n/(k+1) = 400/11 ≈ 36 must be
    // present — hot (120) and warm (60) both clear it
    assert(last.contains("hot") && last.contains("warm"))
    // MG error envelope: true count in [est, est + n/(k+1)]
    val bound = 400L / (k + 1)
    assert(last.values.forall(_._2 == bound))
    val (hotEst, _) = last("hot")
    assert(hotEst <= 120 && hotEst + bound >= 120, s"hot est $hotEst outside envelope")
    val (warmEst, _) = last("warm")
    assert(warmEst <= 60 && warmEst + bound >= 60, s"warm est $warmEst outside envelope")
    // the summary's counters never exceeded k even with 220+ distinct items
    assert(spark.table("hh_out").groupBy("n_seen").count()
      .collect().forall(_.getAs[Long]("count") <= k))
  }
}
