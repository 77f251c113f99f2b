package graft

import graft.streaming.StreamingEtl
import graft.streaming.StreamingEtl.EventRow
import graft.io.Sink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {

  private def row(id: Long, tsMs: Long, uid: Long, v: Double) =
    EventRow(id, new Timestamp(tsMs), uid, "click", v, "{}")

  private val base = 1704067200000L

  test("streaming keep-first dedup drops later duplicates of a key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    stream.addData(row(1, base, 7, 1.0), row(2, base + 1000, 8, 2.0))
    q.processAllAvailable()
    stream.addData(row(3, base + 2000, 7, 3.0)) // dup key within watermark
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }

  test("streaming session windows close after the gap and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n"))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    // session 1: two events 5 min apart; then a 2h silence; then a late
    // event that advances the watermark far enough to close session 1
    stream.addData(row(1, base, 7, 1.0), row(2, base + 300000, 7, 2.0))
    q.processAllAvailable()
    stream.addData(row(3, base + 7200000, 7, 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessions_out").collect()
    assert(rows.length == 1, s"expected exactly the closed first session, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[java.sql.Timestamp]("end").getTime ==
      base + 300000 + 1800000) // last event + gap
  }

  test("foreachBatch streams into the partitioned sink idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_fb_out").toString
    val stream = MemoryStream[EventRow]
    val q = stream.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sink.writePartitioned(
          batch.withColumn("event_date", to_date(col("ts"))), out, Seq("event_date"))
      }
      .start()
    stream.addData(row(1, base, 1, 1.0), row(2, base + 86400000L, 2, 2.0))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 2)
    assert(got.select("event_date").distinct().count() == 2)
  }

  test("streaming quarantine splits each batch losslessly with tagged reasons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cleanP = Files.createTempDirectory("graft_sq_clean").toString
    val quarP = Files.createTempDirectory("graft_sq_quar").toString
    val stream = MemoryStream[EventRow]
    val q = StreamingEtl.quarantineSink(stream.toDF(), cleanP, quarP)
    stream.addData(
      row(1, base, 1, 10.0),                         // valid
      EventRow(2, null, 2, "click", 5.0, "{}"),      // null ts
      row(3, base, 3, -4.0),                         // negative value
      EventRow(4, new java.sql.Timestamp(base), 4, "bogus", 1.0, "{}")) // bad type
    q.processAllAvailable(); q.stop()
    val clean = spark.read.parquet(cleanP).select("event_id").as[Long].collect().toSet
    val quar = spark.read.parquet(quarP)
      .select("event_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean == Set(1L))
    assert(quar == Map(2L -> "null_ts", 3L -> "neg_value", 4L -> "bad_type"))
    assert(clean.size + quar.size == 4, "rows lost between the two paths")
  }

  test("foreachBatch + upsert sink absorbs replayed and out-of-order change batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_fb_upsert").toString
    val stream = MemoryStream[EventRow]
    // CDC apply loop: each micro-batch merges into the keyed table;
    // event_id is the key, value carries the version
    val q = stream.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sink.upsertPartitioned(
          batch.withColumn("event_date", to_date(col("ts")).cast("string")),
          out, "event_date", "event_id", "value")
      }
      .start()
    stream.addData(row(1, base, 1, 1.0), row(2, base, 2, 1.0))
    q.processAllAvailable()
    // batch 2: update key 1 (higher version), new key 3
    stream.addData(row(1, base, 1, 2.0), row(3, base, 3, 1.0))
    q.processAllAvailable()
    // batch 3: REPLAY of batch 2 (at-least-once delivery) + a stale
    // change for key 2 that must not win
    stream.addData(row(1, base, 1, 2.0), row(3, base, 3, 1.0), row(2, base, 2, 0.5))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 2.0, 2L -> 1.0, 3L -> 1.0))
  }
}
