package graft

import graft.streaming.StreamingEtl
import graft.streaming.StreamingEtl.KafkaRecord
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The Kafka ingestion chain, driven over constructed wire-schema
  * frames (no broker in the sandbox — the source builder itself is a
  * three-option readStream; everything after `load()` is covered
  * here). */
class KafkaWireSpec extends SparkSpec {

  private val base = 1704067200000L // 2024-01-01T00:00:00Z

  private def rec(offset: Long, json: String): KafkaRecord =
    KafkaRecord(null, json.getBytes("UTF-8"), "events", 0, offset,
      new Timestamp(base + offset), 0)

  private def eventJson(id: Long, tsMs: Long, uid: Long, typ: String, v: Double) =
    s"""{"event_id": $id, "ts": "${new Timestamp(tsMs)}", "user_id": $uid,""" +
      s""" "event_type": "$typ", "value": $v, "props": "{}"}"""

  test("kafka wire frames decode, quarantine corrupt payloads, validate, keep provenance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    stream.addData(
      rec(1, eventJson(1, base + 1000, 7, "click", 10.0)),   // valid
      rec(2, "not json at all"),                              // corrupt -> shed
      rec(3, eventJson(3, base + 2000, 8, "view", -5.0)),     // fails validation
      rec(4, eventJson(4, base + 3000, 9, "purchase", 20.0))) // valid
    val q = StreamingEtl.kafkaEtl(stream.toDF())
      .writeStream.format("memory").queryName("kafka_clean")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("kafka_clean").collect()
    assert(got.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 4L))
    // provenance survives for sink-side idempotence
    got.foreach { r =>
      assert(r.getAs[String]("topic") == "events")
      assert(Seq(1L, 4L).contains(r.getAs[Long]("offset")))
    }
  }

  test("corrupt payloads are flagged, not dropped, by the parse stage") {
    import spark.implicits._
    val raw = Seq(
      rec(1, eventJson(1, base, 7, "click", 10.0)),
      rec(2, "{\"garbage\": true}"),
      rec(3, "..."))
      .toDF()
    val parsed = StreamingEtl.parseKafkaEvents(raw)
    assert(parsed.count() == 3, "parse stage must preserve every wire record")
    assert(parsed.filter(col("corrupt")).count() == 2)
    assert(parsed.filter(!col("corrupt")).select("event_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("kafka chain to upsert sink: replayed offsets are absorbed idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_kafka_sink").toString
    val stream = MemoryStream[KafkaRecord]
    // the end-to-end at-least-once story: bus replays a batch, the
    // offset-versioned keyed upsert makes the load exactly-once
    val q = StreamingEtl.kafkaEtl(stream.toDF())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.io.Sink.upsertPartitioned(
          batch.withColumn("event_date", to_date(col("ts")).cast("string")),
          out, "event_date", "event_id", "offset")
      }
      .start()
    stream.addData(
      rec(10, eventJson(1, base + 1000, 7, "click", 10.0)),
      rec(11, eventJson(2, base + 2000, 8, "view", 20.0)))
    q.processAllAvailable()
    // the broker re-delivers the same offsets (at-least-once), plus one new record
    stream.addData(
      rec(10, eventJson(1, base + 1000, 7, "click", 10.0)),
      rec(11, eventJson(2, base + 2000, 8, "view", 20.0)),
      rec(12, eventJson(3, base + 3000, 9, "purchase", 30.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
      .select("event_id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 11L, 3L -> 12L),
      s"replayed offsets duplicated or lost rows: $got")
  }

  test("downstream windowed aggregation composes unchanged on the kafka chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KafkaRecord]
    stream.addData(
      rec(1, eventJson(1, base + 60_000, 1, "click", 10.0)),
      rec(2, eventJson(2, base + 120_000, 1, "click", 20.0)),
      rec(3, eventJson(3, base + 660_000, 2, "view", 30.0)))
    val q = StreamingEtl.windowedCounts(StreamingEtl.kafkaEtl(stream.toDF()))
      .writeStream.format("memory").queryName("kafka_win")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("kafka_win")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))).toSet
    assert(got == Set(
      (base, "click", 2L, 3000L),
      (base + 600_000, "view", 1L, 3000L)))
  }
}
