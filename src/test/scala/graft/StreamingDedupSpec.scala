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
}
