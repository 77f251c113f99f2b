package graft

import graft.streaming.StreamingEtl
import java.nio.file.Files

/** End-to-end streaming over a real file source: stage the events
  * table as arriving files, run the watermarked pipeline to a parquet
  * sink with checkpointing, compare against the batch twin. */
class StreamingFileSpec extends SparkSpec {

  test("file-source stream produces the batch windowed aggregation") {
    // stage a micros-precision copy (streaming schema uses TimestampType)
    val micro = graft.sources.Tables.events(spark, sfDir)
    val microDir = Files.createTempDirectory("graft_stream_us").toString
    micro.write.mode("overwrite").parquet(microDir)
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    val q = StreamingEtl.windowedCounts(
        StreamingEtl.validate(StreamingEtl.readEventStream(spark, microDir)))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(outDir)
    // append mode only emits windows the watermark has closed; every
    // emitted bucket must match the batch computation exactly
    val batch = StreamingEtl.windowedCounts(
      micro.filter(graft.etl.EventsEtl.validPred))
    val gotSet = got.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batchMap = batch.collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(gotSet.nonEmpty, "stream emitted no closed windows")
    gotSet.foreach { case (b, t, n, s) =>
      assert(batchMap((b, t)) == ((n, s)), s"bucket $b/$t diverged")
    }
  }
}
