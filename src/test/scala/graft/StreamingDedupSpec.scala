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

  test("streaming minhash LSH reports near-dups against all prior state, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // distinct ALPHABETIC words — the tokenizer strips digits, so
    // "word1 word2 ..." would collapse to one repeated token
    val words = (0 until 40).map(i =>
      s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}token")
    val a = words.mkString(" ")                      // doc 1
    val b = (words.updated(20, "changed")).mkString(" ") // doc 2: 1-word edit of a
    val c = (1 to 40).map(i => s"other$i").mkString(" ") // doc 3: disjoint
    val stream = MemoryStream[graft.streaming.NearDupStream.DocIn]
    val q = graft.streaming.NearDupStream.nearDupStream(stream.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    stream.addData(
      graft.streaming.NearDupStream.DocIn(1, a),
      graft.streaming.NearDupStream.DocIn(3, c))
    q.processAllAvailable()
    val afterFirst = spark.table("neardup_out").count()
    assert(afterFirst == 0, "disjoint docs in batch 1 must report nothing")
    stream.addData(graft.streaming.NearDupStream.DocIn(2, b))
    q.processAllAvailable()
    val hits = spark.table("neardup_out")
      .select("doc_id", "dup_of", "est_ppm").collect()
    // the later id is the duplicate; estimate reflects the 1-word edit
    assert(hits.nonEmpty, "1-word edit must collide in at least one band")
    assert(hits.forall(r => r.getAs[Long]("doc_id") == 2 && r.getAs[Long]("dup_of") == 1))
    assert(hits.forall(_.getAs[Long]("est_ppm") >= 500000L))
    // replay: re-adding an admitted doc must emit nothing and not
    // perturb state (set-semantics admission)
    val before = spark.table("neardup_out").count()
    stream.addData(graft.streaming.NearDupStream.DocIn(2, b))
    q.processAllAvailable(); q.stop()
    assert(spark.table("neardup_out").count() == before,
      "replayed doc re-reported pairs — admission is not idempotent")
  }

  test("streamed near-dup pairs equal the batch banded-candidate pairs on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus: stream every sf0.001 document in doc_id order across
    // two batches, then compare the distinct pair set with a BATCH
    // recomputation of the same banding + slot-estimate filter
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => graft.streaming.NearDupStream.DocIn(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    val (first, second) = docs.splitAt(docs.length / 2)
    val stream = MemoryStream[graft.streaming.NearDupStream.DocIn]
    val q = graft.streaming.NearDupStream.nearDupStream(stream.toDS())
      .writeStream.format("memory").queryName("neardup_corpus_out")
      .outputMode("append").start()
    stream.addData(first.toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(second.toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("neardup_corpus_out")
      .select("doc_id", "dup_of").distinct().collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    // batch truth: same banding, same slot-match estimate, all pairs
    val sigs = graft.streaming.NearDupStream
      .bandedSignatures(graft.sources.Tables.documents(spark, sfDir))
      .select("doc_id", "sig").distinct().collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val banded = graft.streaming.NearDupStream
      .bandedSignatures(graft.sources.Tables.documents(spark, sfDir))
      .select("band_id", "band_hash", "doc_id").collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
    val want = banded.values.flatMap { bucket =>
      val ids = bucket.map(_.getLong(2)).distinct.sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        sa = sigs(ids(i)); sb = sigs(ids(j))
        m = (0 until 128).count(k => sa(k) == sb(k))
        if m * 1000000L / 128L >= 500000L
      } yield (ids(i), ids(j))
    }.toSet
    assert(streamed == want,
      s"streamed pairs (${streamed.size}) != batch banded truth (${want.size})")
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
