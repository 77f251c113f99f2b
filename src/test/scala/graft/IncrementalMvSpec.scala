package graft

import graft.streaming.IncrementalMv
import graft.streaming.StreamingEtl.EventRow
import graft.etl.EventsEtl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming materialized-view maintenance: per-batch merge equals the
  * one-shot aggregate, and replays are idempotent (versioned
  * snapshots, not blind re-merging). */
class IncrementalMvSpec extends SparkSpec {

  private def row(id: Long, tsMs: Long, typ: String, v: Double) =
    EventRow(id, new Timestamp(tsMs), id % 7, typ, v, "{}")

  private val base = 1704067200000L
  private val day = 86400000L

  test("three maintained micro-batches equal the one-shot aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_mv").toString
    val ckpt = Files.createTempDirectory("graft_mv_ck").toString
    val batches = Seq(
      Seq(row(1, base, "click", 1.25), row(2, base + 3600000, "view", 2.5)),
      Seq(row(3, base + day, "click", 0.75), row(4, base + 2000, "click", 4.0)),
      Seq(row(5, base + day + 5000, "view", 3.125), row(6, base + 2 * day, "click", 9.5)))
    val stream = MemoryStream[EventRow]
    val q = IncrementalMv.maintain(stream.toDF(), root, ckpt)
    for (b <- batches) { stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    assert(IncrementalMv.latestVersion(spark, root) == 2)
    val got = IncrementalMv.currentSummary(spark, root).get
      .orderBy("event_type", "d").collect().toSeq
    val oneShot = EventsEtl.eventPartials(batches.flatten.toDF())
      .orderBy("event_type", "d").collect().toSeq
    assert(got == oneShot && got.nonEmpty)

    // replay of an already-committed batch: state must not change
    IncrementalMv.mergeBatch(batches(1).toDF(), 1L, root)
    val afterReplay = IncrementalMv.currentSummary(spark, root).get
      .orderBy("event_type", "d").collect().toSeq
    assert(afterReplay == got, "committed replay mutated the summary")

    // crash-retry race: the NEXT batch runs twice (pointer advanced in
    // between) — second run re-derives from the same predecessor and
    // must land byte-identical, not double-count
    val next = Seq(row(7, base + 3 * day, "view", 6.25))
    IncrementalMv.mergeBatch(next.toDF(), 3L, root)
    val after1 = IncrementalMv.currentSummary(spark, root).get
      .orderBy("event_type", "d").collect().toSeq
    IncrementalMv.mergeBatch(next.toDF(), 3L, root) // replay post-commit: skipped
    val after2 = IncrementalMv.currentSummary(spark, root).get
      .orderBy("event_type", "d").collect().toSeq
    assert(after1 == after2)
    val expect = EventsEtl.eventPartials((batches.flatten ++ next).toDF())
      .orderBy("event_type", "d").collect().toSeq
    assert(after2 == expect)

    // time travel: every committed version reads back as the
    // summary-as-of-that-batch (versioned snapshots ARE a history)
    for (v <- batches.indices) {
      val hist = IncrementalMv.snapshotAt(spark, root, v.toLong).get
        .orderBy("event_type", "d").collect().toSeq
      val prefix = EventsEtl.eventPartials(batches.take(v + 1).flatten.toDF())
        .orderBy("event_type", "d").collect().toSeq
      assert(hist == prefix, s"version $v drifted from its prefix aggregate")
    }
    // versions past the pointer clamp to the committed state
    assert(IncrementalMv.snapshotAt(spark, root, 99L).get
      .orderBy("event_type", "d").collect().toSeq == after2)

    // VACUUM: retain the last 2 committed versions (of 0..3); the
    // removed history stops time-travelling, the retained history and
    // the current summary are untouched
    val removed = IncrementalMv.vacuum(spark, root, keepLast = 2)
    assert(removed == Seq(0L, 1L), s"unexpected vacuum victims $removed")
    assert(IncrementalMv.snapshotAt(spark, root, 0L).isEmpty)
    assert(IncrementalMv.snapshotAt(spark, root, 1L).isEmpty)
    assert(IncrementalMv.snapshotAt(spark, root, 2L).nonEmpty)
    assert(IncrementalMv.currentSummary(spark, root).get
      .orderBy("event_type", "d").collect().toSeq == after2)
    // idempotent: a second vacuum with the same retention removes nothing
    assert(IncrementalMv.vacuum(spark, root, keepLast = 2).isEmpty)
  }

  test("sketch MV: streamed theta state == one-shot sketch, replay-proof by set semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    import graft.streaming.SketchMv
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_skmv").toString
    val ckpt = Files.createTempDirectory("graft_skmv_ck").toString
    // overlapping user sets across batches: distinct-count states must
    // NOT add up (that is what makes sketch union the right algebra)
    val batches = Seq(
      Seq(row(1, base, "click", 1.0), row(8, base, "view", 2.0)),
      Seq(row(8, base + day, "click", 1.0), row(15, base + day, "click", 2.0)),
      Seq(row(1, base + 2 * day, "click", 3.0), row(22, base + 2 * day, "view", 4.0)))
    val stream = MemoryStream[EventRow]
    val q = SketchMv.maintain(stream.toDF(), root, ckpt)
    for (b <- batches) { stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = SketchMv.estimates(spark, root).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact regime: estimates are true distinct user counts
    val want = batches.flatten.toDF().groupBy("event_type")
      .agg(countDistinct("user_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream $got != exact $want")
    // and the streamed state is BYTE-identical to a one-shot sketch:
    // theta retained sets are order/batching-independent
    val oneShot = SketchMv.sketchPartials(batches.flatten.toDF()).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    val state = IncrementalMv.currentSummary(spark, root).get.collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(state == oneShot, "streamed sketch state drifted from one-shot build")
    // idempotent algebra: blindly re-merging an already-folded delta
    // (bypassing the version guard) leaves every estimate unchanged
    val remerged = SketchMv.mergeStates(
      IncrementalMv.currentSummary(spark, root).get,
      SketchMv.sketchPartials(batches(1).toDF()))
    graft.functions.GraftFunctions.register(spark)
    val after = remerged.select(col("event_type"),
      expr("theta_estimate(sk)").cast("long").as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == want, "sketch union is not idempotent under replay")
  }
}
