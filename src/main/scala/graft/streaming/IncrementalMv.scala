package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.EventsEtl

/** Streaming materialized-view maintenance: each micro-batch folds
  * into the per-(type, day) summary through the SAME partial-state
  * algebra as the batch `etl_incremental_agg` — count / integer-cents
  * sum / min-max merge, never a base rescan.
  *
  * Exactly-once under foreachBatch's at-least-once contract comes from
  * VERSIONED snapshots, not a mutable table: batch b writes its merged
  * state to `<path>/v=<b>` and then advances the `_latest` pointer.
  * A replayed batch recomputes from the SAME predecessor snapshot and
  * overwrites the SAME version directory — byte-identical, so replays
  * and crash-retry races are idempotent by construction (the
  * transaction-log pattern a table format provides, reduced to one
  * pointer file). Blind re-merging into a mutable summary would
  * double-count on every replay; count/sum states are not naturally
  * idempotent.
  */
object IncrementalMv {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def latestPath(root: String) = new Path(s"$root/_latest")

  /** The committed version number, or -1 before the first commit. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val lp = latestPath(root)
    val f = fs(spark, lp)
    if (!f.exists(lp)) -1L
    else {
      val in = f.open(lp)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** The current summary table (empty-schema'd if nothing committed). */
  def currentSummary(spark: SparkSession, root: String): Option[DataFrame] =
    snapshotAt(spark, root, latestVersion(spark, root))

  /** Time travel for free: versioned snapshots ARE a history, so any
    * committed version reads back as the summary-as-of-that-batch.
    * Versions above the committed pointer are invisible (a crashed
    * write may have left a partial dir there). */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Option[DataFrame] = {
    val committed = latestVersion(spark, root)
    val v = math.min(version, committed)
    if (v < 0) None
    else {
      val p = new Path(s"$root/v=$v")
      if (fs(spark, p).exists(p)) Some(spark.read.parquet(p.toString)) else None
    }
  }

  /** Fold one micro-batch of raw events into the summary. Idempotent
    * per batchId: a replay re-derives the same snapshot from the same
    * predecessor and re-writes the same directory; a batch at or below
    * the committed version is skipped outright. */
  def mergeBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val spark = batch.sparkSession
    val committed = latestVersion(spark, root)
    if (batchId <= committed) return // replayed after commit: done
    val delta = EventsEtl.eventPartials(batch)
    val merged = currentSummary(spark, root) match {
      case Some(base) => EventsEtl.mergePartials(base, delta)
      case None       => delta
    }
    // materialize BEFORE touching the target version dir (a replay may
    // be overwriting a partial crash leftover it would otherwise read)
    val snap = merged.localCheckpoint(true)
    snap.write.mode("overwrite").parquet(s"$root/v=$batchId")
    commitPointer(spark, root, batchId)
  }

  /** Advance the `_latest` pointer (shared with SketchMv). */
  private[streaming] def commitPointer(spark: SparkSession, root: String,
      batchId: Long): Unit = {
    val lp = latestPath(root)
    val f = fs(spark, lp)
    val out = f.create(lp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Attach the maintainer to an event stream. */
  def maintain(events: DataFrame, root: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => mergeBatch(b, id, root))
      .start()

  /** Snapshot retention (VACUUM): drop committed versions older than
    * the `keepLast` most recent, never touching the `_latest` pointer,
    * the version it names, or uncommitted (crash-leftover) dirs above
    * it — the history of a versioned table grows forever without this,
    * and table formats ship the same operation for the same reason.
    * Time travel keeps working for every retained version; vacuuming
    * below the pointer can never break a replay, because replays only
    * re-derive versions ABOVE the committed pointer. Returns the
    * versions removed. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 3): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the committed snapshot")
    val committed = latestVersion(spark, root)
    if (committed < 0) return Seq.empty
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val versions = f.listStatus(rootPath).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .map(p => p.getName.stripPrefix("v=").toLong)
      .filter(_ <= committed) // never touch uncommitted leftovers
      .sorted
    val victims = versions.dropRight(keepLast)
    victims.foreach(v => f.delete(new Path(s"$root/v=$v"), true))
    victims
  }
}
