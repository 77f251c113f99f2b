package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SKETCH materialized view: per-type distinct-user theta
  * sketches maintained across micro-batches — the streaming
  * distinct-count pattern at 100 TB, where an exact per-key set is
  * unbounded state but a sketch is O(2^lgK) bytes per group forever.
  *
  * The state algebra is the theta-sketch union, which is
  * associative, commutative AND idempotent (set semantics: re-adding
  * the same keys, or re-unioning the same sketch, is a no-op) — so
  * unlike count/sum MV states (IncrementalMv, which NEEDS versioned
  * snapshots to survive foreachBatch's at-least-once replays), a
  * replayed batch folded twice cannot double-count by construction.
  * The versioned-snapshot discipline is still reused for crash
  * atomicity (a half-written state dir must never be read back), but
  * the spec pins the stronger property: even a blind re-merge of the
  * same delta leaves the state identical.
  */
object SketchMv {

  /** Per-type theta sketch of the batch's distinct users. */
  def sketchPartials(batch: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    batch.filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(expr("theta_agg(user_id)").as("sk"))
  }

  /** Union two sketch-state tables (full outer by type). */
  def mergeStates(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy("event_type")
      .agg(expr("theta_union_agg(sk)").as("sk"))

  import IncrementalMv.{latestVersion, snapshotAt}

  /** Fold one micro-batch into the sketch state (versioned for crash
    * atomicity; semantically idempotent even without the guard). */
  def mergeBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val spark = batch.sparkSession
    val committed = latestVersion(spark, root)
    if (batchId <= committed) return
    val delta = sketchPartials(batch)
    val merged = snapshotAt(spark, root, committed) match {
      case Some(base) => mergeStates(base, delta)
      case None       => delta
    }
    val snap = merged.localCheckpoint(true)
    snap.write.mode("overwrite").parquet(s"$root/v=$batchId")
    IncrementalMv.commitPointer(spark, root, batchId)
  }

  /** Attach the maintainer to an event stream. */
  def maintain(events: DataFrame, root: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => mergeBatch(b, id, root))
      .start()

  /** Read the MV out as per-type distinct-user estimates (exact while
    * each type's user set is under the 2^lgK budget). */
  def estimates(spark: SparkSession, root: String): Option[DataFrame] = {
    graft.functions.GraftFunctions.register(spark)
    IncrementalMv.currentSummary(spark, root).map(_.select(col("event_type"),
      expr("theta_estimate(sk)").cast("long").as("est_users"))
      .orderBy("event_type"))
  }
}
