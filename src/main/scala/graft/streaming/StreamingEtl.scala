package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.etl.EventsEtl

/** Structured Streaming twin of the reference's pub/sub pipeline
  * (Part1 subscriber_project.py, Part2 subscriber.py, Part3
  * stop_event_subscriber.py): subscribe → validate → derive → load
  * becomes readStream → filter → watermark/window or stateful map →
  * writeStream.
  *
  * The same validation predicate and window semantics as the batch
  * path (EventsEtl / Analytics.windowedAgg) — one set of business
  * rules, two execution modes.
  */
object StreamingEtl {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based stream source over an events-shaped parquet directory —
    * the stand-in for the pub/sub subscription. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Streaming validation — identical predicate to the batch clean. */
  def validate(df: DataFrame): DataFrame = df.filter(EventsEtl.validPred)

  /** Streaming quarantine side-output: each micro-batch splits on the
    * SHARED validation predicate — clean rows append to `cleanPath`,
    * rejects land in `quarantinePath` tagged with the first failing
    * rule and the batch id. Nothing is silently dropped (the reference
    * prints rejects and discards them); one cached pass per batch
    * feeds both writes. */
  def quarantineSink(df: DataFrame, cleanPath: String,
      quarantinePath: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val b = batch.persist()
      try {
        b.filter(EventsEtl.validPred)
          .write.mode("append").parquet(cleanPath)
        b.filter(EventsEtl.invalidPred)
          .withColumn("reason", EventsEtl.reasonCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(quarantinePath)
      } finally { b.unpersist(); () }
    }.start()

  /** The wire schema Spark's Kafka source emits — one row per record
    * with binary key/value and (topic, partition, offset) provenance.
    * Typed here so the parse/validate chain is testable with
    * constructed frames even where no broker (or connector jar)
    * exists. */
  final case class KafkaRecord(key: Array[Byte], value: Array[Byte],
      topic: String, partition: Int, offset: Long,
      timestamp: java.sql.Timestamp, timestampType: Int)

  /** Real message-bus subscription — the direct twin of the reference's
    * Pub/Sub receiver (`Part2/data_gather.py:26-34`,
    * `Part2/subscriber.py`). Requires the spark-sql-kafka connector on
    * the runtime classpath (not shipped in this sandbox); everything
    * downstream of `load()` is the wire schema above, and the full
    * parse → quarantine → validate chain is spec-gated on constructed
    * wire frames. maxOffsetsPerTrigger bounds a micro-batch the way
    * maxFilesPerTrigger does for the file source. */
  def readKafkaStream(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()

  /** Kafka wire frame → typed event rows: JSON-decode the value bytes
    * against the event schema, carry (topic, partition, offset)
    * provenance for sink-side idempotence, and flag undecodable
    * payloads (`corrupt`) instead of dropping them — the quarantine
    * contract of the batch path, streaming mode. */
  def parseKafkaEvents(raw: DataFrame): DataFrame =
    raw.select(
        from_json(col("value").cast("string"), eventSchema).as("e"),
        col("topic"), col("partition"), col("offset"))
      .withColumn("corrupt", col("e").isNull || col("e.event_id").isNull)
      .select(col("e.event_id").as("event_id"), col("e.ts").as("ts"),
        col("e.user_id").as("user_id"), col("e.event_type").as("event_type"),
        col("e.value").as("value"), col("e.props").as("props"),
        col("topic"), col("partition"), col("offset"), col("corrupt"))

  /** The full bus-to-clean chain: decode, shed corrupt payloads, apply
    * the shared validation predicate. Output schema = event columns +
    * provenance; any downstream stage (windowedCounts, dedupStream,
    * statefulSessions) composes unchanged. */
  def kafkaEtl(raw: DataFrame): DataFrame =
    validate(parseKafkaEvents(raw).filter(!col("corrupt")).drop("corrupt"))

  /** Watermarked 10-minute tumbling aggregation (streaming twin of
    * Analytics.windowedAgg): late data beyond 30 min is dropped and
    * state is bounded, so this runs indefinitely at cluster scale. */
  def windowedCounts(df: DataFrame): DataFrame =
    df.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_cents"))

  /** Live rolling actives — the streaming twin of q_active_users'
    * WAU: exact distinct users per 7-day window sliding daily, as a
    * CHAINED pair of windowed stateful aggregations (Spark 4 supports
    * stateful-after-stateful on aligned event-time windows): stage 1
    * groups (window × user) — the distinct-dedup stage, since
    * streaming forbids countDistinct directly — and stage 2 counts
    * the surviving (window, user) rows per window. Watermark bounds
    * BOTH states; per-window state is the distinct-user set exactly
    * like the batch op's fan-out contribution table. */
  def rollingActives(df: DataFrame): DataFrame = {
    val perUser = df
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
    perUser
      .groupBy(col("w"))
      .agg(count(lit(1)).as("actives"), sum("n_ev").as("n_events"))
      .select(col("w.start").as("win_start"), col("actives"), col("n_events"))
  }

  /** Streaming keep-first dedup (the trip-dimension build of the
    * reference, streaming mode): watermark bounds the dedup state so
    * it runs indefinitely; within the watermark a key's first arrival
    * wins and later duplicates are dropped. */
  def dedupStream(df: DataFrame): DataFrame =
    df.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id")

  /** Watermarked stream-stream interval join: each 'error' event joined
    * to the same user's 'click' events in the preceding 5 minutes — the
    * streaming twin of Analytics.rangeJoinBinned. Both inputs carry
    * event-time watermarks and the join condition bounds c_ts relative
    * to the error's ts on both ends, so the engine can evict click
    * state older than watermark − 5 min: state stays bounded on an
    * unbounded stream. */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        round(col("value") * 100).cast("long").as("c_cents"))
    val e = errors.withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("user_id"), col("ts"))
    e.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 5 MINUTES") &&
        col("c_ts") <= col("ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("c_ts"), col("c_cents"))
  }

  /** Streaming session windows (30-min gap): the streaming mode of
    * Analytics.sessionWindow. The watermark closes a session once no
    * event can extend it, so append mode emits each session exactly
    * once with final counts — per-key session state is bounded by the
    * watermark horizon. */
  def sessionCounts(df: DataFrame): DataFrame =
    df.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_cents"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class SpeedState(lastTsUs: Long, lastValue: Double)
  final case class SpeedOut(event_id: Long, user_id: Long, speed: Option[Double])

  final case class SessionState(startMs: Long, lastMs: Long, n: Long, sumCents: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_cents: Long)

  /** Hand-rolled session state machine via flatMapGroupsWithState +
    * EventTimeTimeout — the arbitrary-per-key-state API the native
    * session_window can't reach (custom close conditions, side outputs,
    * enrichment). A session closes two ways: a later event of the same
    * key arrives past the gap (emitted inline), or the WATERMARK passes
    * last-event + gap with no successor (emitted from the timeout
    * callback). State: one 4-field tuple per open session per key. */
  def statefulSessions(ds: Dataset[EventRow], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    ds.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          def close(s: SessionState) = SessionOut(uid, s.startMs, s.lastMs, s.n, s.sumCents)
          if (state.hasTimedOut) {
            val done = close(state.get)
            state.remove()
            Iterator(done)
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            for (r <- sorted) {
              val tMs = r.ts.getTime
              val cents = math.round(r.value * 100)
              cur match {
                case Some(s) if tMs - s.lastMs > gapMs =>
                  out += close(s)
                  cur = Some(SessionState(tMs, tMs, 1L, cents))
                case Some(s) =>
                  // max, not tMs: a late-but-within-watermark event from
                  // a later micro-batch must not move the session's
                  // frontier BACKWARD — that would split the session at
                  // the next on-time event and emit a shrunken end_ms
                  cur = Some(SessionState(math.min(s.startMs, tMs),
                    math.max(s.lastMs, tMs), s.n + 1, s.sumCents + cents))
                case None =>
                  cur = Some(SessionState(tMs, tMs, 1L, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Stream-static dimension enrichment: each micro-batch of the event
    * stream joins the STATIC user-dimension table (the broadcast-join
    * pattern for streaming fact enrichment — no state, no watermark:
    * the static side re-reads per batch, so dimension updates between
    * batches are picked up, which is exactly the lookup-table
    * contract). Output keeps provenance (dim match or not) instead of
    * silently inner-joining away unknown keys. */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame = {
    // match flag from an injected marker, not a dim payload column: a
    // NULL-valued dim attribute would misreport a successful join as
    // unmatched, and the flag stays schema-agnostic for any dim frame
    val marked = dim.withColumn("dim_matched_marker", lit(true))
    events.join(
      org.apache.spark.sql.functions.broadcast(marked), Seq("user_id"), "left")
      .withColumn("dim_matched",
        coalesce(col("dim_matched_marker"), lit(false)))
      .drop("dim_matched_marker")
  }

  /** Late-data audit off the engine's own per-batch state-operator
    * metrics: total rows silently dropped by the watermark and the
    * current state-row footprint, summed across a query's recent
    * progress — the "are we losing late data, and is state bounded"
    * numbers an operator watches on any watermarked aggregation. No
    * extra pass over the data: the numbers ride the progress events
    * the engine already emits. */
  def watermarkAudit(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val ops = q.recentProgress.flatMap(_.stateOperators)
    val dropped = ops.map(_.numRowsDroppedByWatermark).sum
    val stateRows = ops.lastOption.map(_.numRowsTotal).getOrElse(0L)
    (dropped, stateRows)
  }

  final case class DebounceState(lastRawTsUs: Long)
  final case class DebounceOut(event_id: Long, user_id: Long, ts_us: Long)

  /** Streaming debounce — the keyed-state twin of EventsEtl.debounce:
    * an event is a burst LEAD (emitted) iff its gap from the previous
    * RAW event of the same (user, action) key is ≥ the gap (2 h
    * default, matching the batch twin); state is one timestamp per
    * key, updated on every event whether emitted or not, so batch and
    * stream agree row-for-row on in-order input (spec-pinned). */
  def debounceStream(ds: Dataset[EventRow],
      gapUs: Long = 7200L * 1000000L): Dataset[DebounceOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.user_id, r.event_type))
      .flatMapGroupsWithState[DebounceState, DebounceOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[DebounceState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var lastRaw = state.getOption.map(_.lastRawTsUs)
          val out = scala.collection.mutable.ArrayBuffer.empty[DebounceOut]
          for (r <- sorted) {
            val tsUs = r.ts.getTime * 1000L
            val isLead = lastRaw.forall(p => tsUs - p >= gapUs)
            if (isLead) out += DebounceOut(r.event_id, r.user_id, tsUs)
            lastRaw = Some(tsUs)
          }
          lastRaw.foreach(t => state.update(DebounceState(t)))
          out.iterator
      }
  }

  /** Stateful per-key speed derivation (streaming twin of
    * EventsEtl.deriveSpeed): keyed state holds the previous
    * (ts, value); each arriving event emits Δvalue/Δt against it.
    * State is one tuple per key — bounded regardless of stream length. */
  def statefulSpeed(ds: Dataset[EventRow]): Dataset[SpeedOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SpeedState, SpeedOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[SpeedState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var prev = state.getOption
          val out = sorted.map { r =>
            val tsUs = r.ts.getTime * 1000L
            val speed = prev.flatMap { p =>
              val dtUs = tsUs - p.lastTsUs
              if (dtUs > 0) Some(math.max(0.0,
                (r.value - p.lastValue) / (dtUs / 1000000.0)))
              else None
            }
            prev = Some(SpeedState(tsUs, r.value))
            SpeedOut(r.event_id, r.user_id, speed)
          }
          state.update(prev.get)
          out.iterator
      }
  }
}
