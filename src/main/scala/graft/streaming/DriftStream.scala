package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor: live total-variation distance
  * against a broadcast REFERENCE histogram — the streaming companion
  * of the batch TVD snapshot diff (`MlEval.drift`), answering "has
  * this source's value distribution moved off its training-time
  * profile?" while the stream runs.
  *
  * State per event type is a clamped-bucket count map — bucket =
  * floor(value/5) clamped into [0, 127], so state is ≤ 128 longs per
  * key FOREVER regardless of value range or stream length (the same
  * bounded-state discipline as stream_hh's ≤k counters; an unclamped
  * bucket domain would let one adversarial value-sweep grow the state
  * without limit). The reference rides the closure/broadcast exactly
  * like an exported model artifact: corpus-constant, never shuffled.
  *
  * Every `every`-th fold per type emits the exact integer-ppm TVD
  *
  *   tvd_ppm = Σ_b |live_b·refN − ref_b·liveN| · 10⁶ / (2·liveN·refN)
  *
  * computed in BigInt (cross-multiplied — no per-bucket FP division,
  * so replays and partition layouts reproduce identical bits). Fold
  * order is pinned to (ts_us, event_id) like the anomaly stream;
  * at-least-once re-delivery re-folds counts (compose with the keyed
  * stream_dedup stage for exactly-once, same contract as stream_hh). */
object DriftStream {

  final case class ValueIn(event_id: Long, ts_us: Long, event_type: String,
      value: Double)
  final case class HistState(counts: Map[Long, Long], n: Long)
  final case class DriftOut(event_type: String, n_seen: Long, tvd_ppm: Long)

  val MaxBucket = 127L

  def bucketOf(value: Double): Long =
    math.min(math.max(math.floor(value / 5.0).toLong, 0L), MaxBucket)

  def tvdPpm(live: Map[Long, Long], liveN: Long,
      ref: Map[Long, Long], refN: Long): Long = {
    if (liveN == 0L || refN == 0L) return 0L
    val buckets = live.keySet ++ ref.keySet
    val num = buckets.iterator.map { b =>
      (BigInt(live.getOrElse(b, 0L)) * refN - BigInt(ref.getOrElse(b, 0L)) * liveN).abs
    }.sum
    (num * 1000000 / (BigInt(2) * liveN * refN)).toLong
  }

  /** Emits the live-vs-reference TVD after every `every`-th event of
    * each type. `ref` maps event_type → (bucket → count); types absent
    * from the reference score against an empty histogram (tvd 0 by
    * the 0-denominator guard — they surface through volume monitors,
    * not shape monitors). */
  def driftStream(ds: Dataset[ValueIn], ref: Map[String, Map[Long, Long]],
      every: Long = 50L): Dataset[DriftOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[HistState, DriftOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (typ, rows, state: GroupState[HistState]) =>
          var st = state.getOption.getOrElse(HistState(Map.empty, 0L))
          val refH = ref.getOrElse(typ, Map.empty[Long, Long])
          val refN = refH.valuesIterator.sum
          val out = scala.collection.mutable.ArrayBuffer[DriftOut]()
          for (r <- rows.toSeq.sortBy(x => (x.ts_us, x.event_id))) {
            val b = bucketOf(r.value)
            st = HistState(st.counts.updated(b, st.counts.getOrElse(b, 0L) + 1L),
              st.n + 1L)
            if (st.n % every == 0L)
              out += DriftOut(typ, st.n, tvdPpm(st.counts, st.n, refH, refN))
          }
          state.update(st)
          out.iterator
      }
  }
}
