package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection: PREQUENTIAL z-score against per-type
  * keyed Welford state — the live companion of the batch median/MAD
  * fences (`Analytics.robustAnomalies`). Each event is scored against
  * the distribution of everything seen BEFORE it (one-step-ahead
  * evaluation — scoring a point against statistics that already
  * include it both dilutes the outlier and contaminates the baseline),
  * then folded into the state.
  *
  * State per event type is three numbers (n, mean, M2) forever —
  * Welford's update is the numerically-stable single-pass form, and
  * the state never grows with the stream. That bounded state is why
  * the streaming side uses mean/sigma rather than the batch side's
  * median/MAD: exact streaming medians need the full value multiset
  * (unbounded), and the robust-vs-bounded trade is the standard one —
  * the batch pass re-scores history with 50%-breakdown fences, the
  * stream flags live with O(1) state per key.
  *
  * Intra-batch fold order is pinned to (ts_us, event_id) so replays
  * and partition layouts produce identical scores; state is
  * hash-partitioned by event_type across executors (each type's fold
  * is sequential by construction, types run in parallel).
  *
  * Replay semantics: at-least-once re-delivery re-folds values (the
  * moments inflate), same contract as the anonymous count sketches
  * (stream_hh) — exactly-once scoring composes with the keyed
  * stream_dedup stage upstream. */
object AnomalyStream {

  final case class ValueIn(event_id: Long, ts_us: Long, event_type: String,
      value: Double)
  final case class MomentState(n: Long, mean: Double, m2: Double)
  final case class AnomalyOut(event_id: Long, event_type: String,
      value: Double, z_milli: Long, n_before: Long)

  /** Flags events whose one-step-ahead |z| exceeds `zThreshold`, once
    * the type has at least `minN` prior observations. z is emitted in
    * integer milli-units (round-half-up) so downstream comparisons are
    * layout-stable. */
  def anomalyStream(ds: Dataset[ValueIn], zThreshold: Double = 4.0,
      minN: Long = 30L): Dataset[AnomalyOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (typ, rows, state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer[AnomalyOut]()
          for (r <- rows.toSeq.sortBy(x => (x.ts_us, x.event_id))) {
            if (st.n >= minN && st.m2 > 0.0) {
              val sigma = math.sqrt(st.m2 / st.n)
              val z = (r.value - st.mean) / sigma
              if (math.abs(z) > zThreshold)
                out += AnomalyOut(r.event_id, typ, r.value,
                  math.rint(z * 1000).toLong, st.n)
            }
            val n1 = st.n + 1
            val d = r.value - st.mean
            val mean1 = st.mean + d / n1
            st = MomentState(n1, mean1, st.m2 + d * (r.value - mean1))
          }
          state.update(st)
          out.iterator
      }
  }
}
