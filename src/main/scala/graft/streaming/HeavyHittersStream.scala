package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a Misra-Gries summary as keyed streaming
  * state — the live twin of the batch two-pass operator
  * (graft.ops.HeavyHitters), sharing its reduce/merge arithmetic so
  * the two paths cannot drift. Per group the state is AT MOST k
  * counters forever (Agarwal et al., "Mergeable Summaries", PODS'12),
  * while an exact streaming groupBy-count would grow state with the
  * live vocabulary — unbounded on an open-ended stream. Each
  * micro-batch folds its items into the summary via the textbook
  * reduce step and emits the current candidate set with the error
  * envelope (true count ∈ [est, est + n/(k+1)]), i.e. every item with
  * frequency > n/(k+1) is guaranteed present — the same completeness
  * bound the batch pass-1 relies on before its exact verify.
  *
  * Update-mode emission: each batch re-reports its groups' current
  * summaries (a monitoring surface, not an append log). State is
  * hash-partitioned by group across executors; within a group the
  * fold is sequential by construction — which is exactly MG's
  * contract: it is a SEQUENTIAL summary made distributed by the
  * mergeable groupwise state, not by sharing counters.
  *
  * Replay semantics: items carry no identity, so an at-least-once
  * replayed micro-batch re-folds its items (counts inflate by the
  * replayed mass — unlike stream_neardup, whose doc_ids make
  * admission idempotent). That is the inherent contract of anonymous
  * count sketches under at-least-once delivery; exactly-once counts
  * need a keyed upstream dedup (stream_dedup) or an idempotent sink. */
object HeavyHittersStream {

  final case class ItemIn(group: String, item: String)
  final case class HHState(n: Long, counters: Map[String, Long])
  final case class HHOut(group: String, item: String, est: Long,
      n_seen: Long, err_bound: Long)

  def heavyHittersStream(ds: Dataset[ItemIn], k: Int = 50,
      topReport: Int = 10): Dataset[HHOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val mg = graft.ops.HeavyHitters.MisraGries(k)
    ds.groupByKey(_.group)
      .flatMapGroupsWithState[HHState, HHOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (grp, rows, state: GroupState[HHState]) =>
          val prev = state.getOption.getOrElse(HHState(0L, Map.empty))
          var m = prev.counters
          var n = prev.n
          // deterministic intra-batch fold order: MG is order-sensitive
          // in its intermediate states (not in its guarantee), and a
          // layout-dependent fold would make replays diverge
          for (r <- rows.toSeq.sortBy(_.item)) {
            m = mg.reduce(m, r.item)
            n += 1L
          }
          state.update(HHState(n, m))
          val bound = n / (k + 1L)
          m.toSeq.sortBy { case (w, c) => (-c, w) }.take(topReport)
            .map { case (w, c) => HHOut(grp, w, c, n, bound) }
            .iterator
      }
  }
}
