package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate admission: MinHash-banded LSH as live
  * Structured-Streaming state — the incremental twin of the batch
  * `dedup_minhash` path (TextOps.scala bandedMinhash: identical 32×4
  * banding over the same fused minhash128 signature), solving the
  * problem a batch index cannot: documents arrive continuously and
  * each must be checked against EVERYTHING admitted before it,
  * without ever rescanning the corpus.
  *
  * Shape: signature + band keys are computed in the micro-batch scan
  * (codegen expressions, no state); each band bucket is a keyed state
  * cell holding its occupants' (doc_id, signature). An arriving doc
  * compares against its bucket's occupants only — the LSH guarantee
  * bounds that to probable near-duplicates, never the corpus. State is
  * hash-partitioned across executors by bucket key, so both memory and
  * compare work scale out; at production scale occupancy is bounded by
  * TTL eviction or keep-the-canonical-only compaction (documented
  * dial — this operator keeps full buckets, the exact regime).
  *
  * Replay idempotence: admission is set-semantics (a doc_id already in
  * its bucket is skipped, emitting nothing), so an at-least-once
  * replayed micro-batch cannot double-report pairs or grow state.
  * Similarity is the slot-match estimate (#equal slots / 128 ≈
  * Jaccard); the same pair surfacing via several bands is emitted per
  * band and deduped by the consumer on (doc_id, dup_of) — the
  * standard LSH serving contract. */
object NearDupStream {

  final case class DocIn(doc_id: Long, text: String)
  final case class BandMsg(band_id: Int, band_hash: Long, doc_id: Long, sig: Seq[Long])
  final case class BucketState(docs: List[(Long, Seq[Long])])
  final case class NearDupHit(doc_id: Long, dup_of: Long, band_id: Int, est_ppm: Long)

  /** Band explosion for a (streaming or batch) doc frame — identical
    * banding arithmetic to TextOps.bandedMinhash. */
  def bandedSignatures(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), expr("minhash128(word_shingles3(text))").as("sig"))
      .filter(size(col("sig")) === 128)
      .select(col("doc_id"), col("sig"),
        explode(array((0 until 32).map(i =>
          struct(lit(i).as("band_id"),
            hash((i * 4 until i * 4 + 4).map(j =>
              element_at(col("sig"), j + 1)): _*).as("band_hash"))): _*)).as("b"))
      .select(col("b.band_id").as("band_id"), col("b.band_hash").as("band_hash"),
        col("doc_id"), col("sig"))
  }

  /** Production state dials (both previously narrated, now code):
    *
    *  - `ttlMs > 0`: processing-time TTL per bucket — a bucket idle for
    *    the TTL is evicted via the GroupStateTimeout callback (the
    *    standard flatMapGroupsWithState eviction), bounding total state
    *    by the stream's RECENT key cardinality instead of its history.
    *    A replay AFTER eviction re-admits (at-least-once semantics, the
    *    same contract every TTL'd dedup store ships); replays within
    *    the TTL stay exactly idempotent for docs STILL IN the kept set
    *    (set-semantics admission). With `maxOccupancy > 0` that
    *    qualifier matters: a doc evicted by canonical compaction loses
    *    its admission record, so its replay re-admits and re-emits hits
    *    against the canonicals even inside the TTL window — compaction
    *    trades replay idempotency for evicted non-canonicals alongside
    *    the recall caveat below. Consumers already dedupe on
    *    (doc_id, dup_of), which absorbs both re-admission paths.
    *  - `maxOccupancy > 0`: per-bucket canonical compaction — keep only
    *    the K EARLIEST-admitted occupants (the canonical
    *    representatives; arrivals matching them still report as dups),
    *    bounding the hot-bucket blowup a boilerplate-heavy stream
    *    creates: a bucket every boilerplate page hashes into otherwise
    *    grows with the stream. Admission checks still run against the
    *    kept set, so pair REPORTS against canonicals are unaffected;
    *    what's traded away is dup-of-dup pairs among evicted
    *    non-canonicals — the declared recall contract (the streaming
    *    analogue of the batch df-capped shingle twins). */
  def nearDupStream(ds: Dataset[DocIn], tauPpm: Long = 500000L,
      ttlMs: Long = 0L, maxOccupancy: Int = 0): Dataset[NearDupHit] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bandedSignatures(ds.toDF()).as[BandMsg]
      .groupByKey(m => (m.band_id, m.band_hash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, timeout) {
        case ((band, _), msgs, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // TTL eviction: the bucket's occupants age out together
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.docs).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            // deterministic intra-batch order: ids admit low-to-high, so
            // a batch containing both halves of a pair reports the later
            // id as the duplicate — same keep-first rule as the batch ops
            for (m <- msgs.toSeq.sortBy(_.doc_id)) {
              if (!seen.exists(_._1 == m.doc_id)) {
                for ((id, sig) <- seen) {
                  var matches = 0
                  var i = 0
                  while (i < 128) { if (sig(i) == m.sig(i)) matches += 1; i += 1 }
                  val ppm = matches * 1000000L / 128L
                  if (ppm >= tauPpm) out += NearDupHit(m.doc_id, id, band, ppm)
                }
                seen = (m.doc_id, m.sig) :: seen
              }
            }
            // canonical compaction: `seen` is newest-first, so the K
            // earliest-admitted occupants are its tail
            val kept =
              if (maxOccupancy > 0 && seen.size > maxOccupancy)
                seen.takeRight(maxOccupancy)
              else seen
            state.update(BucketState(kept))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }
}
