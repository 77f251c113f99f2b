package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * co-partitioned window afterwards, or the planner can't see the
  * skew in stats).
  *
  * The big (skewed) side gets a random salt in [0, buckets); the small
  * side is exploded `buckets`× so every (key, salt) partition holds a
  * 1/buckets slice of the hot key. Correctness is unchanged — each big
  * row still meets each matching small row exactly once.
  *
  * MEASURED vs AQE (tools/SkewAB, 20M rows / 90% one hot key / 1M-key
  * dim, 5 round-robin reps, local[32]): plain 7.46 s, plain+AQE
  * skew-split 6.51 s, salted(8) 3.75 s, salted(8)+AQE 3.71 s — the
  * salt spreads both the probe and the join OUTPUT ahead of the
  * downstream aggregate, where AQE's split covers the sort-merge read
  * side only; prefer AQE when the hot key isn't knowable at authoring
  * time (and note a cluster narrows the gap: the salt pays dim-side
  * ×buckets replication bytes a network would surface).
  */
object SkewJoin {

  /** Inner-join `big` (skewed on `key`) with `small`, spreading each
    * hot key over `buckets` shuffle partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val exploded = small.withColumn("_salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
