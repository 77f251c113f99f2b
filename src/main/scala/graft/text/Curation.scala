package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation decisions a training pipeline executes AFTER
  * dedup/quality signals exist: which copy of a duplicate cluster to
  * keep, how to split train/val/test without near-dup leakage, and how
  * to shuffle the corpus into training shards. All three are exactly
  * SQL-oracle-able: canonical selection is an integer argmax, and both
  * split and shard decisions use the same keyed Knuth-multiplicative
  * pseudo-hash as `sample_stratified` — exact BIGINT arithmetic, so
  * every engine (and every partition layout) agrees bit-for-bit.
  */
object Curation {

  /** Keep-best dedup: within each near-dup cluster keep the HIGHEST
    * QUALITY copy — here the exact word count (integer, ties to min
    * doc_id) rather than `dedup_cluster`'s arbitrary min-id canonical.
    * This is what real pipelines do: near-dup clusters mix a full
    * article with truncated or boilerplate-wrapped copies, and min-id
    * keeps a random one.
    *
    * Shape: cluster labels ride the near-dup pair graph (one CC loop
    * over pair-graph nodes, not the corpus), word counts are one
    * codegen'd pass over the text, and the argmax is a per-cluster
    * window off a single hash exchange on cluster_id. Nothing driver-
    * side, nothing quadratic. */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val nWords = TextOps.docsRepartitioned(spark, dir)
      .select(col("doc_id"), expr("text_profile(text)").getField("n_words").as("n_words"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_words").desc, col("doc_id").asc)
    TextOps.clusterLabels(spark, dir)
      .join(nWords, Seq("doc_id"))
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .withColumn("kept", col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_words"),
        col("canonical_id"), col("kept"))
      .orderBy("doc_id")
  }

  /** Leakage-safe train/val/test split (80/10/10): the split key is a
    * pseudo-hash of the near-dup CLUSTER id, not the document id, so
    * every member of a cluster lands in the same split — hashing doc
    * ids would put a training copy of a validation document in the
    * train set, the classic eval-leakage bug. Thresholds compare
    * key·10 against split·1000003 in exact integers (no doubles, no
    * rounding seam), so assignment is reproducible on any engine and
    * any shard layout. */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val key = ((col("cluster_id") % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)
    TextOps.clusterLabels(spark, dir)
      .withColumn("split_key", key)
      .withColumn("split",
        when(col("split_key") * 10 < lit(8L * 1000003L), lit("train"))
          .when(col("split_key") * 10 < lit(9L * 1000003L), lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("cluster_id"), col("split_key"), col("split"))
      .orderBy("doc_id")
  }

  /** The END-TO-END curation pipeline as ONE declarative DataFrame
    * chain — what a user of the engine actually runs over a raw crawl:
    *
    *   gate (length + language) → exact dedup (md5 canonical) →
    *   near-dup clusters over the SURVIVORS (shingle-Jaccard pair
    *   graph + connected components) → keep-best per cluster →
    *   leakage-safe split for the kept docs.
    *
    * Every doc gets exactly one disposition: `filtered_short`,
    * `filtered_lang`, `dup_exact`, `dup_near`, or `kept` (+ its
    * train/val/test split). Stage composition matters: dedup runs on
    * the gate's survivors only (no cycles wasted clustering filtered
    * junk), and the near-dup graph runs on exact-canonicals only (an
    * exact-dup row can never outrank its canonical anyway). Each stage
    * is the already-plan-audited operator — the pipeline adds
    * dispositions, not new shuffles: one hash exchange per stage key
    * (text_hash, shingle, cluster_id) and the CC loop over pair-graph
    * nodes, never the corpus. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val profiled = TextOps.docsRepartitioned(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"),
        expr("text_profile(text)").getField("n_words").as("n_words"))
    val gated = profiled.withColumn("gstatus",
      when(col("n_words") < 15, "filtered_short")
        .when(col("lang") =!= "en", "filtered_lang"))
    val pass = gated.filter(col("gstatus").isNull)
    val exact = pass
      .withColumn("text_hash", md5(lower(trim(col("text")))))
      .withColumn("exact_canonical",
        min("doc_id").over(Window.partitionBy("text_hash")))
    val canon = exact.filter(col("doc_id") === col("exact_canonical"))
    val pairs = TextOps.jaccardPairsFrom(
        TextOps.shingledFrom(canon.select(col("doc_id"), col("text"))))
      .select("a_id", "b_id")
    val clustered = canon.join(
        TextOps.guardedComponents(pairs), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
    val best = clustered.withColumn("best_id",
      first("doc_id").over(Window.partitionBy("cluster_id")
        .orderBy(col("n_words").desc, col("doc_id"))))
    val splitKey = ((col("cluster_id") % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)
    val nullLong = lit(null).cast("long")
    val nullStr = lit(null).cast("string")
    gated.filter(col("gstatus").isNotNull)
      .select(col("doc_id"), col("gstatus").as("status"),
        nullLong.as("cluster_id"), nullStr.as("split"))
      .unionByName(exact.filter(col("doc_id") =!= col("exact_canonical"))
        .select(col("doc_id"), lit("dup_exact").as("status"),
          nullLong.as("cluster_id"), nullStr.as("split")))
      .unionByName(best.filter(col("doc_id") =!= col("best_id"))
        .select(col("doc_id"), lit("dup_near").as("status"),
          col("cluster_id"), nullStr.as("split")))
      .unionByName(best.filter(col("doc_id") === col("best_id"))
        .select(col("doc_id"), lit("kept").as("status"), col("cluster_id"),
          when(splitKey * 10 < lit(8L * 1000003L), "train")
            .when(splitKey * 10 < lit(9L * 1000003L), "val")
            .otherwise("test").as("split")))
      .orderBy("doc_id")
  }

  val Shards = 8

  /** Deterministic global shuffle into training shards: the
    * write-shuffled-shards step before training. Shard = keyed
    * pseudo-hash mod `Shards`; within-shard order = (key, doc_id) —
    * a reproducible pseudo-random permutation with NO global sort AND
    * no task that scales with shard size: a window partitioned only by
    * shard would funnel each shard through ONE task (a 12 TB sort per
    * task at 100 TB / 8 shards), so the position is a two-phase prefix
    * sum instead — ranks local to (shard, key-range sub-bucket), plus
    * a one-row-per-sub-bucket offset table (bounded: Shards × 1000003/
    * `SubBucket` rows, data-size-independent). Sub-buckets are key
    * RANGES, so their concatenation in bucket order IS the (key,
    * doc_id) order and the final position is exact. Re-running on any
    * input layout yields the identical permutation. */
  def globalShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val key = ((col("doc_id") % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)
    val SubBucket = 65536L // key-range width per sub-bucket
    val keyed = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("shard_key", key)
      .withColumn("shard", col("shard_key") % lit(Shards.toLong))
      .withColumn("bucket", expr(s"shard_key div $SubBucket"))
    // phase 1: rank within each (shard, key-range) cell — distributed
    val inCell = Window.partitionBy("shard", "bucket")
      .orderBy(col("shard_key"), col("doc_id"))
    val local = keyed.withColumn("local_rank", row_number().over(inCell).cast("long"))
    // phase 2: per-cell counts → prefix offsets within the shard
    // (tiny: one row per occupied cell, windowed per shard)
    val byShardBucket = Window.partitionBy("shard").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("shard", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("cell_offset", coalesce(sum("n").over(byShardBucket), lit(0L)))
      .select("shard", "bucket", "cell_offset")
    local.join(broadcast(offsets), Seq("shard", "bucket"))
      .withColumn("pos", col("cell_offset") + col("local_rank"))
      .select(col("doc_id"), col("shard"), col("shard_key"), col("pos"))
      .orderBy("doc_id")
  }

  /** Deterministic round-robin source interleave — the training-order
    * primitive: a corpus mixed from S sources must reach the trainer
    * with sources evenly spread (a run of one source is a curriculum
    * accident), and the order must be REPRODUCIBLE so a restarted job
    * reads the same stream. Every doc gets an interleave key
    *
    *   key = (rank_within_source − 1) · S + source_index
    *
    * (rank by doc_id inside its source, sources indexed
    * alphabetically): sorting by key emits source₀'s first doc, then
    * source₁'s, …, round-robin until a source exhausts, after which
    * its slots simply vanish from the (still totally-ordered) key
    * space. The within-source rank is the two-phase bucketed
    * row_number — NO per-source global window (one source can be half
    * the corpus: a hot-key sort in window form); the source-index
    * table is a bounded broadcast. Swapping the rank key to
    * quality-desc turns the same plan into curriculum ordering. */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val srcIdx = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val s = srcIdx.count() // bounded: |sources|
    val idxW = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    val indexed = srcIdx
      .withColumn("src_idx", coalesce(count(lit(1)).over(idxW), lit(0L)))
      .select("source", "src_idx")
    val ranked = graft.analytics.Analytics.twoPhaseRowNumber(
      docs, Seq("source"), "doc_id", "doc_id", expr("doc_id div 1000"),
      asc = true, out = "src_rank")
    ranked.join(broadcast(indexed), Seq("source"))
      .withColumn("interleave_key", (col("src_rank") - 1) * lit(s) + col("src_idx"))
      .select("doc_id", "source", "src_rank", "src_idx", "interleave_key")
      .orderBy("interleave_key")
  }
}
