package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED inverted shingle index an incremental ingest owns —
  * `dedupIncremental` recomputes the corpus index per run (correct, but
  * the index side still shuffles); at 100 TB the index is built once,
  * stored BUCKETED AND SORTED on the shingle hash, and every arriving
  * batch joins against it with NO exchange and NO sort on the index
  * side — only the batch (orders of magnitude smaller) moves. Index
  * maintenance is append-only: admitted batches bucket-append their own
  * shingles (same bucket spec ⇒ co-location is preserved).
  */
object ShingleIndex {

  /** (doc_id, n_sh, sh) exploded index rows for a set of documents. */
  private def indexRows(docs: DataFrame): DataFrame = {
    val shingled = docs
      .select(col("doc_id"), expr("word_shingles3(text)").as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh_str"))
    shingled.select(col("doc_id"), col("n_sh"), xxhash64(col("sh_str")).as("sh"))
  }

  /** Build (or rebuild) the index table over the existing corpus
    * (doc_id ≢ 7 mod 10 — the same split `dedupIncremental` uses),
    * bucketed and sorted by shingle hash. */
  def build(spark: SparkSession, dir: String,
      table: String = "shingle_index", buckets: Int = 8): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val existing = graft.sources.Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) =!= 7)
    indexRows(existing)
      .write.bucketBy(buckets, "sh").sortBy("sh")
      .mode(SaveMode.Overwrite).saveAsTable(table)
  }

  /** The arriving batch's exploded shingle rows (doc_id ≡ 7 mod 10). */
  private[graft] def batchRows(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    indexRows(graft.sources.Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) === 7))
      .toDF("b_id", "b_n", "sh")
  }

  /** Incremental admission against the PERSISTED index — identical
    * verdicts to `dedupIncremental` (spec-pinned), but the corpus side
    * is the bucketed table: the join plan carries exactly one exchange
    * (the batch), the index streams from its buckets pre-partitioned
    * and pre-sorted. */
  def admitBatch(spark: SparkSession, dir: String,
      table: String = "shingle_index"): DataFrame = {
    val batch = batchRows(spark, dir)
    val index = spark.table(table).toDF("e_id", "e_n", "sh")
    val dups = batch.join(index, Seq("sh"))
      .groupBy("b_id", "e_id", "b_n", "e_n")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("b_n") + col("e_n") - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .groupBy("b_id")
      .agg(count(lit(1)).as("n_dup_candidates"), min("e_id").as("dup_of"))
    graft.sources.Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), expr("word_shingles3(text)").as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"))
      .join(dups.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_candidates"), lit(0L)).as("n_dup_candidates"),
        col("dup_of"),
        col("dup_of").isNull.as("is_new"))
      .orderBy("doc_id")
  }
}
