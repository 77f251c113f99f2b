package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BloomAgg, BloomMightContain}
import graft.sources.Tables

/** Bloom-pruned fact/dim join — the standard 100 TB shuffle-reduction
  * pattern (Spark's own runtime row-level filtering, made explicit and
  * tunable): when the dim side is selective but too big to broadcast,
  * aggregate its join keys into a FIXED-SIZE Bloom filter (32 KiB here
  * — bounded by config, not by data), ship the bits to every fact task
  * as a plan literal, and filter fact rows BEFORE the join shuffle.
  * Rows that pass spuriously (fpp ≈ (1-e^{-kn/m})^k ≈ 2% at 3k keys /
  * 2^18 bits / 5 hashes) are dropped by the exact join, so the result
  * is IDENTICAL to the plain join — the oracle is the plain-join SQL.
  *
  * Reference anchor: the reference joins its trip dimension to the
  * breadcrumb fact per query (Part3/stop.sql trip_full_view); at the
  * reference's row counts Postgres hash-joins in place, but at 100 TB
  * the fact-side shuffle dominates and key pruning is the lever.
  */
object BloomJoin {
  /** 2^12 words = 2^18 bits = 32 KiB; 5 hashes → fpp < 3% up to ~25k
    * keys. At a real 100 TB run, size m ≈ 1.44·n·log2(1/fpp) bits from
    * the dim-side key estimate (still KBs-to-MBs — plan-shippable). */
  val Words = 4096
  val Hashes = 5

  /** Distributed build: one OR-merge aggregate over the dim keys; the
    * driver holds only the fixed 32 KiB result (like the IVF sample —
    * bounded, never data-scaled). */
  def bloomBits(keys: DataFrame, keyCol: String): Array[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("long")).as[Long]
      .select(BloomAgg(Words, Hashes).toColumn)
      .head()
  }

  /** Codegen'd probe column over a built filter. */
  def mightContain(bits: Array[Long], key: Column): Column =
    GraftPlanBridge.column(BloomMightContain(
      GraftPlanBridge.expression(lit(bits)),
      GraftPlanBridge.expression(key.cast("long")), Hashes))

  /** Revenue by order priority over high-value orders (~2% of the dim):
    * lineitem is Bloom-pruned on l_orderkey before the join, so ~98% of
    * the fact never shuffles. Exactly equal to the un-pruned join. */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 490000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bits = bloomBits(dim, "o_orderkey")
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .filter(mightContain(bits, col("l_orderkey")))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
      .orderBy("o_orderpriority")
  }
}
