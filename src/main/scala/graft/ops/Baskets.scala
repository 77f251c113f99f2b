package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Market-basket affinity over orders: "customers whose order has X
  * also take Y" — the recommendation/assortment signal.
  *
  * Scale design mirrors `text_pmi`: per-order pair expansion is
  * bounded by the per-order line cap (constant factor, never
  * quadratic), pair and singleton supports are map-side-combinable
  * hash aggregates, and lift stays in exact integer ppm so the
  * ranking never depends on an engine's libm.
  */
object Baskets {

  /** Top-50 part pairs by lift = P(a,b)/(P(a)·P(b)) in integer ppm,
    * with a ≥3-order support floor against coincidence pairs. */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nOrders = li.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val single = li.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val a = li.toDF("ok", "a")
    val b = li.toDF("ok", "b")
    val pair = a.join(b.hint("shuffle_hash"), Seq("ok"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pair
      .join(single.toDF("a", "n_a"), Seq("a"))
      .join(single.toDF("b", "n_b"), Seq("b"))
      .crossJoin(broadcast(nOrders))
      // DECIMAL(38) intermediates: the long product n_ab·n_orders·1e6
      // silently wraps past ~1.5e9 orders with a popular pair —
      // cluster scale, exactly where the exact-ppm contract matters
      .withColumn("lift_ppm", expr(
        "CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)"))
      .select("a", "b", "n_ab", "n_a", "n_b", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("a"), col("b"))
      .limit(50)
  }
}
