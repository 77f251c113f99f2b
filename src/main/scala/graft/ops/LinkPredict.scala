package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Link prediction over the repeat co-purchase graph (parts adjacent
  * when ≥ 2 orders contain both — the same sparsified graph as
  * `Triangles.kCore`): score every non-adjacent pair at distance 2 by
  * common-neighbor count and the resource-allocation index
  * (Σ_z 1/deg(z) over shared neighbors z, the strongest of the simple
  * local predictors in the Zhou-Lü-Zhang benchmarks), and emit the
  * top 50 predicted edges. This is the "parts that WILL be bought
  * together" / recommendation-candidate primitive.
  *
  * Scale shape: candidate pairs are generated ONLY through low-degree
  * wedge centers (deg(z) ≤ 64) — per-center work is deg², so hub
  * centers cost quadratically while contributing ≤ 1e6/65 ppm each to
  * RA by construction; capping them bounds the wedge join at
  * |centers|·cap² and is the standard sparsification for this score.
  * The cap is part of the operator contract (the oracle mirrors it).
  * Everything else is bounded: one distinct + count aggregate builds
  * the edge set (checkpointed once, three consumers), the degree table
  * scales with |nodes|, the anti-join removes existing edges on the
  * pair key, and the top-50 tail is an orderBy+limit (TakeOrdered
  * heap — no global sort materializes).
  *
  * Exactness: counts and `1000000 div deg` are pure integer
  * arithmetic — order-independent, and the (ra, cn, u, v) sort key is
  * total, so the limit is deterministic on any layout.
  */
object LinkPredict {
  val MinOrders = 2L
  val DegCap = 64L
  val TopK = 50

  def linkPredict(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.toDF("ok", "a")
    val bb = li.toDF("ok", "b")
    val edges = a.join(bb.hint("shuffle_hash"), Seq("ok"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= MinOrders)
      .select("a", "b")
      // three consumers (symmetric expansion feeds degrees AND wedges,
      // plus the final anti-join) — pin it once
      .localCheckpoint(true)
    val sym = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst")
    val centers = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= DegCap)
    val e = sym.join(centers, sym("src") === centers("node"))
      .select(col("src").as("z"), col("dst"), col("deg"))
    val x = e.toDF("z", "u", "degz")
    val y = e.select("z", "dst").toDF("z", "v")
    val scored = x.join(y.hint("shuffle_hash"), Seq("z"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000 div degz")).as("ra_ppm"))
    scored
      .join(edges, scored("u") === edges("a") && scored("v") === edges("b"),
        "left_anti")
      .select(col("u").as("part_u"), col("v").as("part_v"),
        col("common_neighbors"), col("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("common_neighbors").desc,
        col("part_u"), col("part_v"))
      .limit(TopK)
  }
}
