package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Grid-bucketed spatial proximity self-join: for every event, the
  * count of (and nearest distance to) other events within radius R in
  * the 2-D coordinate space the reference's map queries live in
  * (Part3/Visualizations/q1.py lat/lon plane; here `value` is the
  * x-axis and the props payload's `k` field the y-axis, both in exact
  * integer centi-units) — the density/proximity primitive under
  * DBSCAN cores, hot-spot detection, and co-location mining.
  *
  * A naive distance self-join is O(n²) at any scale. The grid
  * decomposition makes it an EQUI-join: cell side == R, each point
  * probes its 3×3 cell neighborhood (bounded 9× replication of one
  * side — the same bounded-fan-out discipline as the binned interval
  * join `q_range_join`), and the exact integer predicate
  * (dx² + dy² ≤ R²) filters inside the candidate cell pairs. By the
  * triangle of the grid, every true pair shares a neighborhood —
  * recall is exact, verified against a brute-force twin in the spec.
  *
  * Scale notes: work is Σ_cells |probe(c)|·|home(c)| — linear for any
  * bounded point density, and the join is a plain hash equi-join on
  * (cx, cy) so it shuffles once per side. A pathological hot cell
  * (density spike) concentrates one task; the mitigation is the
  * repo's standard salting/df-cap composition, and AQE's skew-join
  * split applies because this IS a shuffle join (impossible for the
  * naive cross product). */
object SpatialJoin {

  def spatialNeighbors(spark: SparkSession, dir: String,
      rCents: Long = 200L): DataFrame = {
    val pts = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("xc"),
        (get_json_object(col("props"), "$.k").cast("long") * 100).as("yc"))
      .filter(col("yc").isNotNull)
    val home = pts
      .withColumn("cx", expr(s"xc div $rCents"))
      .withColumn("cy", expr(s"yc div $rCents"))
    val probe = home
      .select(col("event_id").as("a_id"), col("xc").as("ax"),
        col("yc").as("ay"),
        explode(expr("sequence(cx - 1, cx + 1)")).as("cx"), col("cy"))
      .select(col("a_id"), col("ax"), col("ay"), col("cx"),
        explode(expr("sequence(cy - 1, cy + 1)")).as("cy"))
    val neigh = probe
      .join(home.select(col("event_id").as("b_id"), col("xc").as("bx"),
        col("yc").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("d2",
        expr("(ax - bx) * (ax - bx) + (ay - by) * (ay - by)"))
      .filter(col("d2") <= rCents * rCents)
      .groupBy(col("a_id").as("event_id"))
      .agg(count(lit(1)).as("n_neighbors"), min("d2").as("d2_min"))
    pts.select("event_id")
      .join(neigh, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        col("d2_min"))
      .orderBy("event_id")
  }
}
