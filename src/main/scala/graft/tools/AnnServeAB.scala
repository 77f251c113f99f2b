package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-shape A/B for the NSW-lite graph walk (r10 verdict item 4)
  * — `runMain graft.tools.AnnServeAB [dataDir] [reps]`:
  *
  *   on-demand    — annGraphNsw's self-contained entry: each hop
  *                  derives the touched nodes' exact top-k edges with
  *                  a broadcast scan (Θ(hops·touched·n·d) per query
  *                  batch — what the declared query pays).
  *   prebuilt/knn — the walk over the EXACT vec_knn_graph substrate
  *                  (k = walk k): row-identical traversal by the spec,
  *                  so its wall isolates pure walk cost once a graph
  *                  exists. Substrate build time reported separately
  *                  (amortized across every query batch served).
  *   prebuilt/ann — the walk over the PRODUCTION ANN-built graph
  *                  (vec_knn_graph_ann_auto, k = walk k): the shape a
  *                  100 TB serving tier actually holds (the exact knn
  *                  graph is quadratic to build; the IVF-ANN graph is
  *                  linear). Rows may differ from on-demand (edges are
  *                  approximate) — recall@3 against brute-force truth
  *                  is reported next to the wall so the quality cost
  *                  of the cheap substrate is priced, not assumed.
  *
  * Each cell times `reps` full walk materializations (noop-style
  * count) after one warmup; substrates are eagerly pinned before
  * timing so cell walls are walk-only. */
object AnnServeAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.vector.VectorOps

    val truth = VectorOps.annBruteForce(spark, dir)
      .filter(col("rank") <= 3).select("query_id", "neighbor_id").persist()
    val nTruth = truth.count()
    def recall(df: DataFrame): Double = {
      if (nTruth == 0) return 0.0 // empty truth: report 0, not NaN
      val h = df.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      h.toDouble / nTruth
    }

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[serve] $label: $dt%.2f s")
      dt
    }

    // substrate builds, timed once each (the amortized cost). The
    // exact knn graph is all-pairs (quadratic build) — skippable via
    // GRAFT_SKIP_EXACT=1 for the sf10 run, where only the linear
    // ANN-built substrate is a realistic build anyway.
    val skipExact = sys.env.get("GRAFT_SKIP_EXACT").contains("1")
    val exactCell: Seq[(String, () => DataFrame)] =
      if (skipExact) Seq.empty
      else {
        val exactEdges = VectorOps.vecKnnGraph(spark, dir, k = 12)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
          .localCheckpoint(false)
        timed("substrate build: exact vec_knn_graph k=12")(exactEdges.count())
        Seq("walk/prebuilt-knn" -> (() =>
          VectorOps.annGraphNsw(spark, dir, prebuiltEdges = Some(exactEdges))))
      }
    val annEdges = VectorOps.vecKnnGraphAnnAuto(spark, dir, k = 12)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint(false)
    timed("substrate build: ann vec_knn_graph_ann_auto k=12")(annEdges.count())

    val cells: Seq[(String, () => DataFrame)] =
      Seq("walk/on-demand" -> (() => VectorOps.annGraphNsw(spark, dir))) ++
        exactCell ++
        Seq("walk/prebuilt-ann" -> (() =>
          VectorOps.annGraphNsw(spark, dir, prebuiltEdges = Some(annEdges))))
    for ((name, f) <- cells) {
      val out = f()
      // recall measured on the warmup materialization only — the walk
      // is deterministic, so the timed runs return the same rows; the
      // label says so in case a future variant isn't
      println(f"[serve] $name recall@3=${recall(out)}%.3f (warmup pass)")
      val walls = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[serve] $name median=${walls((walls.size - 1) / 2)}%.2f s " +
        f"[${walls.head}%.2f,${walls.last}%.2f]")
    }
    truth.unpersist(blocking = false)
    spark.stop()
  }
}
