package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Repeated-measures A/B of the PRODUCTION pair pipeline shapes —
  * `runMain graft.tools.ProdPairAB [dataDir] [reps]` — answering the
  * r9 question the full-surface bench can't (box drift swamps ±1 s
  * deltas): what do the verbatim-union arm and the lazy substrate
  * checkpoints each cost END-TO-END, substrate included? Every cell
  * rebuilds its subtree from the parquet scan (nothing persisted
  * across cells — this measures the operator as Bench sees it), cells
  * rotate inside each timed round, medians are the number to read. */
object ProdPairAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextOps

    def freshDocs(): DataFrame =
      TextOps.shingledFrom(TextOps.docsRepartitioned(spark, dir))

    def cappedOnly(ckpt: Boolean): Long = {
      val docs = freshDocs()
      val ex0 = TextOps.invertedIndex(docs)
      val ex = if (ckpt) ex0.localCheckpoint(false) else ex0
      val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val h0 = TextOps.hashedFrom(docs)
      val hashed = if (ckpt) h0.localCheckpoint(false) else h0
      TextOps.verifyJaccard(
        TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "foldlen"), hashed)
        .count()
    }
    def production(ckpt: Boolean): Long = {
      val docs = freshDocs()
      val ex0 = TextOps.invertedIndex(docs)
      val ex = if (ckpt) ex0.localCheckpoint(false) else ex0
      val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      TextOps.verifyJaccard(
        TextOps.productionCandidates(ex, dfTab, docs),
        TextOps.hashedFrom(docs)).count()
    }

    // ex-derived commutative signature: no second shingling pass; the
    // exact verify kills signature collisions, so grouping coarser
    // than array equality is safe
    def productionExSig(ckpt: Boolean): Long = {
      val docs = freshDocs()
      val ex0 = TextOps.invertedIndex(docs)
      val ex = if (ckpt) ex0.localCheckpoint(false) else ex0
      val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val hashed = TextOps.hashedFrom(docs)
      val cand = TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "foldlen")
        .union(TextOps.verbatimCandidatesFromIndex(ex))
        .distinct()
      TextOps.verifyJaccard(cand, hashed).count()
    }

    val cells: Seq[(String, () => Long)] = Seq(
      "capped/plain" -> (() => cappedOnly(ckpt = false)),
      "capped/ckpt" -> (() => cappedOnly(ckpt = true)),
      "prod/plain" -> (() => production(ckpt = false)),
      "prod/ckpt" -> (() => production(ckpt = true)),
      "prodex/plain" -> (() => productionExSig(ckpt = false)),
      "prodex/ckpt" -> (() => productionExSig(ckpt = true)))

    for ((name, f) <- cells)
      println(s"[ab] warmup $name rows=${f()}")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; i <- cells.indices) {
      val (name, f) = cells((i + r) % cells.size)
      val t0 = System.nanoTime()
      f()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    for ((name, _) <- cells) {
      val v = times(name).sorted
      println(f"[ab] $name median=${v(v.size / 2)}%.2f s " +
        s"all=${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
