package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit}

/** Repeated-measures A/B of the Jaccard pair-join candidate variants —
  * `runMain graft.tools.PairJoinAB [corpusDir] [reps]`.
  *
  * Single cold passes at 30× swung 3× run-to-run (GC/page-cache/JIT
  * state), which is why this tool exists: it builds the shared
  * substrate ONCE (persisted index + df table + hashed arrays, same as
  * dedupEval's), runs every (pipeline, variant) cell once as warmup,
  * then interleaves `reps` timed rounds — variant order rotates inside
  * each round so slow-machine drift hits all variants equally. Each
  * measurement is the FULL pipeline (candidates → exact verify →
  * count), so what's ranked is end-to-end cost, not candidate-stage
  * cost. Medians are the number to read. */
object PairJoinAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_corpus_10x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextOps
    val shingled = TextOps.shingledFrom(
      TextOps.docsRepartitioned(spark, dir)).persist()
    val hashed = TextOps.hashedFrom(shingled).persist()
    val ex = TextOps.invertedIndex(shingled).persist()
    val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df")).persist()
    hashed.count(); dfTab.count()

    val cells: Seq[(String, () => Long)] = Seq(
      "cap64/off" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "off"), hashed).count()),
      "cap64/fold" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "fold"), hashed).count()),
      "cap64/foldlen" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "foldlen"), hashed).count()),
      "cap8/off" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 8L, "off"), hashed).count()),
      "cap8/fold" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 8L, "fold"), hashed).count()),
      "cap8/foldlen" -> (() =>
        TextOps.verifyJaccard(
          TextOps.cappedCandidatesVariant(ex, dfTab, 8L, "foldlen"), hashed).count()),
      "prefix/off" -> (() =>
        TextOps.verifyJaccard(
          TextOps.prefixCandidatesVariant(ex, dfTab, "off"), hashed).count()),
      "prefix/len" -> (() =>
        TextOps.verifyJaccard(
          TextOps.prefixCandidatesVariant(ex, dfTab, "len"), hashed).count()),
      // the EXACT baseline both strategies are alternatives to — the
      // full inverted-index join (intersection folded in the join
      // shuffle, no separate verify); puts the round-4 full-vs-prefix
      // crossover claim on the same repeated-measures footing
      "full/index" -> (() => TextOps.jaccardPairsFromIndex(ex).count()))

    // warmup: one pass per cell (codegen + page cache), rows printed so
    // a variant emitting a different pair count fails loudly
    for ((name, f) <- cells)
      println(s"[ab] warmup $name rows=${f()}")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; i <- cells.indices) {
      val (name, f) = cells((i + r) % cells.size) // rotate order per round
      val t0 = System.nanoTime()
      f()
      val s = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ s
      println(f"[ab] round $r $name: $s%.2f s")
    }
    for ((name, _) <- cells) {
      val v = times(name).sorted
      val med = v(v.size / 2)
      println(f"[ab] MEDIAN $name: $med%.2f s  (runs: ${
        v.map(x => f"$x%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
