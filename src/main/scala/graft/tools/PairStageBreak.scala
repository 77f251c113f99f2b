package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit}

/** Per-stage wall breakdown of the production three-arm pair
  * generation (jaccardPairsFrom's body), one stage at a time off
  * pinned predecessors — `runMain graft.tools.PairStageBreak [dir]
  * [reps]`. Reads: where does a pair-consumer's ~3.5 s actually go at
  * sf0.1 (shingle scan vs index vs each arm vs verify vs distinct)? */
object PairStageBreak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val sh = TextOps.shingledFrom(TextOps.docsRepartitioned(spark, dir))
        .localCheckpoint(false)
      t("shingle scan (pin sh)") { sh.count() }
      val ex = TextOps.invertedIndex(sh).localCheckpoint(false)
      t("inverted index (pin ex)") { ex.count() }
      val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
        .localCheckpoint(false)
      t("df table") { dfTab.count() }
      val capped = t("capped arm (build)") {
        TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "foldlen")
          .localCheckpoint(false) }
      t("capped arm (run)") { capped.count() }
      val verb = t("verbatim arm (build)") {
        TextOps.verbatimCandidatesFromIndex(ex).localCheckpoint(false) }
      t("verbatim arm (run)") { verb.count() }
      val banded = t("banded arm (build)") {
        TextOps.bandedPairsConf(
          sh.selectExpr("doc_id", "minhash128(shingles) AS sig"), 32, 4)
          .localCheckpoint(false) }
      t("banded arm (run)") { banded.count() }
      val union = t("union+distinct (build)") {
        capped.union(verb).union(banded).distinct().localCheckpoint(false) }
      t("union+distinct (run)") { union.count() }
      val hashed = TextOps.hashedFrom(sh).localCheckpoint(false)
      t("hashed arrays") { hashed.count() }
      t("verify join") { TextOps.verifyJaccard(union, hashed).count() }
      t("END-TO-END (fresh, as a consumer pays it)") {
        TextOps.clearPairCache()
        TextOps.jaccardPairsFrom(
          TextOps.shingledFrom(TextOps.docsRepartitioned(spark, dir))).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      TextOps.clearPairCache()
    }
    spark.stop()
  }
}
