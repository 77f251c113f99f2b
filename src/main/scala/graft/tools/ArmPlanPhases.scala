package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit}

/** Phase-split of ONE pair-generation arm's "build" wall (r12 —
  * verdict item 5): where inside Catalyst does the ~1.2 s/arm of the
  * three-arm generation's planning floor go? Reports analyzed →
  * optimized → sparkPlan → executedPlan → toRdd (codegen) per arm,
  * warmed, `reps` times. `runMain graft.tools.ArmPlanPhases [dir] [reps]` */
object ArmPlanPhases {
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
    val sh = TextOps.shingledFrom(TextOps.docsRepartitioned(spark, dir))
      .localCheckpoint(false)
    sh.count()
    val ex = TextOps.invertedIndex(sh).localCheckpoint(false)
    ex.count()
    val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .localCheckpoint(false)
    dfTab.count()
    def phases(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk
      val qe = df.queryExecution
      val t1 = System.nanoTime(); qe.analyzed
      val t2 = System.nanoTime(); qe.optimizedPlan
      val t3 = System.nanoTime(); qe.sparkPlan
      val t4 = System.nanoTime(); qe.executedPlan
      val t5 = System.nanoTime(); qe.toRdd
      val t6 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[phase] $label: construct ${s(t0, t1)} analyze ${s(t1, t2)} " +
        s"optimize ${s(t2, t3)} sparkPlan ${s(t3, t4)} executedPlan ${s(t4, t5)} " +
        s"toRdd ${s(t5, t6)}")
    }
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      phases("capped") {
        TextOps.cappedCandidatesVariant(ex, dfTab, 64L, "foldlen") }
      phases("verbatim") { TextOps.verbatimCandidatesFromIndex(ex) }
      phases("banded") {
        TextOps.bandedPairsConf(
          sh.selectExpr("doc_id", "minhash128(shingles) AS sig"), 32, 4) }
    }
    spark.stop()
  }
}
