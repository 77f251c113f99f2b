package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM alternating A/B for cross-round drift adjudication (r9
  * verdict item 3): this host's same-day runs disagree 1.3-2.8× per
  * query, so a round-over-round delta on one query (q_pagerank read
  * 6.06 / 7.53 / 8.87 s across r7-r9 on identical code) cannot be
  * attributed from BENCH totals alone. This main alternates the query
  * under adjudication (A) with a plan-stable touchstone (B) in ONE
  * JVM — A B A B …, `reps` pairs, warmed — and reports both medians
  * plus the A/B ratio. Identical code regressing would move the RATIO;
  * host drift moves both numerators together and leaves it flat. Same
  * discipline as tools/ProdPairAB, pointed at whole registry entries.
  *
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AB_A (default
  * q_pagerank), SPARK_GRAFT_AB_B (default q1_agg), SPARK_GRAFT_AB_REPS
  * (default 7). */
object DriftAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aName = sys.env.getOrElse("SPARK_GRAFT_AB_A", "q_pagerank")
    val bName = sys.env.getOrElse("SPARK_GRAFT_AB_B", "q1_agg")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val fa = graft.SparkEntry.queries(aName)
    val fb = graft.SparkEntry.queries(bName)
    def onePass(f: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      force(f(spark, sfDir))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }
    // warm both (codegen/JIT), then strictly alternate
    onePass(fa); onePass(fb)
    val as = scala.collection.mutable.ArrayBuffer[Double]()
    val bs = scala.collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      as += onePass(fa)
      bs += onePass(fb)
      println(f"pair $i: $aName ${as.last}%.3f s  $bName ${bs.last}%.3f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    val (ma, mb) = (med(as.toSeq), med(bs.toSeq))
    println(f"""{"a":"$aName","a_median":$ma%.3f,"a_min":${as.min}%.3f,"a_max":${as.max}%.3f,""" +
      f""""b":"$bName","b_median":$mb%.3f,"b_min":${bs.min}%.3f,"b_max":${bs.max}%.3f,""" +
      f""""ratio":${ma / mb}%.3f,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
