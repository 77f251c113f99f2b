package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock breakdown of dedup_eval's sub-pipelines —
  * `runMain graft.tools.EvalBreakdown [sfDir]`. */
object EvalBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[eval] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.text.TextOps
    // warm the session
    graft.sources.Tables.documents(spark, sfDir).count()
    val truth = time("truth jaccardPairs count") {
      val t = TextOps.dedupNgramJaccard(spark, sfDir).select("a_id", "b_id").persist()
      t.count(); t
    }
    for ((name, df) <- Seq(
      "minhash" -> TextOps.dedupMinhash(spark, sfDir),
      "dfcap64" -> TextOps.jaccardPairsCapped(spark, sfDir, 64L),
      "dfcap8" -> TextOps.jaccardPairsCapped(spark, sfDir, 8L),
      "simhash" -> TextOps.dedupSimhash(spark, sfDir))) {
      val p = time(s"$name pairs count") {
        val x = df.select("a_id", "b_id").persist(); x.count(); x
      }
      time(s"$name overlap join") { p.join(truth, Seq("a_id", "b_id")).count() }
      p.unpersist(blocking = false)
    }
    time("full dedupEval") { TextOps.dedupEval(spark, sfDir)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
