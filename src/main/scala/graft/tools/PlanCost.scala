package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query's wall into DRIVER PLANNING (analyze + optimize +
  * physical planning, forced via `.queryExecution.executedPlan`) vs
  * EXECUTION (the noop-sink run after the plan exists) — the
  * diagnostic that caught vec_rp_eval spending ~3.5 s/pass re-walking
  * a 17k-node expression tree. Warm pass first, then `reps` measured
  * pairs: `runMain graft.tools.PlanCost <name...> [--sf dir] [--reps n]`. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    // consume --flag value pairs positionally (r11 ADVICE: filtering
    // positionals by VALUE dropped a query that happened to equal the
    // sf dir or the rep count)
    var sfDir = "/root/testdata/sf0.1"
    var reps = 3
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" if i + 1 < args.length => sfDir = args(i + 1); i += 2
        case "--reps" if i + 1 < args.length => reps = args(i + 1).toInt; i += 2
        case a => names += a; i += 1
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm: codegen + JIT (the Bench discipline)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[plancost] $name warmup FAILED: $e") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      for (i <- 1 to reps) {
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan // forces analysis, optimization, physical planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        println(f"[plancost] $name rep $i: plan ${(t1 - t0) / 1e9}%.2f s, exec ${(t2 - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
