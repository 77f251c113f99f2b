package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM A/B of the session-scoped pair-substrate cache (r10 verdict
  * item 2) — `runMain graft.tools.SubstrateAB [dataDir] [reps]`:
  * run the chain of pair-path consumers a pipeline session actually
  * executes (dedup_cluster → dedup_keep_best → corpus_split →
  * dedup_length_profile) twice per rep —
  *
  *   cold: cache cleared + blanket unpersist before EVERY consumer
  *         (each pays a full three-arm generation — the pre-r11 shape)
  *   warm: cache cleared once at chain start, then the consumers run
  *         back-to-back (first pays the generation, the rest reuse it)
  *
  * and report per-chain wall plus the per-consumer split. "~1×
  * generation across ≥ 3 consumers" (the verdict's done-bar) reads
  * directly as warm-chain ≈ cold-first + Σ(downstream-consumer tails).
  * Row counts are asserted equal across modes every rep — the cache
  * must never change a result. */
object SubstrateAB {
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
    import graft.text.{Curation, TextOps}

    val consumers: Seq[(String, () => Long)] = Seq(
      "dedup_cluster" -> (() => TextOps.dedupCluster(spark, dir).count()),
      "dedup_keep_best" -> (() => Curation.dedupKeepBest(spark, dir).count()),
      "corpus_split" -> (() => Curation.leakageSafeSplit(spark, dir).count()),
      "dedup_length_profile" -> (() => TextOps.dedupLengthProfile(spark, dir).count()))

    def sweep(): Unit = {
      TextOps.clearPairCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def chain(coldEach: Boolean): (Double, Seq[(String, Double)], Seq[Long]) = {
      sweep()
      val t0 = System.nanoTime()
      val parts = consumers.map { case (name, f) =>
        if (coldEach) sweep()
        val s0 = System.nanoTime()
        val n = f()
        (name, (System.nanoTime() - s0) / 1e9, n)
      }
      ((System.nanoTime() - t0) / 1e9,
        parts.map(p => (p._1, p._2)), parts.map(_._3))
    }

    // warmup both shapes once (JIT/codegen)
    chain(coldEach = true); chain(coldEach = false)
    val cold = scala.collection.mutable.ArrayBuffer[Double]()
    val warm = scala.collection.mutable.ArrayBuffer[Double]()
    for (r <- 1 to reps) {
      val (tc, pc, nc) = chain(coldEach = true)
      val (tw, pw, nw) = chain(coldEach = false)
      require(nc == nw, s"row counts diverged cold=$nc warm=$nw")
      cold += tc; warm += tw
      def fmt(ps: Seq[(String, Double)]) =
        ps.map { case (n, t) => f"$n=$t%.2f" }.mkString(" ")
      println(f"[ab] rep $r cold=$tc%.2f s  { ${fmt(pc)} }")
      println(f"[ab] rep $r warm=$tw%.2f s  { ${fmt(pw)} }")
    }
    def med(v: Seq[Double]) = v.sorted.apply((v.size - 1) / 2)
    println(f"[ab] chain median cold=${med(cold.toSeq)}%.2f s warm=${med(warm.toSeq)}%.2f s " +
      f"ratio=${med(warm.toSeq) / med(cold.toSeq)}%.2f  (cache hits=${TextOps.pairCacheHits.get()})")
    spark.stop()
  }
}
