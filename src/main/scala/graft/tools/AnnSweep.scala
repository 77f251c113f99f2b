package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** (probes, beam, hops, k) sweep for the NSW-lite graph ANN —
  * `runMain graft.tools.AnnSweep [dataDir]` — scoring each config's
  * top-3 against the brute-force truth (the ann_eval protocol) plus
  * wall seconds per walk, so the production default is a measured
  * recall/cost point, not a guess (r10 verdict item 3: beam 8 / 2
  * hops / k 5 / 1-probe seed landed at 0.40 recall@3, barely above
  * its own seed's 0.37). */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id").persist()
    val nTruth = truth.count()

    def score(pairs: DataFrame): (Long, Long) = {
      val row = pairs.select("query_id", "neighbor_id")
        .join(truth.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n"), count(col("hit")).as("h")).head()
      (row.getLong(0), row.getLong(1))
    }

    // reference rows: the seeds themselves
    for ((name, df) <- Seq(
        "ivf_1probe" -> VectorOps.annIvf(spark, dir),
        "ivf_3probe" -> VectorOps.annIvfProbe(spark, dir))) {
      val (n, h) = score(df)
      println(f"[sweep] $name%-28s n=$n h=$h recall=${h.toDouble / nTruth}%.3f")
    }

    val configs = Seq(
      (1, 8, 2, 5),   // r10 shipped default
      (3, 8, 2, 5),   // 3-probe seed only
      (1, 16, 2, 8),  // wider beam + denser graph
      (3, 16, 2, 8),
      (3, 8, 3, 5),   // extra hop
      (3, 16, 3, 8),
      (3, 24, 3, 12))
    for ((p, b, h, k) <- configs) {
      val t0 = System.nanoTime()
      val (n, hit) = score(VectorOps.annGraphNsw(spark, dir,
        k = k, beam = b, hops = h, probes = p))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] nsw p=$p b=$b%2d h=$h k=$k%2d  n=$n h=$hit " +
        f"recall=${hit.toDouble / nTruth}%.3f wall=$dt%.1f s")
    }
    truth.unpersist(blocking = false)
    spark.stop()
  }
}
