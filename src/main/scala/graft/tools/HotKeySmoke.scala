package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key demonstration: synthesize an event stream where ONE key
  * owns half of all rows (the billion-breadcrumb vehicle), then race
  * the single-window sessionizer against the two-phase one and verify
  * row-identical output. The plain form serializes the hot key into
  * one task's sort; the two-phase form spreads it over (key, day)
  * buckets. `runMain graft.tools.HotKeySmoke [nRows]` */
object HotKeySmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val out = "/tmp/graft_hotkey"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hotkey] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val baseUs = 1704067200L * 1000000L // 2024-01-01
    val spanUs = 30L * 86400L * 1000000L
    spark.range(n).select(
        col("id").as("event_id"),
        when(pmod(col("id"), lit(2L)) === 0L, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(1000L)) + 1L).as("user_id"),
        ((lit(baseUs) + pmod(xxhash64(col("id") + 7L), lit(spanUs))) * 1000L).as("ts"),
        (pmod(xxhash64(col("id") + 13L), lit(29999L)) / lit(100.0)).as("value"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val hot = spark.read.parquet(s"$out/events.parquet")
      .filter(col("user_id") === 0L).count()
    println(s"[hotkey] rows=$n hotKeyRows=$hot (${100 * hot / n}%)")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both plans
    force(graft.analytics.Analytics.sessionize(spark, out).limit(1))
    time("sessionize (single window)")(
      force(graft.analytics.Analytics.sessionize(spark, out)))
    time("sessionize_scale (two-phase)")(
      force(graft.analytics.Analytics.sessionizeScalable(spark, out)))
    val a = graft.analytics.Analytics.sessionize(spark, out)
    val b = graft.analytics.Analytics.sessionizeScalable(spark, out)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[hotkey] row-diff between forms: $diff (must be 0)")
    spark.stop()
  }
}
