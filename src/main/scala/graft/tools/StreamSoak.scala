package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock rate-source soak for the stateful streaming family —
  * `runMain graft.tools.StreamSoak [seconds] [rowsPerSecond]`.
  * Drives `anomalyStream` and `heavyHittersStream` off Spark's rate
  * source and samples StreamingQueryProgress every 10 s; the evidence
  * the "key-bounded state forever" claims rest on is the printed
  * state-rows series staying FLAT while input rows climb into the
  * millions. (StateSoakSpec is the deterministic MemoryStream twin the
  * test gate runs; this main is for longer soaks.) */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(240)
    val rps = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()

    // 8 event types, values mostly steady with rare planted spikes
    val anomIn = rate.select(
        col("value").as("event_id"),
        (col("value") * 1000L).as("ts_us"),
        concat(lit("t"), (col("value") % 8).cast("string")).as("event_type"),
        (lit(10.0) + (col("value") % 7).cast("double") * 0.3 +
          when(col("value") % 10007 === 0, 90.0).otherwise(0.0)).as("value"))
      .as[graft.streaming.AnomalyStream.ValueIn]
    val anomQ = graft.streaming.AnomalyStream.anomalyStream(anomIn)
      .writeStream.format("noop").outputMode("append").start()

    // 4 groups, an unbounded item domain (value-keyed) — the regime an
    // unbounded counter map would grow in every batch
    val hhIn = rate.select(
        concat(lit("g"), (col("value") % 4).cast("string")).as("group"),
        concat(lit("w"), (col("value") % 50000).cast("string")).as("item"))
      .as[graft.streaming.HeavyHittersStream.ItemIn]
    val hhQ = graft.streaming.HeavyHittersStream.heavyHittersStream(hhIn, k = 50)
      .writeStream.format("noop").outputMode("update").start()

    val t0 = System.nanoTime()
    // cumulative input per query, accumulated from each NEW progress
    // event (by batchId) — recentProgress is a bounded ring buffer
    // (~100 entries), so re-summing it under-reports long soaks
    val inputTotal = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val lastBatch = scala.collection.mutable.Map[String, Long]().withDefaultValue(-1L)
    while ((System.nanoTime() - t0) / 1e9 < seconds) {
      Thread.sleep(10000)
      for ((name, q) <- Seq("anomaly" -> anomQ, "hh" -> hhQ)) {
        q.recentProgress.filter(_.batchId > lastBatch(name))
          .sortBy(_.batchId).foreach { pr =>
            inputTotal(name) += pr.numInputRows
            lastBatch(name) = pr.batchId
          }
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          val so = p.stateOperators.head
          println(f"[soak] ${(System.nanoTime() - t0) / 1e9}%.0fs $name " +
            f"input_total=${inputTotal(name)} " +
            f"state_rows=${so.numRowsTotal} state_bytes=${so.memoryUsedBytes}")
        }
      }
    }
    anomQ.stop(); hhQ.stop()
    spark.stop()
  }
}
