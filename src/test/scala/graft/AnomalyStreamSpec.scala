package graft

import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.{AnomalyOut, ValueIn}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class AnomalyStreamSpec extends SparkSpec {

  /** sequential prequential reference (one fold, same order contract) */
  private def reference(rows: Seq[ValueIn], zT: Double, minN: Long): Seq[AnomalyOut] = {
    val st = scala.collection.mutable.Map[String, (Long, Double, Double)]()
    val out = scala.collection.mutable.ArrayBuffer[AnomalyOut]()
    for (r <- rows.sortBy(x => (x.ts_us, x.event_id))) {
      val (n, mean, m2) = st.getOrElse(r.event_type, (0L, 0.0, 0.0))
      if (n >= minN && m2 > 0.0) {
        val z = (r.value - mean) / math.sqrt(m2 / n)
        if (math.abs(z) > zT)
          out += AnomalyOut(r.event_id, r.event_type, r.value,
            math.rint(z * 1000).toLong, n)
      }
      val n1 = n + 1; val d = r.value - mean; val mean1 = mean + d / n1
      st(r.event_type) = (n1, mean1, m2 + d * (r.value - mean1))
    }
    out.toSeq
  }

  private def mkRows(typ: String, n: Int, start: Long, f: Int => Double): Seq[ValueIn] =
    (0 until n).map(i => ValueIn(start + i, (start + i) * 1000L, typ, f(i)))

  test("streaming anomalies match the sequential prequential reference across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // steady baseline around 10±1 with two planted spikes in batch 2
    val b1 = mkRows("a", 40, 1000, i => 10.0 + (i % 5) * 0.5) ++
      mkRows("b", 10, 5000, i => 100.0 + i) // b never reaches minN
    val b2 = mkRows("a", 10, 2000, i => if (i == 3 || i == 7) 50.0 else 10.5)
    val stream = MemoryStream[ValueIn]
    val q = AnomalyStream.anomalyStream(stream.toDS())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("anom_out").as[AnomalyOut].collect().toSeq
      .sortBy(_.event_id)
    // batch-2 timestamps all sort after batch 1's, so one sequential
    // fold over the concatenation reproduces the per-batch fold exactly
    val want = reference(b1 ++ b2, 4.0, 30).sortBy(_.event_id)
    assert(got.map(_.event_id) == want.map(_.event_id))
    assert(got == want, "streamed z-scores diverged from the sequential reference")
    // the planted spikes flagged; the small-n type stayed silent
    assert(got.map(_.event_id).toSet == Set(2003L, 2007L))
    assert(got.forall(_.event_type == "a"))
    got.foreach(o => assert(math.abs(o.z_milli) > 4000))
  }

  test("anomaly state stays bounded: flags depend only on prior mass, not batch size") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val big = mkRows("c", 500, 10000, i => 5.0 + (i % 7) * 0.25)
    val spike = mkRows("c", 1, 99000, _ => 500.0)
    val stream = MemoryStream[ValueIn]
    val q = AnomalyStream.anomalyStream(stream.toDS())
      .writeStream.format("memory").queryName("anom_out2")
      .outputMode("append").start()
    stream.addData(big: _*); q.processAllAvailable()
    stream.addData(spike: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("anom_out2").as[AnomalyOut].collect().toSeq
    assert(got.map(_.event_id) == Seq(99000L))
    assert(got.head.n_before == 500L)
  }
}
