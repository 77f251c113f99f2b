package graft

import graft.streaming.DriftStream
import graft.streaming.DriftStream.{DriftOut, ValueIn}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DriftStreamSpec extends SparkSpec {

  /** sequential reference: one fold in (ts_us, event_id) order */
  private def reference(rows: Seq[ValueIn], ref: Map[String, Map[Long, Long]],
      every: Long): Seq[DriftOut] = {
    val st = scala.collection.mutable.Map[String, (Map[Long, Long], Long)]()
    val out = scala.collection.mutable.ArrayBuffer[DriftOut]()
    for (r <- rows.sortBy(x => (x.ts_us, x.event_id))) {
      val (h, n) = st.getOrElse(r.event_type, (Map.empty[Long, Long], 0L))
      val b = DriftStream.bucketOf(r.value)
      val h1 = h.updated(b, h.getOrElse(b, 0L) + 1L); val n1 = n + 1
      st(r.event_type) = (h1, n1)
      if (n1 % every == 0L) {
        val refH = ref.getOrElse(r.event_type, Map.empty[Long, Long])
        out += DriftOut(r.event_type, n1,
          DriftStream.tvdPpm(h1, n1, refH, refH.valuesIterator.sum))
      }
    }
    out.toSeq
  }

  private def mkRows(typ: String, n: Int, start: Long, f: Int => Double): Seq[ValueIn] =
    (0 until n).map(i => ValueIn(start + i, (start + i) * 1000L, typ, f(i)))

  // reference histogram: type "a" concentrated in buckets 0..3
  private val ref: Map[String, Map[Long, Long]] =
    Map("a" -> Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))

  test("streamed drift matches the sequential reference across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // first 100 events match the reference shape; the next 100 shift
    // wholesale into buckets 10..13 — drift must climb
    val inDist = mkRows("a", 100, 1000, i => (i % 4) * 5.0 + 1.0)
    val shifted = mkRows("a", 100, 2000, i => 50.0 + (i % 4) * 5.0)
    val all = inDist ++ shifted
    val want = reference(all, ref, 50L)

    for (splits <- Seq(Seq(all), Seq(inDist, shifted),
        all.grouped(37).toSeq)) {
      val stream = MemoryStream[ValueIn]
      val name = s"drift_out_${splits.size}"
      val q = DriftStream.driftStream(stream.toDS(), ref)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      splits.foreach { s => stream.addData(s: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(name).as[DriftOut].collect().toSeq.sortBy(_.n_seen)
      assert(got == want,
        s"streamed TVD diverged from the sequential reference at ${splits.size} splits")
    }
    // shape sanity: in-distribution checkpoints score low, the
    // post-shift checkpoints climb monotonically toward 50% mass moved
    val byN = want.map(o => o.n_seen -> o.tvd_ppm).toMap
    // n=50 carries quantization residue (13/13/12/12 vs uniform 25s);
    // n=100 hits the reference shape exactly
    assert(byN(50L) < 50000L && byN(100L) == 0L,
      s"in-distribution prefix should score ~0 TVD: $byN")
    assert(byN(150L) > 300000L && byN(200L) > byN(150L),
      s"shifted suffix should drive TVD up: $byN")
  }

  test("drift state stays bounded: adversarial value sweep clamps to the bucket cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // values sweep 0..10⁶ — unclamped bucketing would create 200k
    // state entries; the clamp pins everything ≥ 635 into bucket 127
    val sweep = mkRows("z", 100, 5000, i => i * 10000.0)
    val stream = MemoryStream[ValueIn]
    val q = DriftStream.driftStream(stream.toDS(), ref)
      .writeStream.format("memory").queryName("drift_sweep")
      .outputMode("append").start()
    stream.addData(sweep: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("drift_sweep").as[DriftOut].collect().toSeq
    // type "z" has no reference → 0-denominator guard emits tvd 0
    assert(got.map(_.n_seen).sorted == Seq(50L, 100L))
    assert(got.forall(_.tvd_ppm == 0L))
    // the clamp itself: every bucket id the fold produced is ≤ 127
    assert(sweep.map(r => DriftStream.bucketOf(r.value)).max == DriftStream.MaxBucket)
  }
}
