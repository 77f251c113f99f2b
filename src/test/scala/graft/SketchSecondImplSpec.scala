package graft

import graft.analytics.Analytics
import org.apache.spark.sql.functions._

/** Independent second implementations for the two rows-only sketch
  * entries (the `vec_pca` discipline applied to the estimator family):
  *
  *  - `q_sketch_rollup` (DataSketches HLL via hll_sketch_agg /
  *    hll_union_agg): the REGISTER ARRAY is reconstructed from scratch
  *    — own MurmurHash3 x64-128 (written from the public algorithm
  *    spec, verified against the library on a value sweep), own
  *    coupon mapping (slot = low lgK bits of h0, value =
  *    min(nlz(h1), 62) + 1), own per-slot max — and compared
  *    byte-for-byte against the registers decoded from the serialized
  *    image the PRODUCTION SQL path emits. The union is re-derived as
  *    an elementwise max of the daily register arrays. The estimate is
  *    recomputed with an independent textbook estimator (harmonic mean
  *    + linear counting) and boxed against both the library's estimate
  *    and the exact count.
  *  - `q_approx_stats` (Spark HLL++ via approx_count_distinct): a
  *    from-scratch textbook HLL (own hash, own registers, own
  *    estimator — NOT Spark's bias-table pipeline) runs over the same
  *    per-type user sets; both estimators must sit inside their
  *    published envelopes of the exact count and inside the combined
  *    envelope of each other. approx_percentile already carries the
  *    strictest possible second check — the exact rank-window gate in
  *    SketchSpec (the returned value's TRUE rank within the n/accuracy
  *    contract), which an independent sketch could not strengthen.
  */
class SketchSecondImplSpec extends SparkSpec {

  // ---- own MurmurHash3 x64-128, written from the public algorithm ----
  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }
  /** murmur3 x64-128 of ONE little-endian long (the 8-byte tail path —
    * all this spec hashes), returning (h1, h2). */
  private def murmur128Long(v: Long, seed: Long): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L; val c2 = 0x4cf5ad432745937fL
    var h1 = seed; var h2 = seed
    var k1 = v // 8-byte tail: k1 only, no k2, no body blocks
    k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  test("own murmur3 x64-128 matches the library on a value sweep (the shared substrate)") {
    val probe = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue) ++
      (0 until 500).map(i => i * 2654435761L + 17)
    probe.foreach { v =>
      val lib = org.apache.datasketches.hash.MurmurHash3.hash(Array(v), 9001L)
      val (h1, h2) = murmur128Long(v, 9001L)
      assert(h1 == lib(0) && h2 == lib(1), s"murmur mismatch at $v")
    }
  }

  // ---- serialized-image decoding (public DataSketches HLL format) ----
  /** curMode from the mode byte at offset 7 (low 2 bits: 0=LIST,
    * 1=SET, 2=HLL; next 2 bits carry the target type). */
  private def mode(img: Array[Byte]): Int = img(7) & 3
  /** HLL_8 registers: 40-byte preamble (10 preamble ints), then one
    * byte per slot. */
  private def decodeRegisters(img: Array[Byte], lgK: Int): Array[Int] = {
    assert((img(0) & 0xff) == 10, "HLL-mode image must carry 10 preamble ints")
    assert(img.length >= 40 + (1 << lgK))
    img.slice(40, 40 + (1 << lgK)).map(_ & 0xff)
  }
  /** LIST/SET-mode images carry raw 4-byte coupons after the preamble
    * (preints × 4 bytes); zero ints are empty slots (a valid coupon has
    * value ≥ 1, i.e. bit 26 set or higher). */
  private def decodeCoupons(img: Array[Byte]): Set[Int] = {
    val preBytes = (img(0) & 0xff) * 4
    val bb = java.nio.ByteBuffer.wrap(img).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (preBytes until img.length by 4).map(bb.getInt)
      .filter(_ != 0).toSet
  }

  /** my coupon for one long key, DataSketches semantics re-derived:
    * 26-bit address from h0, 6-bit value from h1's leading zeros. */
  private def myCoupon(v: Long): Int = {
    val (h0, h1) = murmur128Long(v, 9001L)
    val addr26 = (h0 & ((1L << 26) - 1)).toInt
    val value = math.min(java.lang.Long.numberOfLeadingZeros(h1), 62) + 1
    (value << 26) | addr26
  }
  private def myRegisters(keys: Iterable[Long], lgK: Int): Array[Int] = {
    val regs = new Array[Int](1 << lgK)
    keys.foreach { v =>
      val c = myCoupon(v)
      val slot = c & ((1 << lgK) - 1)
      val value = c >>> 26
      if (value > regs(slot)) regs(slot) = value
    }
    regs
  }

  /** independent textbook estimator over a register array: harmonic
    * mean with the standard alpha, linear counting when registers are
    * mostly empty — deliberately NOT the library's composite/HIP
    * pipeline, so agreement is algorithmic, not shared code. */
  private def textbookEstimate(regs: Array[Int]): Double = {
    val m = regs.length.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard for m >= 128
    val z = regs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / z
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  test("q_sketch_rollup registers reconstruct from scratch; union is the elementwise max") {
    // drive the PRODUCTION SQL path (hll_sketch_agg lgK=12 per (g, d),
    // hll_union_agg per g) on data big enough to force HLL mode, and
    // rebuild every register array independently
    import spark.implicits._
    val rows = (0L until 120000L).map(i => (s"t${i % 3}", i % 8, i % (9973 + (i % 3) * 700)))
    val df = rows.toDF("g", "d", "u")
    val daily = df.groupBy("g", "d").agg(expr("hll_sketch_agg(u, 12)").as("sk"))
    val dailyImgs = daily.collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getAs[Array[Byte]]("sk"))).toMap
    val unions = daily.groupBy("g").agg(expr("hll_union_agg(sk, false)").as("img"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .collect().map(r => (r.getString(0),
        (r.getAs[Array[Byte]]("img"), r.getLong(2)))).toMap
    val byGroupDay = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3)).toMap
    // 1. every daily sketch's registers == my from-scratch registers
    byGroupDay.foreach { case (key, keys) =>
      val img = dailyImgs(key)
      assert(mode(img) == 2, s"fixture must reach HLL mode for $key")
      assert(decodeRegisters(img, 12).toSeq == myRegisters(keys, 12).toSeq,
        s"register reconstruction diverged for $key")
    }
    // 2. the union image's registers == elementwise max of MY dailies
    //    == my one-shot registers over the group's full key set
    rows.groupBy(_._1).foreach { case (g, grows) =>
      val (uimg, libEst) = unions(g)
      val got = decodeRegisters(uimg, 12).toSeq
      val dailyMax = byGroupDay.filter(_._1._1 == g).values
        .map(myRegisters(_, 12)).reduce((a, b) => a.zip(b).map(t => t._1 max t._2))
      val oneShot = myRegisters(grows.map(_._3), 12)
      assert(got == dailyMax.toSeq, s"union != max-merge of dailies for $g")
      assert(got == oneShot.toSeq, s"union != one-shot registers for $g")
      // 3. independent estimator vs library estimate vs exact count:
      //    all three inside the lgK=12 envelope (rse = 1.04/sqrt(4096)
      //    = 1.63%; allow 3 sigma each way, doubled for the pairwise box)
      val exact = grows.map(_._3).distinct.size.toDouble
      val mine = textbookEstimate(oneShot)
      assert(math.abs(mine - exact) <= 0.05 * exact,
        s"$g: my estimate $mine vs exact $exact")
      assert(math.abs(libEst - exact) <= 0.05 * exact,
        s"$g: library estimate $libEst vs exact $exact")
      assert(math.abs(mine - libEst) <= 0.10 * exact,
        s"$g: estimators disagree: mine $mine vs library $libEst")
    }
  }

  test("q_sketch_rollup on the real events table: second implementation per emitted row") {
    // the production query's own output, re-derived: for each
    // event_type, rebuild the register state (or, below the HLL-mode
    // threshold, the exact coupon set) from the raw user_ids and box
    // est_users against the independent estimate and the exact count
    val got = Analytics.sketchRollup(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_days"), r.getAs[Long]("est_users"))).toMap
    assert(got.nonEmpty)
    val raw = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("user_id"))
      .collect().map(r => (r.getString(0), String.valueOf(r.get(1)), r.getLong(2)))
    val unionImgs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("user_id"))
      .groupBy("event_type", "d").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type").agg(expr("hll_union_agg(sk, false)").as("img"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("img")).toMap
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val (nDays, est) = got(t)
      assert(nDays == rs.map(_._2).distinct.size)
      val keys = rs.map(_._3)
      val exact = keys.distinct.size.toDouble
      val img = unionImgs(t)
      val mine =
        if (mode(img) == 2) {
          // HLL mode: registers must equal my reconstruction
          assert(decodeRegisters(img, 12).toSeq == myRegisters(keys, 12).toSeq,
            s"$t: register reconstruction diverged on real events")
          textbookEstimate(myRegisters(keys, 12))
        } else {
          // LIST/SET mode: the image stores raw coupons — my coupon
          // SET must match exactly, and counting it is the estimate
          val libCoupons = decodeCoupons(img)
          val myCoupons = keys.map(myCoupon).toSet
          assert(libCoupons == myCoupons,
            s"$t: coupon set diverged (${libCoupons.size} vs ${myCoupons.size})")
          myCoupons.size.toDouble
        }
      assert(math.abs(mine - exact) <= math.max(2.0, 0.05 * exact),
        s"$t: my estimate $mine vs exact $exact")
      assert(math.abs(est - exact) <= math.max(2.0, 0.05 * exact),
        s"$t: est_users $est vs exact $exact")
      assert(math.abs(mine - est) <= math.max(2.0, 0.10 * exact),
        s"$t: estimators disagree: mine $mine vs production $est")
    }
  }

  test("q_approx_stats HLL++: a from-scratch textbook HLL agrees within combined envelopes") {
    // Spark's approx_count_distinct (HLL++ with bias tables, rsd 5%)
    // against MY independent HLL (own hash, own registers, own
    // estimator, lgK=12 → rse 1.63%): both must box the exact count,
    // and each other, on every emitted row of the production query
    val got = Analytics.approxStats(spark, sfDir).collect()
    assert(got.nonEmpty)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val exact = r.getAs[Long]("exact_users").toDouble
      val sparkEst = r.getAs[Long]("approx_users").toDouble
      val mine = textbookEstimate(myRegisters(users(t), 12))
      // Spark HLL++ contract: rsd 0.05 default; 3 sigma = 15%
      assert(math.abs(sparkEst - exact) <= math.max(2.0, 0.15 * exact),
        s"$t: approx_count_distinct $sparkEst vs exact $exact")
      // my textbook HLL at lgK=12: 3 sigma = 5%
      assert(math.abs(mine - exact) <= math.max(2.0, 0.05 * exact),
        s"$t: my HLL $mine vs exact $exact")
      // and the two estimators against each other (sum of envelopes)
      assert(math.abs(mine - sparkEst) <= math.max(3.0, 0.20 * exact),
        s"$t: estimators disagree: mine $mine vs Spark $sparkEst")
    }
  }
}
