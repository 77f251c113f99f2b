package graft

import graft.analytics.Analytics
import org.apache.spark.sql.functions._

/** Gates for the mergeable-sketch surface (KLL quantiles, theta set
  * algebra) — both the exact regime the DuckDB oracle rides and the
  * estimation regime it cannot reach. */
class SketchSpec extends SparkSpec {

  test("KLL rollup: union-of-daily sketches == one-shot sketch (merge identity)") {
    graft.functions.GraftFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("value"))
    val merged = ev.groupBy("event_type", "d")
      .agg(expr("kll_agg(value)").as("sk"))
      .groupBy("event_type")
      .agg(expr("kll_quantile(kll_merge_agg(sk), 0.5d)").as("p50"),
        expr("kll_quantile(kll_merge_agg(sk), 0.9d)").as("p90"))
    val oneShot = ev.groupBy("event_type")
      .agg(expr("kll_quantile(kll_agg(value), 0.5d)").as("p50"),
        expr("kll_quantile(kll_agg(value), 0.9d)").as("p90"))
    // exact regime (n << k): both are true order statistics — identical
    assert(merged.exceptAll(oneShot).count() == 0
      && oneShot.exceptAll(merged).count() == 0)
  }

  test("q_sketch_quantiles matches exact inclusive-rank order statistics") {
    val got = Analytics.sketchQuantiles(spark, sfDir).collect()
    assert(got.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    got.foreach { r =>
      val vs = ev(r.getString(0))
      def incl(q: Double): Double = vs(math.ceil(q * vs.length).toInt - 1)
      assert(r.getAs[Long]("n") == vs.length)
      assert(r.getAs[Double]("p50") == incl(0.5), s"p50 ${r.getString(0)}")
      assert(r.getAs[Double]("p90") == incl(0.9), s"p90 ${r.getString(0)}")
      assert(r.getAs[Double]("p99") == incl(0.99), s"p99 ${r.getString(0)}")
    }
  }

  test("KLL estimation regime: rank error bounded after forced compaction") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val n = 200000
    // n >> k forces randomized compaction: quantiles become estimates
    val q = spark.range(n).map(_.toDouble).toDF("v")
      .agg(expr("kll_quantile(kll_agg(v), 0.5d)").as("p50"),
        expr("kll_quantile(kll_agg(v), 0.99d)").as("p99"),
        expr("kll_n(kll_agg(v))").as("cnt"))
      .head
    assert(q.getAs[Long]("cnt") == n, "N is exact even when values are sampled")
    // k = 32768 gives ~0.1% rank error at 99% confidence; allow 2%
    assert(math.abs(q.getAs[Double]("p50") - 0.5 * n) <= 0.02 * n)
    assert(math.abs(q.getAs[Double]("p99") - 0.99 * n) <= 0.02 * n)
  }

  test("KLL forced-compaction rank-error property sweep across distributions and quantiles") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // the estimation-regime property, swept: for n >> k, every returned
    // quantile's TRUE RANK (not value) is within the ±2% envelope — on
    // uniform, skewed, heavy-tied, sorted, reverse-sorted, and clumped
    // inputs (compaction is randomized; rank error is the contract the
    // KLL paper states, so rank is what the sweep measures)
    val n = 200000
    val dists: Seq[(String, Int => Double)] = Seq(
      ("uniform", i => i.toDouble),
      ("squared-skew", i => i.toDouble * i),
      ("heavy-ties", i => (i % 37).toDouble),
      ("sorted-clumps", i => (i / 1000).toDouble),
      ("reverse", i => (n - i).toDouble),
      ("alternating", i => if (i % 2 == 0) i.toDouble else (n - i).toDouble))
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    for ((dname, f) <- dists) {
      val vals = (0 until n).map(f)
      val sorted = vals.sorted
      val qCols = qs.zipWithIndex.map { case (q, i) =>
        expr(s"kll_quantile(kll_agg(v), ${q}d)").as(s"q$i") }
      val row = vals.toDF("v").agg(qCols.head, qCols.tail: _*).head
      for ((q, i) <- qs.zipWithIndex) {
        val est = row.getDouble(i)
        // true rank range of the returned value (ties span a range)
        val lo = sorted.search(est)(Ordering.Double.TotalOrdering) match {
          case scala.collection.Searching.Found(j) => j
          case scala.collection.Searching.InsertionPoint(j) => j
        }
        var hi = lo
        while (hi < n && sorted(hi) <= est) hi += 1
        val target = q * n
        val err = if (target < lo) (lo - target) / n
          else if (target > hi) (target - hi) / n else 0.0
        assert(err <= 0.02,
          s"$dname q=$q: value $est has rank [$lo,$hi], target $target (rank err $err)")
      }
    }
  }

  test("HLL rollup estimates are partition-layout invariant (register max-merge)") {
    import spark.implicits._
    // q_sketch_rollup's HLL path: register state is a per-register MAX
    // — order- and partitioning-invariant by algebra — so the union
    // estimate must be bit-identical across layouts; this is the
    // partition-invariance pin the rows-only oracle can't express
    def build(parts: Int): Array[org.apache.spark.sql.Row] =
      spark.range(100000).repartition(parts)
        .select((col("id") % 5).cast("string").as("g"),
          (col("id") % 20).as("d"), (col("id") % 9973).as("u"))
        .groupBy("g", "d").agg(expr("hll_sketch_agg(u, 12)").as("sk"))
        .groupBy("g")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
        .orderBy("g").collect()
    val a = build(3)
    val b = build(17)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getLong(1) == y.getLong(1),
        s"HLL estimate moved with partitioning for group ${x.getString(0)}")
    }
    // and approx_count_distinct (q_approx_stats' HLL++): same algebra
    def acd(parts: Int): Long = spark.range(100000).repartition(parts)
      .agg(approx_count_distinct(col("id") % 9973).as("c")).head.getLong(0)
    assert(acd(2) == acd(13), "approx_count_distinct moved with partitioning")
    // the SERIALIZED union image too (the q_theta_sketch discipline):
    // register state is a max — layout cannot move even the bytes
    def img(parts: Int): Seq[(String, Seq[Byte])] =
      spark.range(100000).repartition(parts)
        .select((col("id") % 5).cast("string").as("g"),
          (col("id") % 20).as("d"), (col("id") % 9973).as("u"))
        .groupBy("g", "d").agg(expr("hll_sketch_agg(u, 12)").as("sk"))
        .groupBy("g").agg(expr("hll_union_agg(sk, false)").as("img"))
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(img(3) == img(17),
      "HLL union serialized image moved with partitioning")
  }

  test("q_approx_stats honors both estimators' published error envelopes") {
    // the rows-only entry's strongest gate short of register-level SQL:
    // approx_count_distinct within HLL++'s default 5% rsd (generously
    // 3x) of the exact count the SAME row emits, and approx_percentile
    // within its 1/accuracy = 1/1000 RANK-error contract of the exact
    // per-type order statistics
    val got = Analytics.approxStats(spark, sfDir).collect()
    assert(got.nonEmpty)
    val vals = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted }
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val approxU = r.getAs[Long]("approx_users")
      val exactU = r.getAs[Long]("exact_users")
      assert(math.abs(approxU - exactU) <= math.max(2.0, 0.15 * exactU),
        s"$t: approx_users $approxU vs exact $exactU beyond 3x rsd")
      val sorted = vals(t)
      val p50 = r.getAs[Double]("approx_p50")
      val n = sorted.length
      // rank window: target n/2 with +-n/1000 (min 1) slack
      val slack = math.max(1, n / 1000)
      val lo = sorted(math.max(0, n / 2 - slack - 1))
      val hi = sorted(math.min(n - 1, n / 2 + slack))
      assert(p50 >= lo && p50 <= hi,
        s"$t: approx_p50 $p50 outside exact rank window [$lo,$hi]")
    }
  }

  test("theta set algebra is exact below the nominal budget on constructed overlap") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // A = [0, 1000), B = [600, 2000) => |A∩B| = 400, |A∪B| = 2000
    val df = (0L until 1000L).map(("a", _)) ++ (600L until 2000L).map(("b", _))
    val sk = df.toDF("t", "k").groupBy("t").agg(expr("theta_agg(k)").as("sk"))
    val a = sk.filter(col("t") === "a").head.getAs[Array[Byte]]("sk")
    val b = sk.filter(col("t") === "b").head.getAs[Array[Byte]]("sk")
    val r = spark.range(1).select(
      expr(s"theta_estimate(X'${a.map("%02x".format(_)).mkString}')").as("na"),
      expr(s"theta_intersect(X'${a.map("%02x".format(_)).mkString}', X'${b.map("%02x".format(_)).mkString}')").as("ni"),
      expr(s"theta_union2(X'${a.map("%02x".format(_)).mkString}', X'${b.map("%02x".format(_)).mkString}')").as("nu"),
      expr(s"theta_diff(X'${a.map("%02x".format(_)).mkString}', X'${b.map("%02x".format(_)).mkString}')").as("nd"))
      .head
    assert(r.getDouble(0) == 1000.0 && r.getDouble(1) == 400.0
      && r.getDouble(2) == 2000.0 && r.getDouble(3) == 600.0)
  }

  test("theta estimation regime: error envelope at 300k distinct keys") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val n = 300000L
    val est = spark.range(n).toDF("k")
      .agg(expr("theta_estimate(theta_agg(k))").as("e")).head.getDouble(0)
    // RSE ~ 1/sqrt(4096) = 1.56%; 5% is > 3 sigma
    assert(math.abs(est - n) <= 0.05 * n, s"theta estimate $est vs $n")
  }

  test("theta sketches are layout-independent: repartitioned build gives identical bytes") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // the retained set is the k smallest hashes — order/partitioning
    // cannot change it, so even the serialized image is stable
    def build(parts: Int) = spark.range(50000).repartition(parts).toDF("k")
      .agg(expr("theta_agg(k)").as("sk")).head.getAs[Array[Byte]]("sk")
    val r = spark.range(1).select(
      expr(s"theta_estimate(X'${build(2).map("%02x".format(_)).mkString}')").as("a"),
      expr(s"theta_estimate(X'${build(7).map("%02x".format(_)).mkString}')").as("b")).head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("q_theta_sketch: pairwise algebra satisfies inclusion-exclusion and symmetry bounds") {
    val rows = Analytics.thetaSetAlgebra(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, nu, ni, nd) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_union"), r.getAs[Long]("n_intersect"), r.getAs[Long]("n_only_a"))
      assert(nu == na + nb - ni, s"inclusion-exclusion broken: $r")
      assert(nd == na - ni, s"difference inconsistent: $r")
      assert(ni <= math.min(na, nb) && nu >= math.max(na, nb))
    }
  }

  test("sketch retention equals the exact user-level day-over-day recompute") {
    import org.apache.spark.sql.functions.{col, to_date}
    val byDay = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect()
      .groupBy(_.getAs[java.sql.Date]("day").toString)
      .view.mapValues(_.map(_.getAs[Long]("user_id")).toSet).toMap
    val got = Analytics.thetaRetention(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val day = r.getAs[java.sql.Date]("day")
      val next = day.toLocalDate.plusDays(1).toString
      val (a, b) = (byDay(day.toString), byDay(next))
      assert(r.getAs[Long]("n_active") == a.size)
      assert(r.getAs[Long]("n_retained") == a.intersect(b).size)
      assert(r.getAs[Long]("n_churned") == (a -- b).size)
      assert(r.getAs[Long]("retained_ppm") ==
        a.intersect(b).size.toLong * 1000000L / a.size)
    }
    // every day with a successor day is reported
    val want = byDay.keySet.count(d =>
      byDay.contains(java.time.LocalDate.parse(d).plusDays(1).toString))
    assert(got.length == want)
  }
}
