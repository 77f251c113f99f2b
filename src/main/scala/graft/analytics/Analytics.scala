package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational analytics re-expressing the reference's Part3 SQL surface
  * (stop.sql trip_full_view; Visualizations/q1..q5) plus the general
  * join/agg/window breadth a user of that warehouse needs.
  *
  * Scale notes (100 TB):
  *  - every dimension join (region/nation/customer/supplier/part) is an
  *    explicit `broadcast()` — no shuffle of the fact side;
  *  - monetary aggregates use exact integer cents (order-independent,
  *    no FP accumulation drift across 1000 executors);
  *  - per-key window queries partition once on the key and reuse the
  *    sort for every derived column.
  */
object Analytics {

  /** SUM(round(expr*100)) as exact integer cents — deterministic and
    * associative, so map-side partial aggregation is lossless. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Flagship: pricing summary (TPC-H Q1 shape) over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("sum_disc_price_cents"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Arbitrary GROUPING SETS aggregation — the slices a report needs
    * and nothing else, where ROLLUP/CUBE would compute every prefix /
    * every subset: ((flag, status), (flag), ()) here. One pass, one
    * shuffle — the expand operator replicates rows per set map-side and
    * the partial aggregation bounds what moves. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Distributed Pearson correlation the order-independent way: the
    * built-in `corr` accumulates floating-point state whose value
    * depends on partition merge order — fine statistically, but not
    * reproducible bit-for-bit across layouts. Accumulating the five
    * moments as EXACT integers (cents × payload-k) makes the aggregate
    * associative and layout-proof; the final correlation is one fixed
    * double expression over exact inputs. (At extreme scale the x²
    * moments move to DECIMAL(38) — same shape.) */
  def corrMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = cents(col("value"))
    val y = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, dir)
      .select(col("event_type"), x.as("x"), y.as("y"))
      // BOTH sides non-null: a null x would still count in n while
      // every sum() skips it — moments over inconsistent populations
      .filter(col("y").isNotNull && col("x").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_xy",
        (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
          (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")) *
            sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))))
      .select("event_type", "n", "sx", "sy", "sxy", "sxx", "syy", "corr_xy")
      .orderBy("event_type")
  }

  /** Relational set algebra over key sets — INTERSECT then EXCEPT with
    * SQL set-dedup semantics. Spark plans these as aggregate+semi/anti
    * joins, so they shuffle once on the key like any distinct. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String, thr: Double) =
      ev.filter(col("event_type") === t && col("value") > thr).select("user_id")
    ids("purchase", 150).intersect(ids("click", 150)).except(ids("error", 250))
      .orderBy("user_id")
  }

  /** NTILE quartile profile per event type: equal-frequency buckets
    * (the histogram twin for skewed distributions where fixed-width
    * bins collapse). EXACT ntile(4) semantics without the per-type
    * window: there are ~5 event types, so a type-partitioned window is
    * 5 hot keys each holding a data-scaled slice in one task — ranks
    * come from the two-phase bucketed row_number instead (value-range
    * cells spread each type's sort), and the tile assignment is the
    * closed-form integer formula over (rank, per-type n), n joined in
    * from a broadcast one-row-per-type count. */
  def ntileProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
    val ranked = twoPhaseRowNumber(e, Seq("event_type"), "value", "event_id",
      expr("CAST(floor(value) AS BIGINT)"), asc = true, out = "r")
    val counts = e.groupBy("event_type").agg(count(lit(1)).as("n_type"))
    ranked.join(broadcast(counts), Seq("event_type"))
      .withColumn("quartile", expr(
        "CASE WHEN r <= (n_type % 4) * (n_type div 4 + 1) " +
          "THEN (r - 1) div (n_type div 4 + 1) + 1 " +
          "ELSE (n_type % 4) + (r - (n_type % 4) * (n_type div 4 + 1) - 1) " +
          "div greatest(n_type div 4, 1) + 1 END"))
      .groupBy("event_type", "quartile")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .orderBy("event_type", "quartile")
  }

  /** trip_full_view (stop.sql:49-81): trip ⟕ breadcrumb ⟕ stop_events
    * ⇒ orders ⟕ customer ⟕ lineitem. No broadcast HINT on customer:
    * it scales with the data, so the planner/AQE must pick broadcast
    * only while it actually fits (it does at every test SF). */
  def tripView(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left")
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_orderstatus"),
        to_date(col("o_orderdate")).as("order_date"),
        col("l_linenumber"), col("l_quantity"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy(col("o_orderkey"), col("l_linenumber").asc_nulls_first)

  /** q1.py: latest key observed inside a 2-D bounding box → that key's
    * full trace. The box is two independent range predicates, exactly
    * the reference's lat/lon shape (q1.py:20-22): `value` plays
    * latitude and the props payload's `k` field plays longitude. The
    * 1-row subquery broadcasts into the trace join. */
  def latestTrace(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val lonK = get_json_object(col("props"), "$.k").cast("long")
    val target = ev
      .filter(col("value").between(200.0, 300.0) && lonK.between(25, 75))
      .orderBy(col("ts").desc, col("event_id"))
      .limit(1)
      .select(col("user_id").as("target_user"))
    ev.join(broadcast(target), col("user_id") === col("target_user"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** q2/q3/q4.py: hour-of-day + calendar-date + day-of-week slice. */
  def timeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(hour(col("ts")).between(16, 18)
        && to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21"))
        && dayofweek(col("ts")) === 1) // Sunday (q3.py EXTRACT(DOW)=0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        hour(col("ts")).as("event_hour"), col("value"))
      .orderBy("event_id")

  /** q5_3.py: threshold scan (speed > 25 on a date). */
  def thresholdScan(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value") > 250.0
        && to_date(col("ts")) === lit("2024-01-15"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  /** visualize_map.py: join to the key dimension, order each key's
    * points by time, number them — the polyline trace. */
  def tripTrace(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("seq", row_number().over(w))
      .orderBy("user_id", "seq")
  }

  /** 2-D density heatmap grid — the engine-side aggregation behind the
    * reference's map visualizations (`Part3/Visualizations/q1.py:34-47`
    * renders folium heat layers; the data step is exactly a bucketed
    * 2-D count): value-decile × hour-of-day cells with event counts and
    * exact cent mass. One map-side-combinable aggregate over the scan —
    * the output is bounded by the GRID (240 cells), never the data, so
    * the render payload is constant at any corpus size. */
  def heatmapGrid(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull &&
        col("value").isNotNull && col("value") >= 0 && col("value") < 1000)
      .select(expr("CAST(floor(value) AS BIGINT) div 100").as("value_bucket"),
        hour(col("ts")).cast("long").as("hour_of_day"),
        cents(col("value")).as("vc"))
      .groupBy("value_bucket", "hour_of_day")
      .agg(count(lit(1)).as("n"), sum("vc").as("sum_cents"))
      .orderBy("value_bucket", "hour_of_day")

  /** Trace decimation for map rendering — what `visualize_map.py` needs
    * at scale: a browser cannot draw every breadcrumb of every trip, so
    * each per-key ordered trace keeps every 10th point plus ALWAYS the
    * first and last (endpoint-preserving polyline decimation). Same
    * single keyed exchange as the full trace; the kept-point rule is a
    * pure expression over (row_number, count) so decimation adds no
    * extra shuffle. */
  def traceDownsample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val wn = Window.partitionBy("user_id")
    Tables.events(spark, dir)
      // a breadcrumb without a timestamp has no place on a polyline —
      // and NULL ordering differs across engines (Spark NULLS FIRST,
      // DuckDB NULLS LAST), so keeping them would make the kept set
      // engine-dependent the first time a data drop contains one
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("seq", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("seq") % 10 === 1 || col("seq") === col("n"))
      .withColumn("kept_rank", row_number().over(w).cast("long"))
      .select("user_id", "kept_rank", "event_id", "ts_us", "value")
      .orderBy("user_id", "kept_rank")
  }

  /** TPC-H Q3 shape: segment customers' unshipped-order revenue, top 10. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5 shape: revenue by nation through the full star. Only the
    * CONSTANT-size dims (nation=25, region=5 rows at any SF) carry
    * broadcast hints; customer/supplier scale with the data, so their
    * join strategy is left to the planner/AQE (broadcast while small,
    * shuffle when not). */
  def q5Region(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))

  /** EXISTS: customers having at least one high-value order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** NOT EXISTS: customers with no recent (2001+) orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy("c_custkey")

  /** Top-3 parts by retail price per brand (rank window). */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_cents"))
      .orderBy("p_brand", "rn")
  }

  /** Top-3 per brand through the custom heap-based TopKPerKey physical
    * operator (graft.plans) — same semantics as topnPerGroup but no
    * per-partition sort: one pass, bounded memory. */
  def topkCustom(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_brand", "p_partkey", "p_retailprice")
    graft.plans.TopK.perKey(part, 3, Seq("p_brand"), "p_retailprice", "p_partkey")
      .select(col("p_brand"), col("p_partkey"), cents(col("p_retailprice")).as("price_cents"))
      .orderBy("p_brand", "p_partkey")
  }

  /** ROLLUP over (priority, status) with exact cents totals. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_cents"))
      .orderBy("priority", "status")

  /** Conditional-aggregation pivot: order counts per priority × status. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** Running per-key cumulative total over time (exact cents). */
  def runningAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
      .withColumn("running_cents", sum(col("value_cents")).over(w))
      .select("event_id", "user_id", "running_cents")
      .orderBy("event_id")
  }

  /** Floored running balance per user — the inventory/credit/quota
    * recurrence b_i = max(0, b_{i-1} + Δ_i), which looks like it needs
    * a sequential per-key scan (the naive port is mapPartitions over
    * sorted groups) but has the exact closed form
    *
    *   b_i = P_i − min(0, min_{j≤i} P_j)        (P = prefix sum)
    *
    * so it rides TWO stacked window functions on ONE user_id exchange —
    * fully declarative, codegen'd, and scale-free. Deltas are cents
    * net of a 50-unit carrying cost (values are non-negative, so the
    * raw recurrence would never clamp); per user we report the final
    * and peak balance and how often the floor engaged. */
  def clampedBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (cents(col("value")) - lit(5000L)).as("delta_c"))
      .withColumn("pfx", sum("delta_c").over(w))
      .withColumn("floor_adj", least(min(col("pfx")).over(w), lit(0L)))
      .withColumn("balance_c", col("pfx") - col("floor_adj"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_tx"),
        max(struct(col("ts_us"), col("event_id"), col("balance_c")))
          .getField("balance_c").as("final_balance_c"),
        max("balance_c").as("peak_balance_c"),
        sum(when(col("balance_c") === 0, 1L).otherwise(0L)).as("n_floor_hits"))
      .orderBy("user_id")
  }

  val BootstrapReps = 32

  /** Deterministic Poisson bootstrap of the mean event value — the
    * uncertainty quantification every data-quality metric needs before
    * someone acts on a 0.3% shift. Each replicate b resamples the
    * corpus with Poisson(1) multiplicities, derived NOT from an RNG
    * but from md5(event_id:b) reduced mod 1e6 against the fixed
    * Poisson CDF thresholds — so 1000 executors, a re-run, and DuckDB
    * all draw the SAME resample (the thresholds are the contract).
    * Emits the full replicate table (the caller reads any CI off it);
    * the plan is one scan × B-fold explode into a map-side-combinable
    * B-group aggregate — the shuffle carries B·partitions rows, and
    * the B× explode work is the inherent cost of bootstrap. */
  def bootstrap(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), cents(col("value")).as("value_c"),
        explode(sequence(lit(0L), lit(BootstrapReps - 1L))).as("b"))
      .withColumn("u", expr(
        "CAST(conv(substr(md5(concat(cast(event_id AS string), ':', cast(b AS string))), 1, 8), 16, 10) AS BIGINT) % 1000000"))
      .withColumn("w", expr(
        """CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
          | WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
          | WHEN u < 996340 THEN 4 ELSE 5 END""".stripMargin))
      .groupBy("b")
      .agg(sum("w").as("n_samples"), sum(expr("w * value_c")).as("sum_c"))
      .withColumn("mean_c", expr("sum_c div n_samples"))
      .select("b", "n_samples", "sum_c", "mean_c")
      .orderBy("b")
  }

  val CvFolds = 5L
  val CvGapUs = 3600000000L // 1-hour purge between train end and val start

  /** Expanding-window time-series cross-validation folds with a purge
    * gap — the leakage-safe split protocol for anything temporal
    * (forecast eval, drift-robust model selection): fold k trains on
    * [t0, t0+k·slice) and validates on [t0+k·slice+gap, t0+(k+1)·slice),
    * never the reverse, with the gap absorbing label lookahead. The
    * time range is one 2-value aggregate; the 5-row fold table
    * broadcasts back over the scan into conditional counts — bounded
    * output, one pass, all epoch-micro integer arithmetic. */
  def tsCvFolds(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(unix_micros(col("ts")).as("ts_us"))
    val bounds = ev.agg(min("ts_us").as("t0"), max("ts_us").as("t1"))
    val ranges = spark.range(1, CvFolds + 1).select(col("id").as("fold"))
      .crossJoin(broadcast(bounds))
      .withColumn("slice", expr(s"(t1 - t0) div ${CvFolds + 1}"))
      .withColumn("train_end_us", expr("t0 + fold * slice"))
      .withColumn("val_start_us", expr(s"t0 + fold * slice + ${CvGapUs}L"))
      .withColumn("val_end_us", expr("t0 + (fold + 1) * slice"))
      .select("fold", "train_end_us", "val_start_us", "val_end_us")
    ev.crossJoin(broadcast(ranges))
      .groupBy("fold", "train_end_us", "val_start_us", "val_end_us")
      .agg(sum(when(col("ts_us") < col("train_end_us"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("ts_us") >= col("val_start_us")
          && col("ts_us") < col("val_end_us"), 1L).otherwise(0L)).as("n_val"))
      .orderBy("fold")
  }

  /** Sessionization: a >30-min silence starts a new session; flag with
    * lag, then a cumulative sum assigns session ids — two window ops,
    * one shuffle. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionsCore(spark, dir).orderBy("user_id", "session_id")

  /** The 30-min-gap session table without the presentation sort:
    * (user_id, session_id, n_events, start_us, end_us, sum_cents) —
    * all windows + the aggregation ride ONE user_id hash exchange.
    * Consumed by `sessionize` and the concurrency sweep. */
  private[graft] def sessionsCore(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
      .withColumn("new_session",
        when(col("ts_us") - lag("ts_us", 1).over(byTs) > 1800L * 1000000L, 1L)
          .when(lag("ts_us", 1).over(byTs).isNull, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        sum("value_cents").as("sum_cents"))
  }

  /** Two-phase sessionization — the HOT-KEY answer for per-key ordered
    * windows, which cannot be salted (order matters). Phase 1
    * sessionizes within (user, day): a billion-event key splits across
    * date buckets, so no single task owns a whole hot key. Phase 2
    * re-sessionizes PER USER over the phase-1 sessions themselves
    * (thousands× fewer rows than events), re-merging exactly the
    * chains a bucket boundary cut: a session is a maximal chain with
    * inter-event delta ≤ gap, boundaries only ever cut chains, and the
    * cut pieces satisfy next.start − prev.end ≤ gap iff they belonged
    * together. Output is row-identical to `sessionize` (same oracle,
    * spec-pinned equality). */
  def sessionizeScalable(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val dayUs = 86400L * 1000000L
    val byBucket = Window.partitionBy("user_id", "day")
      .orderBy(col("ts_us"), col("event_id"))
    val phase1 = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
      .withColumn("day", expr(s"ts_us div $dayUs"))
      .withColumn("new_session",
        when(col("ts_us") - lag("ts_us", 1).over(byBucket) > gapUs, 1L)
          .when(lag("ts_us", 1).over(byBucket).isNull, 1L).otherwise(0L))
      .withColumn("part_id",
        sum("new_session").over(byBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("day"), col("part_id"))
      .agg(count(lit(1)).as("n"), min("ts_us").as("start_us"),
        max("ts_us").as("end_us"), sum("value_cents").as("sum_cents"))
    val bySession = Window.partitionBy("user_id").orderBy("start_us")
    phase1
      .withColumn("new_session",
        when(col("start_us") - lag("end_us", 1).over(bySession) > gapUs, 1L)
          .when(lag("end_us", 1).over(bySession).isNull, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(bySession.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(sum("n").as("n_events"), min("start_us").as("start_us"),
        max("end_us").as("end_us"), sum("sum_cents").as("sum_cents"))
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "sum_cents")
      .orderBy("user_id", "session_id")
  }

  /** As-of join: align each 'error' event with the user's most recent
    * 'click' at-or-before it — the temporal correlation the reference
    * needs between breadcrumbs and stop events (trip_full_view joins
    * only on trip_id; the time dimension is this).
    *
    * Spark-first formulation: no per-row subquery and no range join —
    * union both streams, one shuffle+sort per user, and a running
    * last_value(ignoreNulls) carries the latest click forward. Scales
    * as a single window over the combined stream.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_ts").as("last_click_us"),
        (col("ts_us") - col("click_ts")).as("gap_us"))
      .orderBy("event_id")
  }

  /** Customer order-count distribution (TPC-H Q13 shape): left outer
    * join so zero-order customers count, then a histogram over the
    * per-customer counts — two aggregation levels, one shuffle each. */
  def custDist(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Large-volume orders (TPC-H Q18 shape): HAVING-style subquery on
    * the aggregate, joined back to the order/customer detail. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 150L)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        cents(col("o_totalprice")).as("total_cents"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** Sketch aggregates (HLL++ distinct, quantile sketch): the
    * constant-memory path for 100 TB cardinality/quantile questions.
    * Approximate by design → rows-only gate, with the exact twins
    * (`q_percentiles`, `etl_service_key.n_users`) as cross-checks. */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Robust anomaly profile per event type: median + MAD (median
    * absolute deviation) and the count of values beyond 3 MADs — the
    * outlier screen that, unlike mean/stddev, a few extreme values
    * cannot drag around. Two exact-percentile passes with the tiny
    * per-type stats broadcast back between them. All arithmetic is on
    * integer CENTS, so medians/MADs are exact binary fractions (.0/.5
    * steps) and every engine agrees bit-for-bit. Exact percentile
    * state stays bounded because the value domain is bounded (cents);
    * on an unbounded domain the approx-percentile twin
    * (`q_approx_stats`) is the scale path and this is the auditor. */
  /** A/B cohort comparison with a chi-square independence test: users
    * split by the deterministic id parity (stand-in for an assignment
    * column), outcome = EARLY conversion (first purchase within 24 h
    * of first activity — "did they ever purchase" saturates on a
    * long-lived panel). Emits the full 2×2 contingency table and the
    * χ² statistic — the "is this difference real" gate on any
    * experiment readout. All four (O−E)²/E terms are written out in
    * one fixed expression over exact integer counts, so the
    * arithmetic is IEEE-deterministic in every engine (+,−,×,÷ only,
    * fixed order, round(6) presentation). One combinable per-user
    * aggregate, then a 1-row reduction. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val perUser = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("first_purchase_us"))
      .withColumn("converted",
        when(col("first_purchase_us").isNotNull &&
          col("first_purchase_us") - col("first_us") <= DayUs, 1L).otherwise(0L))
      .withColumn("cohort", pmod(col("user_id"), lit(2)))
    val cells = perUser.agg(
      sum(when(col("cohort") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("a_conv"),
      sum(when(col("cohort") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("a_not"),
      sum(when(col("cohort") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("b_conv"),
      sum(when(col("cohort") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("b_not"))
    cells
      .withColumn("n_total", expr("CAST(a_conv + a_not + b_conv + b_not AS DOUBLE)"))
      .withColumn("e_ac", expr("(a_conv+a_not) * (a_conv+b_conv) / n_total"))
      .withColumn("e_an", expr("(a_conv+a_not) * (a_not+b_not) / n_total"))
      .withColumn("e_bc", expr("(b_conv+b_not) * (a_conv+b_conv) / n_total"))
      .withColumn("e_bn", expr("(b_conv+b_not) * (a_not+b_not) / n_total"))
      .withColumn("chi2", expr(
        """round((a_conv-e_ac)*(a_conv-e_ac)/e_ac + (a_not-e_an)*(a_not-e_an)/e_an
          | + (b_conv-e_bc)*(b_conv-e_bc)/e_bc + (b_not-e_bn)*(b_not-e_bn)/e_bn, 6)""".stripMargin))
      .select("a_conv", "a_not", "b_conv", "b_not", "chi2")
  }

  /** Offline changepoint estimation per event type — the CUSUM argmax:
    * with S_i = (running value sum)·n − i·(total sum) (an EXACT
    * integer, = n²·(running mean − global mean) up to scale), the
    * drift point estimate is argmax |S_i|, and max|S_i| is the drift
    * magnitude. Detects "the level shifted somewhere" without any
    * libm: all integer arithmetic, deterministic (abs, ts, id)
    * tie-break, one ordered window + one argmax aggregate per type
    * off a single exchange. BIGINT bound: |S| ≤ n·Σx — swap to
    * DECIMAL38 beyond ~10⁹ cents·rows per type (same trade as
    * q_gini). */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    // per-type running (rank, prefix sum) WITHOUT the per-type window
    // (~5 hot keys = 5 one-task sorts at scale): rank and cumsum are
    // local to (type, clock-hour) cells, then shifted by a broadcast
    // per-cell offset table (count + sum prefixes over the bounded
    // types × hours dimension) — the q_concurrency/globalShuffleShards
    // prefix machinery, here carrying TWO running quantities at once
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("vc"))
      .withColumn("_bkt", expr("ts_us div 3600000000"))
    val wCell = Window.partitionBy("event_type", "_bkt")
      .orderBy(col("ts_us"), col("event_id"))
    val offW = Window.partitionBy("event_type").orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = e.groupBy("event_type", "_bkt")
      .agg(count(lit(1)).as("_cn"), sum("vc").as("_cs"))
      .withColumn("_offn", coalesce(sum("_cn").over(offW), lit(0L)))
      .withColumn("_offs", coalesce(sum("_cs").over(offW), lit(0L)))
      .select("event_type", "_bkt", "_offn", "_offs")
    val totals = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vc").as("sx"))
    e.withColumn("_lr", row_number().over(wCell).cast("long"))
      .withColumn("_ls", sum("vc").over(
        wCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), Seq("event_type", "_bkt"))
      .join(broadcast(totals), Seq("event_type"))
      .withColumn("i", col("_offn") + col("_lr"))
      .withColumn("s_i", col("_offs") + col("_ls"))
      .withColumn("cusum", col("s_i") * col("n") - col("i") * col("sx"))
      .withColumn("abs_cusum", abs(col("cusum")))
      .groupBy(col("event_type"))
      .agg(max("n").as("n"),
        max_by(struct(col("ts_us"), col("i"), col("cusum")),
          struct(col("abs_cusum"), (-col("ts_us")).as("nt"),
            (-col("event_id")).as("ni"))).as("peak"),
        max("abs_cusum").as("max_abs_cusum"))
      .select(col("event_type"), col("n"),
        col("peak.ts_us").as("peak_ts_us"), col("peak.i").as("peak_pos"),
        col("peak.cusum").as("peak_cusum"), col("max_abs_cusum"))
      .orderBy("event_type")
  }

  /** RFM customer segmentation over the event panel: per user recency
    * (days since last activity, against the corpus max date so the
    * result is data-determined, not wall-clock), frequency (events),
    * monetary (integer cents) — each quintile-scored (deterministic
    * user_id tie-break), best = 5. Output is the BOUNDED cell table
    * (≤125 rows): members + per-cell totals — the standard
    * retention/marketing segmentation.
    *
    * The quintiles are EXACT ntile(5) semantics but computed WITHOUT a
    * global window: an unpartitioned ntile funnels the whole user
    * table through one task (the q_global_rank lesson). Instead each
    * metric gets a two-phase row_number — local ranks within key-RANGE
    * buckets (bucket = a coarsening of the sort key, so bucket order
    * IS sort order) plus a broadcast one-row-per-bucket prefix-offset
    * table — and ntile's tile function is closed-form integer
    * arithmetic over (row_number, n): the first n%5 tiles take
    * ⌈n/5⌉ users, the rest ⌊n/5⌋, exactly the window function's
    * contract. The only driver value is the user COUNT (one number).
    * `rfmNtileWindow` keeps the window formulation as the spec's
    * row-equality twin. */
  def rfmSegmentation(spark: SparkSession, dir: String): DataFrame =
    rfmFrom(rfmPerUser(spark, dir), twoPhase = true)

  /** The single-window formulation (global ntile) — spec-pinned
    * row-identical to the two-phase path; kept as the verification
    * twin, not wired to `queries`. */
  def rfmNtileWindow(spark: SparkSession, dir: String): DataFrame =
    rfmFrom(rfmPerUser(spark, dir), twoPhase = false)

  private def rfmPerUser(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val perUser = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"), sum(cents(col("value"))).as("cents"))
    // corpus max date as a broadcast scalar, not a global window (an
    // unpartitioned `max() OVER ()` funnels the user table through one
    // task just to read one number)
    val mx = perUser.agg(max("last_us").as("max_us"))
    perUser.crossJoin(broadcast(mx))
      .withColumn("recency_days", expr(s"(max_us - last_us) div $DayUs"))
      .drop("max_us")
  }

  /** Two-phase exact row_number (optionally per partition group):
    * local rank inside key-range buckets + broadcast
    * one-row-per-(group, bucket) prefix offsets — the
    * globalShuffleShards machinery, parameterized by direction and
    * grouping. `bucket` MUST be a monotone coarsening of `key` (same
    * direction). Replaces global/hot-key rank windows that would
    * funnel a data-scaled table through one task. */
  private[graft] def twoPhaseRowNumber(df: DataFrame, partCols: Seq[String],
      key: String, tie: String, bucket: Column, asc: Boolean,
      out: String): DataFrame = {
    val b = df.withColumn("_bkt", bucket)
    val cellCols = partCols :+ "_bkt"
    val inCell = Window.partitionBy(cellCols.map(col): _*).orderBy(
      (if (asc) Seq(col(key).asc, col(tie).asc)
       else Seq(col(key).desc, col(tie).asc)): _*)
    val offW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(if (asc) col("_bkt").asc else col("_bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(cellCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(offW), lit(0L)))
      .select(cellCols.map(col) :+ col("_off"): _*)
    b.withColumn("_lr", row_number().over(inCell).cast("long"))
      .join(broadcast(offsets), cellCols)
      .withColumn(out, col("_off") + col("_lr"))
      .drop("_bkt", "_lr", "_off")
  }

  /** ntile(k=5) as closed-form integer arithmetic over (row_number, n):
    * tiles 1..n%5 hold ⌈n/5⌉ rows, the rest ⌊n/5⌋ — the exact window
    * contract. Guarded against q=0 (n<5: every row falls in the
    * boundary branch, but ANSI division still evaluates the other). */
  private def tileOf(rCol: String, n: Long): Column = {
    val q = n / 5; val m = n % 5; val boundary = m * (q + 1)
    // integral `div` throughout — floor(a/b) over doubles would lose
    // exactness past 2^53 rows
    expr(s"CASE WHEN $rCol <= $boundary THEN ($rCol - 1) div ${q + 1} + 1 " +
      s"ELSE $m + ($rCol - $boundary - 1) div ${math.max(q, 1L)} + 1 END")
  }

  private def rfmFrom(perUser: DataFrame, twoPhase: Boolean): DataFrame = {
    val scored =
      if (!twoPhase)
        perUser
          .withColumn("r", ntile(5).over(Window.orderBy(col("recency_days").desc, col("user_id"))).cast("long"))
          .withColumn("f", ntile(5).over(Window.orderBy(col("freq"), col("user_id"))).cast("long"))
          .withColumn("m", ntile(5).over(Window.orderBy(col("cents"), col("user_id"))).cast("long"))
      else {
        val n = perUser.count() // the one driver-side value: |users|
        val ranked = Seq(
          ("recency_days", false, "rr"), ("freq", true, "rf"), ("cents", true, "rm"))
          .foldLeft(perUser) { case (df, (k, asc, out)) =>
            // bucket widths: days are already coarse (identity), freq is
            // small-integer (identity), cents by 1000-dollar ranges —
            // each a monotone coarsening with a bounded offset table
            val bkt = k match {
              case "cents" => expr("cents div 100000")
              case other   => col(other)
            }
            twoPhaseRowNumber(df, Nil, k, "user_id", bkt, asc, out)
          }
        ranked
          .withColumn("r", tileOf("rr", n))
          .withColumn("f", tileOf("rf", n))
          .withColumn("m", tileOf("rm", n))
      }
    scored.groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("rfm_cell"))
      .agg(count(lit(1)).as("n_users"), sum("freq").as("n_events"),
        sum("cents").as("sum_cents"))
      .orderBy("rfm_cell")
  }

  /** Hourly burst detection against a trailing baseline: an hour is a
    * burst when its event count exceeds the trailing-24h-mean by 3
    * Poisson standard deviations (mean + 3·√mean — the rate-alarm
    * every ops dashboard runs). The hourly rollup is one combinable
    * aggregate (bounded by the time range); the trailing window runs
    * on that bounded table. √ is IEEE-correctly-rounded, so the
    * flag and the round(6) scores are engine-identical. */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000000L
    // RANGE frame over the hour INDEX, not a ROWS frame: empty hours
    // produce no rollup row, so a row frame would reach past any
    // outage to the 24 nearest OBSERVED hours — comparing against a
    // stale baseline; the value-range frame means "the last 24 CLOCK
    // hours", and base_n === 24 certifies a gap-free baseline
    val trailing = Window.orderBy("hour_idx").rangeBetween(-24, -1)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(expr(s"unix_micros(ts) div $HourUs").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
      .withColumn("base_n", count(lit(1)).over(trailing))
      .withColumn("base_mean", round(avg(col("n")).over(trailing), 6))
      .filter(col("base_n") === 24)
      .withColumn("hour_us", col("hour_idx") * HourUs)
      .withColumn("threshold", round(col("base_mean") + lit(3.0) * sqrt(col("base_mean")), 6))
      .withColumn("is_burst", col("n") > col("threshold"))
      .select("hour_us", "n", "base_mean", "threshold", "is_burst")
      .orderBy("hour_us")
  }

  /** Revenue-concentration (Gini) profile per market segment — the
    * inequality metric behind "do 20% of customers drive 80% of
    * revenue". Exact integer arithmetic throughout: with per-segment
    * revenues x sorted ascending (rank i, 1-based), Gini numerator =
    * 2·Σi·x_i − (n+1)·Σx — one rank window on the BOUNDED per-customer
    * rollup (never on orders) and one aggregation; reported in ppm via
    * integer div, so every engine reproduces identical bits. */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), Seq("o_custkey"))
    // per-segment rank WITHOUT a per-segment window: only ~5 segments
    // exist, so a segment-partitioned window is 5 hot keys each holding
    // a data-scaled customer slice in one task — the two-phase bucketed
    // rank spreads each segment over its revenue-range cells instead
    twoPhaseRowNumber(rev, Seq("c_mktsegment"), "rev_cents", "o_custkey",
        expr("rev_cents div 100000"), asc = true, out = "i")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum("rev_cents").as("total_cents"),
        sum(col("i") * col("rev_cents")).as("s1"))
      // the ppm multiply exceeds BIGINT at scale (num ~ n·Σx ~ 10¹⁴ ×
      // 10⁶) — widen to exact DECIMAL(38,0); IntegralDivide truncates
      // and everything is non-negative, so this matches HUGEINT `//`
      .withColumn("gini_ppm", expr(
        """(CAST(2 AS DECIMAL(38,0)) * s1 - CAST(n_customers + 1 AS DECIMAL(38,0)) * total_cents)
          | * 1000000 div (CAST(n_customers AS DECIMAL(38,0)) * total_cents)""".stripMargin))
      .select("c_mktsegment", "n_customers", "total_cents", "gini_ppm")
      .orderBy("c_mktsegment")
  }

  /** Seasonal-naive forecast backtest: predict each (type, day, hour)
    * cell's cent mass with the SAME HOUR YESTERDAY and score the error
    * — the baseline every real forecaster must beat, and the shape of
    * any backtest harness (align predictions with actuals by key,
    * aggregate errors). One hourly rollup (combinable, bounded by
    * types × hours in range), one self-join on the day-shifted key,
    * and WAPE reported as exact integer ppm (Σ|a−f|·10⁶ div Σa —
    * the weighted form has no per-row division, so zero-actual hours
    * need no epsilon and the integer arithmetic is engine-exact). */
  def forecastEval(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"),
        hour(col("ts")).as("h"))
      .agg(sum(cents(col("value"))).as("a"))
    val fc = hourly.select(col("event_type"), date_add(col("d"), 1).as("d"),
      col("h"), col("a").as("f"))
    hourly.join(fc, Seq("event_type", "d", "h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
        sum("a").as("actual_cents"),
        sum(abs(col("a") - col("f"))).as("abs_err_cents"))
      .withColumn("wape_ppm",
        expr("CAST(CAST(abs_err_cents AS DECIMAL(38,0)) * 1000000 div actual_cents AS BIGINT)"))
      .orderBy("event_type")
  }

  /** Week-over-week revenue change per event type — the calendar-
    * aligned period comparison behind every trend dashboard (vs
    * `runningAgg`'s row-cumulative and `retention`'s cohort offsets):
    * ISO-week buckets, integer cents, and the delta as exact integer
    * ppm of the prior week. Weekly rollup is one combinable aggregate
    * (output bounded by types × weeks); the lag window runs on that
    * bounded table, never on events. */
  def weekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val byWeek = Window.partitionBy("event_type").orderBy("week_start")
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("week_start"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("rev_cents"))
      .withColumn("prev_cents", lag("rev_cents", 1).over(byWeek))
      .withColumn("wow_change_ppm",
        expr("CAST(CAST(rev_cents - prev_cents AS DECIMAL(38,0)) * 1000000 div prev_cents AS BIGINT)"))
      .select("event_type", "week_start", "n_events", "rev_cents",
        "prev_cents", "wow_change_ppm")
      .orderBy("event_type", "week_start")
  }

  /** User-journey path mining: the top-20 3-step event-type sequences
    * walked within a (user, day) — the "what do users actually do"
    * sequence profile behind funnel design. Trigram rows come straight
    * from two `lead()`s on ONE (user, day) exchange — no per-session
    * array collection, no explode; the count is a map-side-combinable
    * aggregate bounded by |types|³. */
  def pathMining(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("date").as("d"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  /** Join-key skew diagnosis — the operational report read BEFORE
    * choosing salting/AQE strategies: the 10 hottest user_id keys with
    * their row share, alongside global key stats (total rows, distinct
    * keys) for the skew ratio. One combinable per-key count; the top-k
    * is a bounded sort; the 1-row global tally broadcast-crosses in. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val totals = perKey.agg(sum("n").as("n_total_rows"),
      count(lit(1)).as("n_distinct_keys"))
    val w = Window.orderBy(col("n").desc, col("user_id"))
    perKey.orderBy(col("n").desc, col("user_id")).limit(10)
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("n * 1000000 div n_total_rows"))
      .select("rank", "user_id", "n", "share_ppm",
        "n_total_rows", "n_distinct_keys")
      .orderBy("rank")
  }

  /** Last-touch marketing attribution: each purchase credits the most
    * recent click/view of the same user within a 24 h lookback; outside
    * the window (or with no prior touch) it books as 'none'. The touch
    * lookup is an IGNORE-NULLS window over ONE user_id exchange — the
    * as-of family without a join — pulling (ts, id, type) as one struct
    * so all three attributes come from the SAME touch row; the rollup
    * is a 3-row aggregate by credited channel. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("vc"))
    val back = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("ts_us").as("t_us"), col("event_id").as("t_id"),
        col("event_type").as("t_type")))
    ev.withColumn("last_touch", last(touch, ignoreNulls = true).over(back))
      .filter(col("event_type") === "purchase")
      .withColumn("credited",
        when(col("last_touch").isNull, "none")
          .when(col("ts_us") - col("last_touch.t_us") > DayUs, "none")
          .otherwise(col("last_touch.t_type")))
      .groupBy(col("credited").as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), sum("vc").as("attributed_cents"))
      .orderBy("touch_type")
  }

  /** Percentile winsorization per event type: clip values to the exact
    * p05/p95 ORDER STATISTICS (rank-based, index = (n−1)·p div 100 + 1 —
    * integer arithmetic, no interpolated quantile, so every engine
    * picks the identical row) and report clip counts and the
    * winsorized sum against the raw sum — the outlier-capping step
    * before a mean/σ is trustworthy. One value-ordered window per type
    * finds both bounds; the bounded per-type stats table joins back by
    * broadcast. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("vc"))
    // per-type order statistics WITHOUT a per-type window (5 hot keys,
    // each a data-scaled one-task sort): two-phase bucketed ranks +
    // broadcast per-type counts, the q_gini/q_rfm machinery
    val ranked = twoPhaseRowNumber(e, Seq("event_type"), "vc", "event_id",
        expr("vc div 1000"), asc = true, out = "rn")
      .join(broadcast(e.groupBy("event_type").agg(count(lit(1)).as("n"))),
        Seq("event_type"))
    val bounds = ranked
      .filter(col("rn") === expr("(n-1)*5 div 100 + 1") ||
        col("rn") === expr("(n-1)*95 div 100 + 1"))
      .groupBy("event_type")
      .agg(min("vc").as("lo_cents"), max("vc").as("hi_cents"))
    e.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min("lo_cents").as("lo_cents"), min("hi_cents").as("hi_cents"),
        sum("vc").as("sum_raw_cents"),
        sum(least(greatest(col("vc"), col("lo_cents")), col("hi_cents")))
          .as("sum_winsorized_cents"),
        sum(when(col("vc") < col("lo_cents"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("vc") > col("hi_cents"), 1L).otherwise(0L)).as("n_clip_hi"))
      .orderBy("event_type")
  }

  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("vc"))
    val med = e.groupBy("event_type")
      .agg(expr("percentile(vc, 0.5)").as("med_cents"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("vc") - col("med_cents")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad_cents"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med_cents"), col("mad_cents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad_cents") * 3, 1L).otherwise(0L)).as("n_outliers"))
      .select("event_type", "med_cents", "mad_cents", "n", "n_outliers")
      .orderBy("event_type")
  }

  /** Nearest-direction as-of: each error aligns to the CLOSEST click
    * in either direction (ties → the earlier click) — sensor-alignment
    * semantics, vs `asofJoin`'s backward-only lookup. Same
    * sort-once/no-join shape: both directional candidates come from
    * one union + two frames over ONE user_id exchange, then an exact
    * integer argmin picks the side. Signed gap (positive = click
    * before the error) keeps the direction visible. */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    // both directions as RUNNING frames: an unbounded-FOLLOWING frame
    // makes WindowExec re-scan the partition tail per row (O(rows²)
    // per key — latent here because per-user partitions are small at
    // test SF, lethal on a hot key at scale); the forward scan rides
    // a descending sort instead, on the same user_id exchange
    val back = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickTs = when(col("event_type") === "click", col("ts_us"))
    ev.withColumn("prev_click", last(clickTs, ignoreNulls = true).over(back))
      .withColumn("next_click", last(clickTs, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "error")
      .withColumn("nearest_click_us",
        when(col("prev_click").isNull, col("next_click"))
          .when(col("next_click").isNull, col("prev_click"))
          .when(col("ts_us") - col("prev_click") <= col("next_click") - col("ts_us"),
            col("prev_click"))
          .otherwise(col("next_click")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("nearest_click_us"),
        (col("ts_us") - col("nearest_click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** Mergeable-sketch rollup — the 100 TB distinct-count pattern: one
    * pass builds a tiny Apache DataSketches HLL per (type, day)
    * partition, and every coarser granularity (per type here) comes
    * from UNIONING sketches, never rescanning events. Registers take
    * pairwise max, so the union is associative/commutative/idempotent:
    * any partitioning, any merge order, late-arriving daily sketches —
    * same estimate. The spec pins the mergeability identity
    * (union-of-daily == one-shot sketch) and a 5% error envelope
    * against exact distincts. */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("user_id"))
      .groupBy("event_type", "d")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_users"))
      .orderBy("event_type")
  }

  /** Hash-oracled companion of `q_sketch_rollup` (r10 verdict item 7,
    * the `vec_pca_check` pattern): the HLL registers themselves have
    * no SQL replay, but the two contracts the rows-only entry leans on
    * are SQL-expressible as a bounded boolean row per type —
    *  - mergeability: union-of-daily-sketches == one-shot sketch
    *    (registers take pairwise max, so the union is associative /
    *    commutative / idempotent; both sides computed in-engine
    *    through DIFFERENT aggregation trees);
    *  - the ≤5% error envelope vs the EXACT distinct count, where the
    *    exact count is genuinely cross-engine (DuckDB recomputes it
    *    from parquet).
    * The oracle emits the exact counts plus literal TRUE for both
    * booleans: a broken merge or a blown envelope flips an engine
    * boolean and fails the hash, while `n_exact` anchors the row to
    * real data — so the sketch path gains a cross-engine anchor even
    * though its estimates stay engine-specific. lgK = 12 matches the
    * production entry. */
  def sketchRollupCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("user_id"))
    val unioned = ev.groupBy("event_type", "d")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_union"))
    val oneshot = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_oneshot"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    unioned.join(oneshot, Seq("event_type")).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        (col("est_union") === col("est_oneshot")).as("identity_ok"),
        (abs(col("est_union") - col("n_exact")) <= col("n_exact") * 0.05)
          .as("within_5pct"))
      .orderBy("event_type")
  }

  /** Per-(vehicle, service-day) trip summary — the reference's
    * trip-dimension report shape (trip duration, meter delta, event
    * count, mean headway between breadcrumbs) as ONE map-side-
    * combinable aggregation: no window, no sort, partials fold, so at
    * 100 TB this is a plain hash aggregate bounded by vehicles × days.
    * Headway and duration are exact integer `div` arithmetic
    * (engine-identical); a single-event trip has no headway (NULL).
    * Reference anchor: Part3/Visualizations q2/q5_1 read per-trip
    * point sets; this is their per-trip profile rollup. */
  def tripSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("vc"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        min("vc").as("min_cents"), max("vc").as("max_cents"),
        sum("vc").as("sum_cents"))
      .withColumn("duration_s", expr("(end_us - start_us) div 1000000"))
      .withColumn("mean_headway_s",
        when(col("n_events") > 1,
          expr("((end_us - start_us) div 1000000) div (n_events - 1)")))
      .orderBy("user_id", "d")

  /** Mergeable QUANTILE rollup — the distribution twin of
    * [[sketchRollup]]'s distinct counts: one pass builds a KLL doubles
    * sketch per (type, day), and the per-type quantile profile comes
    * from UNIONING the daily sketches (graft's `kll_merge_agg`
    * TypedImperativeAggregate), never rescanning events. A partial is
    * O(k) bytes regardless of row count and the merge is
    * associative/commutative — the shape that lets a 100 TB fleet keep
    * daily sketches hot and answer any-granularity percentile queries
    * by merge alone (`percentile_approx` has the sketch inside but
    * throws the state away; this keeps it as data).
    *
    * Oracle strategy: KLL is EXACT (true inclusive-rank order
    * statistics) while n ≤ k = 32768, which holds for every per-type
    * row count at the test SFs, so DuckDB recomputes the same values
    * from a cumulative-weight window. Beyond k the sketch degrades to
    * a ±1.65%%-rank randomized estimate (the SketchSpec pins that
    * envelope on constructed data); the merge identity is spec-pinned
    * too (union-of-daily == one-shot). */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val daily = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("d"), col("value"))
      .groupBy("event_type", "d")
      .agg(expr("kll_agg(value)").as("sk"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), expr("kll_merge_agg(sk)").as("m"))
      .select(col("event_type"), col("n_days"),
        expr("kll_n(m)").as("n"),
        expr("kll_quantile(m, 0.5d)").as("p50"),
        expr("kll_quantile(m, 0.9d)").as("p90"),
        expr("kll_quantile(m, 0.99d)").as("p99"))
      .orderBy("event_type")
  }

  /** Sketch SET ALGEBRA over audience overlap: per-type theta sketches
    * of distinct users, then |A|, |B|, |A∪B|, |A∩B|, |A\B| for every
    * type pair — the intersection/difference estimates HLL registers
    * fundamentally cannot produce (max-merge loses set identity).
    * Theta sketches keep the k smallest key hashes, so every set op is
    * a hash-set operation on bounded state: the per-type aggregate is
    * one map-side-combinable pass over events (O(2^lgK) partials), and
    * the pair matrix is a self-join of |types| sketch rows — bounded,
    * nothing driver-side.
    *
    * Oracle strategy: a theta sketch is EXACT below its nominal entry
    * budget (2^12 here vs ≤1500 users/type at every test SF), and the
    * retained set is the k smallest hashes — order-independent, so
    * exactness survives any partitioning. DuckDB recomputes the plain
    * distinct-set algebra; the SketchSpec pins the estimation-regime
    * error envelope (±3/√k) on constructed 100k-key data. */
  def thetaSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sk = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(expr("theta_agg(user_id)").as("sk"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("theta_estimate(ska)").cast("long").as("n_a"),
        expr("theta_estimate(skb)").cast("long").as("n_b"),
        expr("theta_union2(ska, skb)").cast("long").as("n_union"),
        expr("theta_intersect(ska, skb)").cast("long").as("n_intersect"),
        expr("theta_diff(ska, skb)").cast("long").as("n_only_a"))
      .orderBy("type_a", "type_b")
  }

  /** Sketch-based day-over-day retention: per-day theta sketches of
    * active users, consecutive-day INTERSECTION for the retained
    * count, difference for churn — the retention dashboard computed
    * entirely in sketch space. The exact cohort operator (`retention`,
    * Analytics.scala) joins user-level rows across days — at 100 TB
    * that is a users×days shuffle; this one reduces each day to a
    * 2^12-hash sketch in one map-side-combinable aggregate and the
    * day-pair join moves only sketch images (#days rows), which is why
    * sketch retention is the production shape for long windows.
    * Exactness contract mirrors q_theta_sketch: below the 2^lgK
    * retained-hash budget the sketch holds every distinct user hash,
    * so counts are EXACT and the DuckDB distinct-set oracle matches;
    * beyond it the ±3/√k envelope applies (SketchSpec pins that
    * regime). */
  def thetaRetention(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sk = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("theta_agg(user_id)").as("sk"))
    val a = sk.select(col("day"), col("sk").as("ska"))
    val b = sk.select(col("day").as("next_day"), col("sk").as("skb"))
    a.join(b, col("next_day") === date_add(col("day"), 1))
      .select(col("day"),
        expr("theta_estimate(ska)").cast("long").as("n_active"),
        expr("theta_intersect(ska, skb)").cast("long").as("n_retained"),
        expr("theta_diff(ska, skb)").cast("long").as("n_churned"))
      .withColumn("retained_ppm", expr("n_retained * 1000000 div n_active"))
      .orderBy("day")
  }

  /** Exact interpolated percentiles of event value per type (p50/p90). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Robust per-type outlier detection: median/MAD modified z-score.
    * Mean/stddev anomaly rules break on the very outliers they hunt
    * (one huge value drags the mean and inflates sigma until nothing
    * flags); the median absolute deviation is 50%-breakdown robust, so
    * the fences hold no matter how wild the tail is. Two tiny
    * aggregation passes (per-type median over exact cents, then
    * per-type median of absolute deviations), each producing one row
    * per event type, broadcast back over the scan — the corpus itself
    * is never shuffled, so the plan is two scans + two O(|types|)
    * broadcasts at any scale. Flags rows with |x − med| > 5·MAD; cents
    * are integers and interpolated medians land on exact halves, so
    * the double arithmetic is engine-exact and the oracle hash-matches
    * (no epsilon). */
  def robustAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), cents(col("value")).as("vc"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(vc, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("vc") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("absdev") > lit(5.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("vc"),
        col("med"), col("mad"))
      .orderBy("event_id")
  }

  /** Native session windows (30-min gap) via the built-in
    * session_window operator — same session semantics as the manual
    * lag/cumsum sessionization, but expressed as a single grouping
    * operator that also runs under Structured Streaming. Window end =
    * last event + gap by definition. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("sum_cents"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"), col("sum_cents"))
      .orderBy("user_id", "start_us")

  /** CUBE over (priority, status): every grouping-set slice — the
    * cross-cutting breakdowns ROLLUP's hierarchy can't express. Spark
    * expands grouping sets inside one aggregation; at scale this is
    * still a single shuffle on the grouping-id-extended key. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_cents"))
      .orderBy("priority", "status")

  /** Trailing time-range moving aggregate: each event's per-user count
    * and total over the preceding 30 minutes via a RANGE frame — the
    * moving-average speed profile over the reference's breadcrumb
    * stream. One shuffle on the key; every frame rides the same sort. */
  def movingAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-1800L * 1000000L, 0L)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_cents", sum("value_cents").over(w))
      .select("event_id", "user_id", "ts_us", "win_n", "win_cents")
      .orderBy("event_id")
  }

  /** Ordered arg-extremes per key in ONE aggregation pass — first/last
    * event type by time and the peak-value event — via min_by/max_by
    * over (ordering, tiebreak) structs. No window, no per-partition
    * sort: map-side partials fold, so at 100 TB this is a plain
    * combinable aggregate where the window formulation would sort. */
  def argExtremes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
      .groupBy("user_id")
      .agg(
        min_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("first_type"),
        max_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("last_type"),
        max_by(col("event_id"), struct(col("value_cents"), col("event_id"))).as("peak_event_id"),
        max(col("value_cents")).as("peak_cents"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  /** Exact per-key mode (most frequent event_type per user, ties → the
    * lexicographically smallest type). Two stacked hash aggregations —
    * (user, type) counts, then a single-pass `min_by` argmax over
    * `(-n, type)` struct ordering — so both levels are map-side
    * combinable and there is NO per-user sort window anywhere: at
    * 100 TB the shuffled payload is bounded by |users|×|types|, not by
    * events. */
  def modePerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(
        min_by(col("event_type"), struct((-col("n")).as("neg_n"), col("event_type")))
          .as("mode_type"),
        max(col("n")).as("n_mode"),
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_types"))
      .orderBy("user_id")

  /** Fixed-width value histogram (bin = floor(value/20)) — the
    * distribution profile behind the reference's range validations;
    * a single map-side-combinable aggregation. */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(floor(col("value") / 20).cast("long").as("bin"),
        cents(col("value")).as("value_cents"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("value_cents").as("min_cents"), max("value_cents").as("max_cents"))
      .orderBy("bin")

  /** Interval (range) join, binned: for each 'error' event, the
    * same-user 'click' activity in the preceding 5 minutes. A naive
    * range join is O(clicks×errors) per user at scale; quantizing time
    * into 5-min bins makes it an equi-join on (user, bin) with exactly
    * 2 candidate bins per error, the precise range predicate filtering
    * inside the bucket — bounded fan-out at any scale. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val W = 300L * 1000000L // 5 minutes in micros
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("value_cents"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("value_cents").as("c_cents"))
    val errBins = errors.withColumn("bin",
      explode(array(expr(s"ts_us div $W - 1"), expr(s"ts_us div $W"))))
    val clickBins = clicks.withColumn("bin", expr(s"c_ts div $W"))
    val matched = errBins.join(clickBins, Seq("user_id", "bin"))
      .filter(col("c_ts") >= col("ts_us") - W && col("c_ts") <= col("ts_us"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"), sum("c_cents").as("click_cents"))
    errors.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_cents"), lit(0L)).as("click_cents"))
      .orderBy("event_id")
  }

  /** Skewed fact ⋈ dim through the salting utility (graft.ops.SkewJoin)
    * — hot keys spread over 8 shuffle buckets — aggregated to revenue
    * per market segment. Result is oracle-checked against the plain
    * join: salting must not change semantics. */
  def skewJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), cents(col("value")).as("value_cents"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.ops.SkewJoin.saltedJoin(ev, dim, "user_id", 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("value_cents").as("sum_cents"))
      .orderBy("c_mktsegment")
  }

  /** Unpivot (melt): widen-format lineitem measures → long-format
    * (measure, value) rows via the stack() table generator, then a
    * per-measure profile — the inverse of pivotAgg. stack() is
    * generated inline (no shuffle to reshape); the only exchange is
    * the 3-group aggregation. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .selectExpr(
        """stack(3,
          | 'quantity', CAST(l_quantity AS BIGINT) * 100,
          | 'price_cents', CAST(round(l_extendedprice * 100) AS BIGINT),
          | 'discount_bps', CAST(round(l_discount * 10000) AS BIGINT)
          |) AS (measure, value_long)""".stripMargin)
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), sum("value_long").as("sum_value"),
        min("value_long").as("min_value"), max("value_long").as("max_value"))
      .orderBy("measure")

  /** Exact distinct keys per tumbling window — the per-bucket
    * cardinality profile (the exact twin of the HLL path in
    * q_approx_stats, time-bucketed). */
  def windowedDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("w.start")).as("bucket_us"),
        col("n_events"), col("n_users"))
      .orderBy("bucket_us")

  /** 10-minute tumbling-window aggregation — the batch twin of the
    * Structured Streaming pipeline in graft.streaming. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("event_type"),
        col("n"), col("sum_cents"))
      .orderBy("bucket_us", "event_type")

  /** Correlated scalar-subquery decorrelation (TPC-H Q17 shape):
    * "lineitems below half their part's average quantity". The
    * correlated `avg` per outer row would be O(n) subquery executions;
    * decorrelated it is ONE per-part aggregate joined back to the fact —
    * the rewrite Catalyst applies to `IN`/scalar subqueries, written
    * explicitly here so the plan is visible and auditable. The
    * avg-threshold predicate is kept in exact integer form
    * (2·qty·cnt < Σqty ⇔ qty < 0.5·avg, cnt > 0) so it is associative,
    * FP-free, and oracle-identical across engines. Both sides shuffle
    * on l_partkey once; the per-part aggregate is map-side partial. */
  def correlatedAvg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum(col("qty")).as("part_sum_qty"), count(lit(1)).as("part_cnt"))
    li.join(perPart, "l_partkey")
      .filter(lit(2) * col("qty") * col("part_cnt") < col("part_sum_qty"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small_lots"),
        sum(cents(col("l_extendedprice"))).as("value_cents"))
      .orderBy("p_brand")
  }

  /** Nested semi-join chain (TPC-H Q20 shape): suppliers that shipped
    * more than 80 total units of some widget part. The inner HAVING
    * aggregate runs once over lineitem (map-side partial on the
    * (supp, part) pair), is semi-joined to the name-filtered part dim
    * (broadcast — parts prune before the join), and the surviving
    * supplier keys semi-join the supplier dim. No fact row survives
    * past its aggregate; nothing fans out. */
  def nestedSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 80)
    val widgetHeavy = heavy.join(
      broadcast(Tables.part(spark, dir)
        .filter(col("p_name").contains("widget")).select("p_partkey")),
      col("l_partkey") === col("p_partkey"))
    Tables.supplier(spark, dir)
      .join(widgetHeavy.select("l_suppkey"),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** Z-order (Morton-curve) layout profile: quantize two query
    * dimensions to 16 bits each, interleave them with the codegen'd
    * `zorder2` expression, and bucket the curve. Rows sharing a curve
    * bucket are tight in BOTH dimensions at once — the property that
    * makes file-level min/max statistics prune scans for predicates on
    * EITHER column after a `repartitionByRange(zval).sortWithinPartitions
    * (zval)` write (Delta/Iceberg OPTIMIZE ZORDER, as a plan). The
    * profile emitted here certifies the locality: every 10-bit bucket
    * bounds each dimension to a 2¹¹-wide slab (spec-pinned). All
    * quantization is integer arithmetic — engine-exact. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .selectExpr(
        "(least(greatest(cast(round(value*100) as bigint), 0), 30000) * 65535) div 30000 as zx",
        "(hour(ts) * 65536) div 24 as zy")
      .selectExpr("zx", "zy", "zorder2(zx, zy) as zval")
      .withColumn("z_bucket", expr("zval div 4194304")) // top 5 bits of each dim
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min("zx").as("min_zx"), max("zx").as("max_zx"),
        min("zy").as("min_zy"), max("zy").as("max_zy"))
      .orderBy("z_bucket")
  }

  /** Ordered-step funnel (view → click → purchase, each within 24 h of
    * the previous step): the behavioral-analytics operator a product
    * warehouse runs constantly. Each step is ONE aggregate on user_id
    * (first qualifying event) joined to the previous step's one-row-per-
    * user frame — no fan-out, monotonically shrinking step tables, and
    * every join/aggregate shares the user_id shuffle key. The window
    * predicate uses exact timestamp arithmetic (no FP). */
  /** The funnel's per-user step frames — shared by the count funnel and
    * the step-latency distribution. */
  private def funnelSteps(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, prevTs: String, etype: String, outTs: String) =
      ev.filter(col("event_type") === etype)
        .join(prev.select(col("user_id"), col(prevTs)), "user_id")
        .filter(col("ts") > col(prevTs) &&
          col("ts") <= col(prevTs) + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as(outTs), min(col(prevTs)).as(prevTs))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = step(s1, "t1", "click", "t2")
    val s3 = step(s2, "t2", "purchase", "t3")
    (s1, s2, s3)
  }

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val (s1, s2, s3) = funnelSteps(spark, dir)
    def counted(df: DataFrame, idx: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx.toLong).as("step"), lit(name).as("step_name"),
          col("n_users"))
    counted(s1, 1, "view")
      .unionAll(counted(s2, 2, "click"))
      .unionAll(counted(s3, 3, "purchase"))
      .orderBy("step")
  }

  /** Step-latency distribution for funnel converters: per transition,
    * exact integer min / lower-median / lower-p90 / max seconds between
    * the step timestamps. Same histogram-window shape as
    * `weightedMedian`: the cumulative scan runs over (transition,
    * DISTINCT gap-seconds), bounded by distinct latencies, and every
    * quantile is a least-value-crossing filter in exact integers — no
    * percentile_approx sketch, no driver sort, no float. */
  def funnelTime(spark: SparkSession, dir: String): DataFrame = {
    val (_, s2, s3) = funnelSteps(spark, dir)
    def gaps(df: DataFrame, name: String, from: String, to: String) =
      df.select(lit(name).as("transition"),
        expr(s"(unix_micros($to) - unix_micros($from)) div 1000000").as("gap_s"))
    val g = gaps(s2, "view_to_click", "t1", "t2")
      .unionByName(gaps(s3, "click_to_purchase", "t2", "t3"))
    val byGap = Window.partitionBy("transition").orderBy("gap_s")
    g.groupBy("transition", "gap_s").agg(count(lit(1)).as("w"))
      .withColumn("cum", sum("w").over(byGap))
      .withColumn("n", sum("w").over(Window.partitionBy("transition")))
      .groupBy("transition")
      .agg(max("n").as("n_users"),
        min("gap_s").as("min_s"),
        min(when(col("cum") * 2 >= col("n"), col("gap_s"))).as("median_s"),
        min(when(col("cum") * 10 >= col("n") * 9, col("gap_s"))).as("p90_s"),
        max("gap_s").as("max_s"))
      .orderBy("transition")
  }

  /** Cohort retention matrix: users grouped by first-active date, then
    * counted per day-offset they return. The (user, day) activity grid
    * is deduped once, the cohort anchor is a per-user min, and both the
    * anchor join and the matrix aggregation ride the same user_id
    * shuffle; day arithmetic is integer datediff. Output is bounded by
    * cohorts × horizon, not by events. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val cohort = active.groupBy("user_id").agg(min("d").as("cohort_date"))
    active.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")).cast("long"))
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_date", "day_offset")
  }

  /** Islands-and-gaps streak detection: longest run of CONSECUTIVE
    * active days per user. The classic trick — row_number the distinct
    * active days per user, subtract it (in days) from the date: members
    * of one unbroken run share the anchor date, so a plain groupBy
    * counts each island. One shuffle on user_id drives the distinct,
    * the window, and the island aggregation; all arithmetic is integer
    * date math (no FP, no session-gap heuristics). */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val anchored = days.withColumn("island",
      date_sub(col("d"), row_number().over(
        Window.partitionBy("user_id").orderBy("d")).cast("int")))
    anchored.groupBy("user_id", "island")
      .agg(count(lit(1)).as("streak"))
      .groupBy("user_id")
      .agg(max(col("streak")).as("longest_streak"),
        sum(col("streak")).as("n_active_days"))
      .orderBy("user_id")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next type | current type). One shuffle on user_id
    * drives the lead() sequencing; the |types|² count matrix that
    * leaves it is tiny at any corpus size, so the normalizing window
    * runs on a trivial frame. Order is pinned by (ts, event_id) —
    * deterministic under equal timestamps — and probabilities are one
    * exact IEEE division of two exact longs (layout-reproducible). */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("p", col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy("from_type")).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** Exact weighted median (lower-median convention: least v with
    * 2·cumweight(v) ≥ totalweight) of line price weighted by quantity,
    * per return flag — the "median price paid per unit" statistic,
    * where the plain median over rows mis-weights multi-unit lines.
    *
    * Scale shape: pre-aggregating to (flag, DISTINCT cents) first means
    * the ordered cumulative window runs over the value histogram, not
    * the row stream — |distinct prices| per flag, corpus-independent
    * for bounded price domains. Everything is exact integers (cents ×
    * long weights); no percentile_approx sketch error, no driver sort. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("l_returnflag").orderBy("cents")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag", "cents").agg(sum("qty").as("w"))
      .withColumn("cumw", sum("w").over(byVal))
      .withColumn("tw", sum("w").over(Window.partitionBy("l_returnflag")))
      .filter(col("cumw") * 2 >= col("tw"))
      .groupBy("l_returnflag")
      .agg(min("cents").as("wmedian_cents"), max("tw").as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** Benford first-digit audit over order totals — the classic
    * fabricated-numbers screen: observed leading-digit shares vs the
    * Benford expectation log10(1+1/d), with the chi-square distance.
    * The digit comes from exact integer cents (round→bigint→string),
    * never from float log10, whose boundary error at exact powers of
    * ten would misclassify. One map-side-combinable 9-group aggregate:
    * embarrassingly parallel at any scale. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    digits
      .withColumn("obs_share", round(col("n") / sum("n").over(total), 6))
      .withColumn("exp_share", round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("chi2_term", round(
        pow(col("obs_share") - col("exp_share"), 2) / col("exp_share"), 6))
      .select("digit", "n", "obs_share", "exp_share", "chi2_term")
      .orderBy("digit")
  }

  /** Disjunctive (OR-predicate) join without a nested loop: count
    * customer×supplier pairs matching `same nation OR same
    * account-balance bucket`. A literal OR join degenerates to a
    * cartesian BroadcastNestedLoopJoin; the scalable rewrite is
    * inclusion-exclusion over three EQUI-joins — |A∪B| = |A| + |B| −
    * |A∩B|, where each term is a hash-join count (the intersection
    * joins on the composite key). Counts flow as partial aggregates;
    * no pair set ever materializes. */
  def disjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bkt"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nat"),
        floor(col("s_acctbal") / 1000).cast("long").as("bal_bkt"))
    def pairCount(name: String, keys: Seq[String]): DataFrame = {
      val c = cust.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nc"))
      val s = sup.groupBy(keys.map(col): _*).agg(count(lit(1)).as("ns"))
      // per-key pair count = nc*ns; joining the two PRE-AGGREGATED key
      // histograms makes the join size |distinct keys|, not |rows|
      c.join(s, keys).agg(coalesce(sum(col("nc") * col("ns")), lit(0L)).as(name))
    }
    // three 1-row scalar aggregates composed declaratively (cross joins
    // of single-row frames — no driver action, one submitted job)
    pairCount("n_nation", Seq("nat"))
      .crossJoin(pairCount("n_bucket", Seq("bal_bkt")))
      .crossJoin(pairCount("n_both", Seq("nat", "bal_bkt")))
      .select(col("n_nation"), col("n_bucket"), col("n_both"),
        (col("n_nation") + col("n_bucket") - col("n_both")).as("n_union"))
  }

  /** Exact GLOBAL rank of every order by price — row-identical to
    * `rank() OVER (ORDER BY price DESC)` — without that window's fatal
    * plan: an un-partitioned window is ONE task sorting the whole
    * table. Two-phase bucketed ranking instead: (1) rows bucket by a
    * fixed price-range split (bucket count bounded by the VALUE DOMAIN
    * — ~600 buckets for any row count, the same bounded-dimension trick
    * as seqPack's prefix sum); per-bucket counts prefix-sum descending
    * into offsets (a window over one row per bucket). (2) rank within
    * each bucket in parallel, add the bucket's offset. Exactness:
    * bucket boundaries split by value, so rows in a higher bucket are
    * strictly greater and TIES never straddle buckets — offset +
    * in-bucket rank reproduces rank()'s tie-and-gap semantics. At
    * 100 TB the only global step touches #buckets rows; everything
    * else is hash-parallel. (Value skew concentrates rows in few
    * buckets ⇒ re-split hot buckets by a finer modulus — same
    * recursion TeraSort applies to sampled ranges.) */
  def globalRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    val bucketed = o.withColumn("bucket", expr("price_cents div 1000000"))
    val byBucketDesc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum("n").over(byBucketDesc), lit(0L)))
      .select("bucket", "offset")
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("global_rank",
        (col("offset") + rank().over(
          Window.partitionBy("bucket").orderBy(col("price_cents").desc)))
          .cast("long"))
      .select("o_orderkey", "price_cents", "global_rank")
      .orderBy("global_rank", "o_orderkey")
  }

  /** Value-concentration slice (TPC-H Q11 shape): parts whose revenue
    * share exceeds 1.5× the average part share — the HAVING-against-a-
    * global-scalar-subquery pattern, with a DATA-ADAPTIVE threshold
    * (a fixed ppm cut would select everything at small part counts and
    * nothing at large ones — the same reason TPC-H divides Q11's
    * fraction by SF). The scalar (total, n_parts) rides a 1×1
    * broadcast crossJoin, never an unpartitioned window (a
    * `sum() OVER ()` would funnel the per-part table through one task
    * to read one number). Revenue is exact cent·pct integers
    * (price_cents · (100 − disc_pct)); per-part sums widen to
    * DECIMAL(38,0) — at ~10⁹ cent·pct per row the BIGINT Σ dies near
    * 10¹⁰ rows — and the threshold compare cross-multiplies
    * (2·v·n > 3·tot ⟺ share > 1.5× average) so no division decides
    * membership. One hash aggregate over l_partkey is the only
    * data-scaled shuffle. */
  def valueShare(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
      .groupBy("l_partkey")
      .agg(sum(col("rev_cp").cast("decimal(38,0)")).as("v"))
    val total = perPart.agg(sum("v").as("tot"), count(lit(1)).as("np"))
    perPart.crossJoin(broadcast(total))
      .filter(col("v") * col("np") * 2 > col("tot") * 3)
      .select(col("l_partkey"), col("v").cast("long").as("part_value_cp"),
        expr("CAST(v * 1000000 div tot AS BIGINT)").as("share_ppm"))
      .orderBy(col("part_value_cp").desc, col("l_partkey"))
  }

  /** Sole-blame late suppliers (TPC-H Q21 shape): suppliers who
    * shipped late (> 60 days after the order date) on a multi-supplier
    * order where EVERY other supplier shipped on time — the classic
    * EXISTS + NOT-EXISTS double correlation, expressed as one
    * left-semi ("some other supplier participated") and one left-anti
    * ("no other supplier was late") join against the same distinct
    * (order, supplier) pair set. All three legs are equi-joins on
    * l_orderkey with the supplier-inequality as a residual condition —
    * per-key work is bounded by order width, so the shape survives any
    * corpus size; the tail is a TakeOrdered heap, not a global sort. */
  def lateBlame(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
    // three consumers (the blamed set, the some-other-supplier semi
    // side, the other-late anti side) — pin the distinct pair table
    // once instead of re-scanning lineitem per leg (measured: 5 fact
    // scans without this, 1 with; the pair table is |order×supplier|
    // participations, far smaller than the fact table)
    val pairs = li.groupBy("ok", "sk").agg(max("late").as("late"))
      .localCheckpoint(true)
    val late = pairs.filter(col("late")).select("ok", "sk")
    val all = pairs.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val lateOther = pairs.filter(col("late"))
      .select(col("ok").as("ok3"), col("sk").as("sk3"))
    val blamed = late
      .join(all, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(lateOther, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
    blamed.groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir), col("sk") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Dormant high-balance customers (TPC-H Q22 shape): customers with
    * an above-average positive account balance and no order since the
    * dormancy cutoff (2000-01-01 — in this dataset every customer has
    * SOME order, so the classic "no orders at all" predicate is
    * vacuous; the filtered NOT EXISTS is the same plan shape with a
    * pushed-down date filter on the anti side), rolled up per nation.
    * The average is exact integral cents (Σ div n over the
    * positive-balance population, a 1×1 broadcast crossJoin); the
    * dormancy predicate is one left-anti equi-join on o_custkey whose
    * right side is the date-pruned orders scan; the nation rollup is a
    * bounded-output hash aggregate. Nothing sorts or windows the
    * customer table. */
  def dormantRich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
    val avgPos = cust.filter(col("bal_c") > 0)
      .agg(expr("sum(bal_c) div count(1)").as("avg_c"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_c") > col("avg_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
      .orderBy("c_nationkey")
  }

  /** Per-(user, type) 30-minute-gap sessions as [start,end] micro
    * intervals — the shared interval builder for the overlap join.
    * One (user) exchange carries the lag window, the session-id
    * running sum, and the bounds aggregate. */
  private def sessionsOf(spark: SparkSession, dir: String, typ: String): DataFrame = {
    val GapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type") === typ)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_s",
        when(col("ts_us") - coalesce(lag("ts_us", 1).over(w), lit(Long.MinValue / 4)) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("new_s").over(run))
      .groupBy("user_id", "sess")
      .agg(min("ts_us").as("s_us"), max("ts_us").as("e_us"))
  }

  /** Interval×interval overlap join (click sessions, padded to a ±1 h
    * attribution window, × error sessions per user): which error
    * bursts landed within an hour of a user's click activity — the
    * incident-attribution primitive (unpadded sessions in this data
    * are near-points and touch almost never). The scale shape is the
    * standard BUCKETED interval join: each (padded) interval explodes
    * to its covered hour buckets (fan-out bounded by 1 + duration/1h —
    * sessions are gap-bounded, so short), the join is a plain hash
    * equi-join on (user, bucket), and each overlapping pair is kept
    * EXACTLY ONCE at its canonical bucket — the hour of
    * max(padded start_a, start_b), which both sides provably generate
    * when the intervals overlap (max(starts) ≤ min(ends) lies inside
    * both). No inequality-only join, no product, no dedup shuffle.
    * Closed intervals; touching windows overlap with overlap_us = 0;
    * reported bounds are the RAW session bounds, overlap is measured
    * on the padded window. */
  def overlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000000
    def bucketed(df: DataFrame, p: String, pad: Long): DataFrame =
      df.select(col("user_id"), col("s_us").as(s"${p}_s_us"), col("e_us").as(s"${p}_e_us"),
        explode(expr(s"sequence((s_us - $pad) div $HourUs, (e_us + $pad) div $HourUs)"))
          .as("bucket"))
    val a = bucketed(sessionsOf(spark, dir, "click"), "a", HourUs)
    val b = bucketed(sessionsOf(spark, dir, "error"), "b", 0L)
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("a_s_us") - HourUs <= col("b_e_us") &&
        col("b_s_us") <= col("a_e_us") + HourUs)
      .filter(col("bucket") === expr(s"greatest(a_s_us - $HourUs, b_s_us) div $HourUs"))
      .select(col("user_id"), col("a_s_us"), col("a_e_us"), col("b_s_us"), col("b_e_us"),
        (least(col("a_e_us") + HourUs, col("b_e_us")) -
          greatest(col("a_s_us") - HourUs, col("b_s_us"))).as("overlap_us"))
      .orderBy("user_id", "a_s_us", "b_s_us")
  }

  /** Time-weighted average value per user (TWAP): each event's value
    * holds until the next event, weights capped at one hour (the
    * standard last-observation-carried-forward cap so a vanished user
    * doesn't weight their final tick forever) — ONE user exchange
    * carries the lead window and the aggregate. The Σ value·weight
    * numerator is ~3.6×10¹⁶ per row (cents × hour-micros): widened to
    * DECIMAL(38,0), where a BIGINT Σ would overflow at ~250 rows. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000000
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        cents(col("value")).as("v_c"))
      .withColumn("w_us",
        least(coalesce(lead("ts_us", 1).over(w) - col("ts_us"), lit(HourUs)), lit(HourUs)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ticks"),
        sum("w_us").as("held_us"),
        sum(expr("CAST(v_c AS DECIMAL(38,0)) * w_us")).as("_num"))
      .withColumn("twap_c", expr("CAST(_num div held_us AS BIGINT)"))
      .select("user_id", "n_ticks", "held_us", "twap_c")
      .orderBy("user_id")
  }

  /** Herfindahl-Hirschman concentration index of supplier revenue
    * within each nation — "is this market one supplier in a trench
    * coat": HHI = Σᵢ shareᵢ² in exact ppm via cross-multiplication
    * (Σv²·10⁶ div (Σv)² — no per-supplier division, no floats). Two
    * stacked hash aggregates — (nation, supplier) revenue, then the
    * bounded per-nation moment sums; v² runs in DECIMAL(38,0) where
    * the BIGINT square of a ~10¹³ cent·pct revenue already overflows. */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"),
        col("s_suppkey"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
      .groupBy("s_nationkey", "s_suppkey")
      .agg(sum(col("rev_cp").cast("decimal(38,0)")).as("v"))
    perSupp.groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("v").as("_tot"), sum(expr("v * v")).as("_sq"))
      .withColumn("hhi_ppm", expr("CAST(_sq * 1000000 div (_tot * _tot) AS BIGINT)"))
      .select("s_nationkey", "n_suppliers", "hhi_ppm")
      .orderBy("s_nationkey")
  }

  /** Cohort lifetime value: per signup-week cohort, purchase revenue
    * by age-week plus the cumulative LTV and per-capita LTV — the
    * revenue companion to `q_retention`'s activity table. Everything
    * is integer date math (epoch-day div 7 weeks, cents); the cohort
    * assignment is one per-user min aggregate joined back on user_id;
    * the cumulative window runs over the BOUNDED (cohort_wk, age_wk)
    * table — at most weeks² rows regardless of corpus size — and the
    * cohort-size table broadcasts at |weeks| rows. Ages with zero
    * purchases are absent (sparse): the cumulative sum is over
    * observed ages, which preserves every reported value exactly. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type"), col("value"))
    val cohort = ev.groupBy("user_id").agg(min("d").as("cd"))
    val sizes = cohort.groupBy(expr("cd div 7").as("cohort_wk"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy("cohort_wk").orderBy("age_wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .join(cohort, Seq("user_id"))
      .withColumn("cohort_wk", expr("cd div 7"))
      .withColumn("age_wk", expr("(d - cd) div 7"))
      .groupBy("cohort_wk", "age_wk")
      .agg(sum(cents(col("value"))).as("rev_c"))
      .withColumn("cum_rev_c", sum("rev_c").over(w))
      .join(broadcast(sizes), Seq("cohort_wk"))
      .withColumn("ltv_per_user_c", expr("cum_rev_c div n_users"))
      .select("cohort_wk", "age_wk", "n_users", "rev_c", "cum_rev_c", "ltv_per_user_c")
      .orderBy("cohort_wk", "age_wk")
  }

  /** Cheapest-supplier-per-part (TPC-H Q2 shape): for each small part
    * (p_size ≤ 14), the supplier(s) whose best observed line price is
    * the part-wide minimum. The classic correlated MIN subquery
    * (`WHERE cost = (SELECT min(cost) ... WHERE partkey = outer)`),
    * decorrelated the way Catalyst rewrites it: ONE per-(part, supp)
    * offer aggregate (map-side partial over the fact), ONE per-part min
    * re-aggregate of that already-small offer table, equi-joined back
    * on the part key — the fact table is scanned once and never joined
    * to itself. Dimension enrichment (part filter, supplier, nation)
    * rides explicit broadcasts; ties emit every witness so the output
    * is deterministic without arbitrary pick-one semantics. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val offers = Tables.lineitem(spark, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(cents(col("l_extendedprice"))).as("offer_c"))
    val best = offers.groupBy("l_partkey")
      .agg(min("offer_c").as("min_cost_c"))
    offers.join(best, Seq("l_partkey"))
      .filter(col("offer_c") === col("min_cost_c"))
      .join(broadcast(Tables.part(spark, dir).filter(col("p_size") <= 14)
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("min_cost_c"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Top-revenue supplier (TPC-H Q15 shape): quarterly revenue per
    * supplier, then the supplier(s) matching the GLOBAL maximum — the
    * `view + WHERE total = (SELECT max(total) FROM view)` pattern. The
    * revenue view is one map-side-partial aggregate in exact integral
    * centi-percent units (cents × (100 − discount%), the valueShare
    * formula); the scalar max is a 1-row aggregate broadcast into a
    * crossJoin filter — the view is computed ONCE, not once per
    * comparison, and nothing global ever sorts. Ties all surface. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev_cp").cast("decimal(38,0)")).as("total_cp"))
      // two consumers (scalar max + the filtered base): pin the
      // supplier-bounded view once so the fact scan runs once
      .localCheckpoint(true)
    val top = rev.agg(max("total_cp").as("max_cp"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_cp") === col("max_cp"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_cp").cast("long").as("total_rev_cp"))
      .orderBy("s_suppkey")
  }

  /** Supplier-diversity report (TPC-H Q16 shape): distinct suppliers
    * per (brand, size) bucket, EXCLUDING flagged suppliers (negative
    * account balance — the "complaints" analog). The NOT IN subquery is
    * a broadcast left-anti join applied to the deduped (part, supp)
    * pair table — pairs dedup BEFORE any dimension join (the fact
    * collapses to its distinct key pairs map-side), the exclusion list
    * is dimension-bounded, and the distinct-count aggregate runs over
    * the already-small pair table. Output is bounded by |brand×size|. */
  def partsSuppCount(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_sk"))
    pairs.join(broadcast(flagged), col("l_suppkey") === col("bad_sk"), "left_anti")
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Exact rolling active users — DAU / WAU(7) / MAU(28) + stickiness
    * (DAU/MAU) per active day. Rolling DISTINCT cannot ride a window
    * frame (distinct counts don't sum), and the textbook
    * spine×user-days range join is O(days·users); the scale shape used
    * here is BOUNDED CONTRIBUTION FAN-OUT: events first collapse to
    * distinct (user, day) — the one fact-sized shuffle — then each
    * user-day explodes to the ≤7 / ≤28 future days it keeps the user
    * active for, and a per-day distinct-count aggregate does the rest.
    * Fan-out is the window length (a constant), every join is an
    * equi-join on the day key, and no state ever exceeds
    * |users × window|. Stickiness is integral ppm. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
    val spine = ud.select(col("d")).distinct()
    def rolling(win: Int, name: String): DataFrame = ud
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + (win - 1))).as("d"))
      .join(spine, Seq("d"), "left_semi")
      .groupBy("d").agg(countDistinct(col("user_id")).as(name))
    ud.groupBy("d").agg(countDistinct(col("user_id")).as("dau"))
      .join(rolling(7, "wau"), Seq("d"))
      .join(rolling(28, "mau"), Seq("d"))
      .withColumn("stickiness_ppm", expr("dau * 1000000 div mau"))
      .orderBy("d")
  }

  /** Late-order priority report (TPC-H Q4 shape): orders in one
    * quarter that had AT LEAST ONE line shipped > 60 days after the
    * order date, counted by priority. The correlated EXISTS (its
    * predicate references BOTH the outer order date and the inner ship
    * date) is one left-semi equi-join on the order key with the date
    * comparison as the residual condition — per-key work bounded by
    * order width, the quarter filter prunes the probe side at the
    * scan, and the rollup output is |priorities|-bounded. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        datediff(col("l_shipdate"), col("o_orderdate")) > 60, "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Pareto frontier / skyline (maximize quantity, minimize unit
    * price): the offers no other offer beats on BOTH axes — the
    * multi-criteria shortlist operator (supplier selection, plan
    * pruning) the single-metric top-k family can't express. The 2-D
    * skyline reduces to ONE running minimum: over distinct (qty,
    * price) pairs ordered (qty DESC, price ASC), a pair survives iff
    * every strictly-preceding pair is strictly more expensive. The
    * running min rides the repo's two-phase cell pattern (in-cell
    * window over qty-range cells + a broadcast prefix-min over the
    * bounded cell table — rows in a higher cell have strictly greater
    * qty, so cell order extends the dominance order and no single task
    * ever sorts the distinct-pair table). Exact cents/integers. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      .distinct()
      .withColumn("_c", expr("qty div 8"))
    val inCell = Window.partitionBy("_c")
      .orderBy(col("qty").desc, col("price_c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy(col("_c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pairs.groupBy("_c").agg(min("price_c").as("_m"))
      .withColumn("_off", min("_m").over(offW))
      .select("_c", "_off")
    pairs
      .withColumn("_in", min("price_c").over(inCell))
      .join(broadcast(offsets), Seq("_c"))
      .withColumn("_prev", least(col("_in"), col("_off")))
      .filter(col("_prev").isNull || col("_prev") > col("price_c"))
      .select("qty", "price_c")
      .orderBy(col("qty").desc, col("price_c"))
  }

  /** Per-user ML feature matrix — the feature-engineering aggregate a
    * churn/LTV model trains on, assembled in ONE combinable pass over
    * the stream (no windows, no self-joins): tenure and recency in
    * exact epoch days, volume counts, purchase monetary cents, active
    * days (distinct), and events-per-active-day in milli units. Wide
    * aggregates like this are the bread-and-butter of training-data
    * prep; every column is integral so the matrix is
    * engine-reproducible. */
  def userFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type"), cents(col("value")).as("vc"))
      .groupBy("user_id")
      .agg(min("d").as("first_day"),
        max("d").as("last_day"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("vc")).otherwise(0L)).as("rev_c"),
        countDistinct(col("d")).as("days_active"))
      .withColumn("tenure_days", col("last_day") - col("first_day") + 1)
      .withColumn("events_per_day_milli",
        expr("n_events * 1000 div nullif(days_active, 0)"))
      .select("user_id", "first_day", "last_day", "tenure_days", "n_events",
        "n_purchases", "rev_c", "days_active", "events_per_day_milli")
      .orderBy("user_id")

  /** Weekly load-shape profile: event volume, distinct actives, and
    * value mass per (weekday × hour-of-day) cell — the 168-row
    * capacity/engagement heatmap behind scheduling and anomaly
    * baselines. One combinable aggregate over the scan; output bounded
    * by the calendar, not the data. Weekday is ISO (0 = Monday) so
    * both engines compute the identical key. */
  def weekProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(expr("CAST(weekday(ts) AS BIGINT)").as("dow"),
        expr("CAST(hour(ts) AS BIGINT)").as("hod"),
        col("user_id"), cents(col("value")).as("vc"))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum("vc").as("sum_cents"))
      .orderBy("dow", "hod")

  /** Pareto concentration cut (the "80/20" answer as one exact row):
    * the SMALLEST number of top-revenue users covering ≥ 80% of
    * purchase revenue, with their population share in ppm — the
    * concentration headline `q_gini`'s coefficient can't answer
    * directly. Per-user revenue ranks descending through the two-phase
    * cell pattern; the cumulative sum rides in-cell windows + a
    * broadcast offset table (never a one-task global window); the
    * 80%-crossing test is cross-multiplied integer arithmetic and the
    * final answer is ONE min-aggregate. */
  def pareto8020(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(cents(col("value"))).as("rev_c"))
    val tot = perUser.agg(count(lit(1)).as("tot_users"),
      coalesce(sum("rev_c"), lit(0L)).as("tot_rev_c"))
    val ranked = twoPhaseRowNumber(perUser, Seq.empty, "rev_c", "user_id",
      expr("rev_c div 1000"), asc = false, out = "rnk")
    val inCell = Window.partitionBy("_ck").orderBy(col("rev_c").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("_ck").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = ranked.withColumn("_ck", expr("rev_c div 1000"))
    val offsets = b.groupBy("_ck").agg(sum("rev_c").as("_s"))
      .withColumn("_off", coalesce(sum("_s").over(offW), lit(0L)))
      .select("_ck", "_off")
    b.withColumn("_in", sum("rev_c").over(inCell))
      .join(broadcast(offsets), Seq("_ck"))
      .withColumn("cum_c", col("_off") + col("_in"))
      .crossJoin(broadcast(tot))
      .filter(col("cum_c") * 5 >= col("tot_rev_c") * 4)
      // grouped (mirroring the oracle's GROUP BY tot_users, tot_rev_c),
      // not an ungrouped agg: a corpus with zero purchase events must
      // yield ZERO rows, not one all-null row
      .groupBy("tot_users", "tot_rev_c")
      .agg(min("rnk").as("k_users"))
      .withColumn("k_share_ppm", expr("k_users * 1000000 div nullif(tot_users, 0)"))
      .select("tot_users", "tot_rev_c", "k_users", "k_share_ppm")
  }

  /** Order-to-ship lead time by priority: per-order fulfilment span
    * (order date → LAST line shipped) rolled up per priority class in
    * exact integer days — the supply-chain latency report. One
    * map-side-partial per-order max, one key join, one
    * \|priorities\|-bounded rollup; the average is integral
    * (Σ div n). */
  def leadTime(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(max("l_shipdate").as("last_ship"))
    per.join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("last_ship"), col("o_orderdate")).cast("long").as("lead_d"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        min("lead_d").as("min_days"),
        max("lead_d").as("max_days"),
        expr("sum(lead_d) div count(1)").as("avg_days"))
      .orderBy("o_orderpriority")
  }

  /** The SQL entry path, exercised end-to-end: temp views + one
    * ANSI-SQL report through `spark.sql` — top-5 customers per order
    * year by revenue. The TEXT interface matters for parity (a
    * reference user writes SQL, not Scala), and the row_number-top-k
    * idiom inside it is exactly what the TopKRewrite optimizer rule
    * targets: in a GraftExtensions session this plain SQL query plans
    * onto the heap operator with no code change — the
    * SparkSessionExtensions story demonstrated from the SQL side. */
  def sqlTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH rev AS (
        |  SELECT o.o_custkey,
        |    CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |    SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS rev_c
        |  FROM lineitem_v l JOIN orders_v o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT yr, o_custkey, rev_c,
        |    row_number() OVER (PARTITION BY yr
        |      ORDER BY rev_c DESC, o_custkey) AS rn
        |  FROM rev)
        |SELECT yr, o_custkey, rev_c FROM rk WHERE rn <= 5
        |ORDER BY yr, rev_c DESC, o_custkey""".stripMargin)
  }

  /** Largest-remainder (Hare-quota) proportional allocation: split a
    * fixed budget of K = 1000 slots across event types by event count,
    * exactly — floor shares first, then the leftover slots go to the
    * largest remainders (ties → lexicographic type). The
    * rounding-that-sums-correctly primitive (budget splits, quota
    * assignment, sampling-plan seats) where independent rounding
    * drifts; Σ granted == K is an invariant, not a hope. The group
    * table is |types|-bounded, so the remainder rank is a window over
    * a handful of rows riding one 1-row total broadcast. */
  def allocation(spark: SparkSession, dir: String, slots: Long = 1000L): DataFrame = {
    val per = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val tot = per.agg(sum("n").as("tot"), count(lit(1)).as("n_types"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"n * $slots div tot"))
      .withColumn("rem", expr(s"n * $slots % tot"))
    val leftW = Window.orderBy(col("rem").desc, col("event_type"))
    based
      .withColumn("rk", row_number().over(leftW).cast("long"))
      .crossJoin(broadcast(based.agg((lit(slots) - sum("base")).as("left"))))
      .withColumn("granted",
        col("base") + when(col("rk") <= col("left"), 1L).otherwise(0L))
      .select("event_type", "n", "base", "rem", "granted")
      .orderBy("event_type")
  }

  /** Revenue-quintile mobility matrix: where do week-w spenders land
    * in week w+1? Users rank into spend quintiles per week (the
    * closed-form cut `(r−1)·5 div n + 1` over the two-phase rank — the
    * calibration decile discipline, never window-ntile), consecutive
    * weeks join on the user key, and the 5×5 transition rollup is the
    * churn/upsell mobility report a retention curve can't show. The
    * per-week size table is bounded and broadcast; only (user, week)
    * aggregates ever shuffle. */
  def quintileShift(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("wk"),
        cents(col("value")).as("vc"))
      .groupBy("user_id", "wk").agg(sum("vc").as("rev"))
    val sizes = uw.groupBy("wk").agg(count(lit(1)).as("n"))
    val tiles = twoPhaseRowNumber(uw, Seq("wk"), "rev", "user_id",
        expr("rev div 1000"), asc = true, out = "r")
      .join(broadcast(sizes), Seq("wk"))
      .withColumn("tile", expr("(r - 1) * 5 div n + 1"))
      .select("user_id", "wk", "tile")
    tiles.toDF("user_id", "wk", "tile_from")
      .join(tiles.select(col("user_id"), (col("wk") - 1).as("wk"),
        col("tile").as("tile_to")), Seq("user_id", "wk"))
      .groupBy("tile_from", "tile_to")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("tile_from", "tile_to")
  }

  /** Promotion revenue share (TPC-H Q14 shape): the fraction of one
    * month's discounted revenue from promo-branded parts, as a
    * CONDITIONAL aggregate — one scan, one (tiny) broadcast dim join,
    * two sums fused in a single aggregate, exact ppm division at the
    * end. No second pass for the denominator. */
  def promoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select((cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"),
        col("p_brand").startsWith("Brand#1").as("is_promo"))
      .agg(sum(when(col("is_promo"), col("rev_cp")).otherwise(0L)).as("promo_rev_cp"),
        sum(col("rev_cp")).as("total_rev_cp"))
      .withColumn("promo_ppm",
        expr("CAST(CAST(promo_rev_cp AS DECIMAL(38,0)) * 1000000 div nullif(total_rev_cp, 0) AS BIGINT)"))

  /** Returned-revenue customers (TPC-H Q10 shape): top 20 customers by
    * revenue on returned lineitems in a quarter. The fact filters
    * (return flag + date window) prune at the scan, the per-customer
    * aggregate is map-side partial, dimension enrichment is broadcast,
    * and the top-20 is a TakeOrdered heap — no global sort of the
    * customer table. */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
    li.join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev_cp").cast("decimal(38,0)")).as("rev"))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev").cast("long").as("rev_cp"))
      .orderBy(col("rev_cp").desc, col("c_custkey"))
      .limit(20)
  }

  /** Bi-nation shipping volume (TPC-H Q7 shape): yearly discounted
    * revenue between every ordered (supplier nation → customer nation)
    * pair, nations distinct. The fact joins its two key dimensions
    * once each (orders by key — data-scaled, hash join; customer /
    * supplier / nation broadcast), the year comes off the ship date,
    * and the rollup output is bounded by |nations|²·|years|. The
    * classic multi-join volume query: every join is an equi-join, the
    * only data-scaled shuffle is the lineitem↔orders key join. */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
    val nations = broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name"))
    li.join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(nations.toDF("sk", "supp_nation"), col("s_nationkey") === col("sk"))
      .join(nations.toDF("ck", "cust_nation"), col("c_nationkey") === col("ck"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("rev_cp").cast("decimal(38,0)")).cast("long").as("volume_cp"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** New-vs-returning daily split: per active day, distinct first-time
    * users vs returning users plus event volume — the acquisition/
    * retention headline a DAU chart decomposes into. One per-user min
    * aggregate (map-side combinable) equi-joined back to the deduped
    * (user, day) grid on the user key; no windows, no fan-out; the
    * per-day rollup is days-bounded. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
    val grid = ev.groupBy("user_id", "d").agg(count(lit(1)).as("n_ev"))
    val first = grid.groupBy("user_id").agg(min("d").as("fd"))
    grid.join(first, Seq("user_id"))
      .groupBy("d")
      .agg(sum("n_ev").as("n_events"),
        sum(when(col("d") === col("fd"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("d") =!= col("fd"), 1L).otherwise(0L)).as("returning_users"))
      .orderBy("d")
  }

  /** Top-k-PERCENT per group (k = ⌈10%⌉ of the group, value-ranked):
    * the dynamic-k variant the fixed top-n operators can't express —
    * per-type revenue concentration of the heaviest decile. Ranking
    * rides the generalized two-phase row_number (value-range cells +
    * broadcast per-cell offsets — no one-task-per-type window); the
    * per-type count that fixes k is a bounded aggregate broadcast back;
    * the report is |types|-bounded with exact cents and ppm share. */
  def topPercentPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("vc"))
    val ranked = twoPhaseRowNumber(ev, Seq("event_type"), "vc", "event_id",
      expr("vc div 1000"), asc = false, out = "rnk")
    val sizes = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("vc").as("sum_all_c"))
    ranked.join(broadcast(sizes), Seq("event_type"))
      .filter(col("rnk") <= expr("(n_events + 9) div 10"))
      .groupBy("event_type")
      .agg(max("n_events").as("n_events"),
        count(lit(1)).as("k_top"),
        sum("vc").as("sum_top_c"),
        max("sum_all_c").as("sum_all_c"))
      .withColumn("share_ppm",
        expr("CAST(CAST(sum_top_c AS DECIMAL(38,0)) * 1000000 div nullif(sum_all_c, 0) AS BIGINT)"))
      .select("event_type", "n_events", "k_top", "sum_top_c", "share_ppm")
      .orderBy("event_type")
  }

  /** Forecast revenue change (TPC-H Q6 shape): the pure scan-aggregate
    * — every predicate (date window, discount band, quantity cap)
    * pushes to the parquet reader, nothing joins, nothing shuffles but
    * one 1-row partial-aggregate merge. The query whose entire cost at
    * 100 TB IS the pruned scan: with date-partitioned layout it reads
    * one year of row groups, and min/max page stats skip most of those.
    * Revenue in exact centi-percent units (cents × discount points). */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(cents(col("l_extendedprice")) *
          round(col("l_discount") * 100).cast("long")).as("revenue_cp"))

  /** National market share (TPC-H Q8 shape): of all PROMO-type parts
    * sold to ASIA-region customers, what yearly revenue fraction came
    * from NATION_7 suppliers? The two data-scaled relations meet in ONE
    * key shuffle (lineitem↔orders); part (type-filtered), customer,
    * supplier, nation, region are all broadcast; numerator and
    * denominator ride one conditional aggregate over the
    * |years|-bounded rollup — never two passes. Exact ppm share. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val nations = broadcast(Tables.nation(spark, dir))
    val asiaCust = broadcast(
      Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
        .join(nations.select("n_nationkey", "n_regionkey"),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey"))
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "PROMO").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select("s_suppkey", "s_nationkey")
          .join(nations.select(col("n_nationkey"), col("n_name").as("supp_nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("supp_nation"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_cp"))
    li.join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_7", col("vol_cp"))
          .otherwise(0L).cast("decimal(38,0)")).cast("long").as("nation_vol_cp"),
        sum(col("vol_cp").cast("decimal(38,0)")).cast("long").as("total_vol_cp"))
      // ppm through DECIMAL(38,0): vol_cp × 10⁶ clears BIGINT range
      // once a year's volume passes ~9·10¹² cp — true well before
      // 100 TB — and Spark would wrap silently where DuckDB throws
      .withColumn("mkt_share_ppm",
        expr("CAST((CAST(nation_vol_cp AS DECIMAL(38,0)) * 1000000)" +
          " div nullif(total_vol_cp, 0) AS BIGINT)"))
      .orderBy("o_year")
  }

  /** Product-line profit by nation and year (TPC-H Q9 shape). The
    * schema has no partsupp, so unit supply cost is the fixed 10%-of-
    * retail proxy — round(p_retailprice·10) exact cents — which keeps
    * the arithmetic shape (revenue − qty·unit_cost) and the join
    * graph (part-name LIKE filter, supplier→nation rollup) intact.
    * Profit accumulates in exact centi-percent units; one data-scaled
    * shuffle (lineitem↔orders for the order year); part and supplier
    * dims broadcast; output |nations|×|years|-bounded. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_name").like("%red%"))
          .select(col("p_partkey"),
            round(col("p_retailprice") * 10).cast("long").as("unit_cost_c"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(spark, dir)
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "nation")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("nation"),
        (cents(col("l_extendedprice")) *
            (lit(100L) - round(col("l_discount") * 100).cast("long")) -
          col("l_quantity").cast("long") * col("unit_cost_c") * 100L).as("amount_cp"))
    li.join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("amount_cp").cast("decimal(38,0)")).cast("long").as("profit_cp"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Late-shipment priority split (TPC-H Q12 shape): among 1997-shipped
    * lines that left more than 90 days after their order date, how many
    * belong to critical-priority orders vs the rest, per return-flag
    * class? One key join (lineitem↔orders — the only data-scaled
    * shuffle), the late test is a residual date comparison reading both
    * sides, and the two counts are ONE conditional aggregate over the
    * |flags|-bounded rollup — the canonical "counts by predicate class
    * after a join" shape. */
  def lateShipmentSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .groupBy("l_returnflag")
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")

  /** Disjunctive brand/size/quantity revenue (TPC-H Q19 shape): an OR
    * of three conjunctive range clauses, each tying part attributes to
    * lineitem quantity. Unlike `q_disjunctive` (inclusion-exclusion on
    * pre-aggregated key histograms), this keeps the textbook plan: ONE
    * broadcast hash join on partkey with the disjunction as a residual
    * filter — the join key is shared by all three clauses so the OR
    * never forces a nested-loop, and the brand/size prefilter shrinks
    * the broadcast to the union of clause-eligible parts. */
  def brandRangeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter((col("p_brand") === "Brand#3" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#21" && col("p_size").between(1, 25)))
      .select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_cp"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#3" && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#15" && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#21" && col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("rev_cp").cast("decimal(38,0)")).cast("long").as("revenue_cp"))
  }
}
