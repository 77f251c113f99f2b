package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Telemetry ETL re-expressing the reference's breadcrumb pipeline
  * (reference: Part2/updated_subscriber.py, Part3/load_breadcrumb.py,
  * Part3/stop_event_subscriber.py) on the `events` stream table
  * (ts≈tstamp, user_id≈vehicle/trip key, value≈odometer/speed,
  * props≈raw pub/sub payload).
  *
  * Everything is a single declarative plan: validation predicates are
  * pushed into the parquet scan, and all per-key window derivations
  * (speed, dedup-first, traces) share one shuffle on `user_id` so the
  * key partitioning is reused across window ops — at 100 TB the fact
  * table shuffles once, not once per derived column.
  */
object EventsEtl {

  /** Valid event types (analog of service_key ∈ {W,S,U} and
    * direction ∈ {0,1} checks, stop_event_subscriber.py:186-214). */
  val ValidTypes: Seq[String] = Seq("click", "view", "signup", "purchase", "error")

  /** Upper bound for a valid measurement (analog of speed ∈ [0,70] /
    * lat-lon range asserts, updated_subscriber.py:100-112). */
  val MaxValue: Double = 300.0

  /** service_key mapping (updated_subscriber.py:48-52): Mon-Fri →
    * Weekday, else the day name. Spark dayofweek: 1=Sunday..7=Saturday.
    * A NULL timestamp maps to NULL — without the explicit guard,
    * dayofweek(NULL) nulls both when() conditions and the row falls
    * through to the otherwise branch, silently classifying an invalid
    * event as Weekday traffic. */
  def serviceKey(ts: Column): Column =
    when(ts.isNull, lit(null).cast("string"))
      .when(dayofweek(ts) === 7, "Saturday")
      .when(dayofweek(ts) === 1, "Sunday")
      .otherwise("Weekday")

  private[graft] def validPred: Column =
    col("ts").isNotNull && col("user_id") >= 0 &&
      col("value") >= 0 && col("value") <= MaxValue &&
      col("event_type").isin(ValidTypes: _*)

  /** Null-safe reject predicate: a row with a NULL field makes
    * `validPred` evaluate to SQL NULL, and `filter(!validPred)` drops
    * NULL like false — the row would vanish from BOTH the clean and
    * the quarantine side. Rejects must catch the three-valued gap. */
  private[graft] def invalidPred: Column = !coalesce(validPred, lit(false))

  /** Validation filter + derived time columns — the keep-side of the
    * reference's assert-and-drop loop (updated_subscriber.py:75-151). */
  def cleanEvents(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .filter(validPred)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"),
        serviceKey(col("ts")).as("service_key"))
      .orderBy("event_id")

  /** Quarantine: rows failing validation, tagged with the first failing
    * rule — the dropped side of the reference's validation loop, kept
    * auditable instead of printed (updated_subscriber.py:138-151). */
  /** First failing rule per invalid row — shared by the batch
    * quarantine and its streaming side-output twin. */
  private[graft] def reasonCol: Column =
    when(col("ts").isNull, "null_ts")
      .when(col("user_id").isNull, "null_user")
      .when(col("user_id") < 0, "bad_user")
      .when(col("value").isNull, "null_value")
      .when(col("value") < 0, "neg_value")
      .when(col("value") > MaxValue, "over_max")
      .otherwise("bad_type")

  /** Pipeline observability: the clean-events plan instrumented with a
    * CollectMetrics node (`df.observe`) — total rows, invalid rows, and
    * the worst-offender rule tally ride the SAME job as the load, as
    * accumulator-style aggregates the driver reads after the action.
    * Zero extra passes over the data (the naive alternative — a second
    * count() per metric — re-scans the fact table once per metric; at
    * 100 TB that's the difference between free telemetry and doubling
    * the pipeline). The clean output is identical to `cleanEvents`. */
  def observedClean(spark: SparkSession, dir: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("etl_metrics")
    val clean = graft.sources.Tables.events(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(validPred, 0L).otherwise(1L)).as("n_invalid"),
        sum(when(col("value") > MaxValue, 1L).otherwise(0L)).as("n_over_max"))
      .filter(validPred)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"),
        serviceKey(col("ts")).as("service_key"))
    (clean, obs)
  }

  def quarantine(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .filter(invalidPred)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        reasonCol.as("reason"))
      .orderBy("event_id")

  /** Per-key speed derivation (updated_subscriber.py:66-68):
    * sort by (key, ts); speed = Δvalue / Δseconds; backfill the
    * group-leading null from the next row; clip at 0.
    * One window spec → one shuffle+sort reused by lag and lead.
    */
  def deriveSpeed(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    graft.sources.Tables.events(spark, dir)
      // rows without a timestamp have no interval — they'd otherwise
      // sort NULLS FIRST here but NULLS LAST in the SQL twin
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("dv", col("value") - lag("value", 1).over(w))
      .withColumn("dt_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("speed_raw",
        when(col("dt_us") > 0, col("dv") / (col("dt_us") / lit(1000000.0))))
      // ONLY the group-leading row (no predecessor) backfills from the
      // next interval; any other undefined interval — a zero-dt data
      // fault mid-stream, or a single-event key — stays NULL
      // ("unknown"), never a fabricated 0.0 or the wrong interval's
      // rate. The clip keeps NULL as NULL (greatest() would swallow it
      // into 0.0: Spark's greatest skips NULL operands).
      .withColumn("speed_fill",
        when(col("speed_raw").isNotNull, col("speed_raw"))
          .when(lag("ts_us", 1).over(w).isNull, lead("speed_raw", 1).over(w)))
      .withColumn("speed",
        round(when(col("speed_fill") < 0, lit(0.0)).otherwise(col("speed_fill")), 6))
      .select("event_id", "user_id", "ts_us", "value", "speed")
      .orderBy("event_id")
  }

  /** Key-dimension build: keep the FIRST event per key after sorting by
    * time — the reference's drop_duplicates(subset=EVENT_NO_TRIP,
    * keep='first') trip-table build (updated_subscriber.py:154-169). */
  def dedupKeyFirst(spark: SparkSession, dir: String): DataFrame = {
    // NULLS LAST explicitly: Spark's ascending default is NULLS FIRST,
    // which would crown a null-timestamp (invalid) event as the key's
    // "first event" — and diverge from SQL engines whose ascending
    // default is NULLS LAST. A key with ONLY null-ts events still gets
    // a row (honestly null-keyed), matching keep-first semantics.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc_nulls_last, col("event_id"))
    graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), serviceKey(col("ts")).as("service_key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"), col("service_key"),
        lit("Out").as("direction"))
      .orderBy("user_id")
  }

  /** service_key distribution — the Weekday/Saturday/Sunday mapping
    * applied and aggregated (updated_subscriber.py:48-52). */
  def serviceKeyCounts(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .groupBy(serviceKey(col("ts")).as("service_key"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      // null-ts rows surface as a NULL service_key bucket; NULLS LAST
      // matches the SQL twin's ascending default
      .orderBy(col("service_key").asc_nulls_last)

  /** Stop-events-style cross-field validation (reference
    * stop_event_subscriber.py:213-218 validate_arrive_before_leave and
    * friends), re-expressed on lineitem⋈orders: a line item "leaves"
    * (ships) no earlier than its order "arrives" (is placed), plus
    * domain checks. Emits per-rule violation counts — the audit view a
    * warehouse actually wants from assert-and-drop. */
  def crossValidate(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
    li.select(
        when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L).as("v_ship_before_order"),
        when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L).as("v_discount_range"),
        when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L).as("v_quantity_range"),
        when(col("l_tax") < 0, 1L).otherwise(0L).as("v_negative_tax"))
      .agg(count(lit(1)).as("n_rows"),
        sum("v_ship_before_order").as("n_ship_before_order"),
        sum("v_discount_range").as("n_discount_range"),
        sum("v_quantity_range").as("n_quantity_range"),
        sum("v_negative_tax").as("n_negative_tax"))
  }

  /** Pub/sub payload parse: pull the numeric `k` field out of the raw
    * JSON message body and aggregate — the subscriber's
    * json.loads(message.data) step (updated_subscriber.py:22-28). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg(col("k").cast("double")), 6).as("avg_k"))
      .orderBy("event_type")

  /** Semi-structured ingestion through Spark 4's VARIANT type: the
    * props payload parses ONCE into the binary variant encoding
    * (`parse_json`), and every downstream extraction (`variant_get`)
    * reads the parsed form — the columnar-JSON path that replaces
    * per-path string re-parsing (get_json_object re-scans the text per
    * path). Same aggregate contract as `jsonProps`, so the two oracles
    * pin the engines agree; typed extraction with an explicit cast
    * keeps the schema stable whatever the payload holds. */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_type"),
        // try_parse_json: a malformed payload row yields NULL instead
        // of aborting the whole load (ETL ingest must absorb bad rows)
        expr("variant_get(try_parse_json(props), '$.k', 'int')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** SCD2 change history: collapse each key's event stream into
    * validity-interval versions of the tracked attribute (event_type) —
    * change detection via lag, version numbering via cumulative sum,
    * interval close via lead, open interval = current. The
    * slowly-changing-dimension build the reference's trip table implies
    * (service_key/direction change over a vehicle's day).
    *
    * One hash exchange total: the lag window, the cumulative sum, the
    * (user, version) aggregation and the lead window all ride the same
    * user_id clustering. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val ev = graft.sources.Tables.events(spark, dir)
      // a version interval needs a timestamp: an unfiltered null ts
      // would sort first and mint a version with valid_from NULL
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val versioned = ev
      .withColumn("changed",
        when(lag("event_type", 1).over(byTs).isNull, 1L)
          .when(lag("event_type", 1).over(byTs) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum("changed").over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version", "event_type")
      .agg(min("ts_us").as("valid_from"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    versioned
      .withColumn("valid_to", lead("valid_from", 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "event_type", "valid_from", "valid_to",
        "n_events", "is_current")
      .orderBy("user_id", "version")
  }

  /** SCD2 temporal join — the consumption side of `scd2History`: each
    * event joins the ONE dimension version valid at its timestamp
    * (valid_from ≤ ts < valid_to; current version has an open end).
    * Plan shape: equi-join on the key with the interval predicate as a
    * residual — per-key version counts are small by construction, so
    * the probe fans out over versions, never over time. Row
    * conservation (every event matches exactly one version, from the
    * tiling property) is what the oracle compare certifies. */
  def scd2Join(spark: SparkSession, dir: String): DataFrame = {
    val versions = scd2History(spark, dir)
      .select(col("user_id").as("v_user"), col("version"),
        col("event_type").as("version_type"),
        col("valid_from"), col("valid_to"))
    graft.sources.Tables.events(spark, dir)
      // the row-conservation invariant below is over TIMESTAMPED
      // events: a NULL ts makes the interval predicate three-valued
      // and would silently drop the row from an inner join — filter
      // explicitly so the exclusion is declared, not accidental
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .join(versions, col("user_id") === col("v_user")
        && col("ts_us") >= col("valid_from")
        && (col("valid_to").isNull || col("ts_us") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("version"), col("version_type"))
      .orderBy("event_id")
  }

  /** Gap backfill: regularize each key's stream onto an hourly grid —
    * per-key min..max bucket spine via sequence/explode, left-join the
    * observed hourly totals, mark gaps, forward-fill the last observed
    * total (step interpolation). The time-series repair a telemetry
    * warehouse needs before rate computations; the spine generation is
    * per-key-local (no cross-key data motion) and the forward-fill
    * rides the same (key, bucket) shuffle as the join. */
  def backfillGaps(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600L * 1000000L // 1 hour in micros
    // Spine-free formulation: each OBSERVED bucket generates itself
    // plus the empty buckets up to (exclusive) the key's next observed
    // bucket — sequence/explode off a lead() window. Gap rows inherit
    // the generating bucket's total, so the forward-fill needs no
    // second window and no spine join (a spine-side self-join would
    // also scan and aggregate the input twice — Spark does not share
    // subtrees across DataFrame branches). ONE shuffle: the explicit
    // user_id repartition satisfies the (user, bucket) aggregation and
    // the lead window; the generate is partition-local.
    val byBucket = Window.partitionBy("user_id").orderBy("bucket_us")
    graft.sources.Tables.events(spark, dir)
      // explicit, not accidental: rows with NULL ts would fold into a
      // NULL bucket whose row then vanishes in explode(sequence(NULL…))
      // — the silent three-valued row loss invalidPred guards against
      .filter(col("ts").isNotNull)
      .select(col("user_id"),
        (expr(s"unix_micros(ts) div $W") * W).as("bucket_us"),
        round(col("value") * 100).cast("long").as("vc"))
      .repartition(col("user_id"))
      .groupBy("user_id", "bucket_us")
      .agg(count(lit(1)).as("n"), sum("vc").as("sc"))
      .withColumn("next_us", lead("bucket_us", 1).over(byBucket))
      .select(col("user_id"), col("n"), col("sc"), col("bucket_us"),
        explode(sequence(col("bucket_us"),
          coalesce(col("next_us") - W, col("bucket_us")), lit(W))).as("gen_us"))
      .select(col("user_id"), col("gen_us").as("bucket_us"),
        when(col("gen_us") === col("bucket_us"), col("n")).otherwise(0L).as("n_events"),
        (col("gen_us") =!= col("bucket_us")).as("is_gap"),
        col("sc").as("filled_cents"))
      .orderBy("user_id", "bucket_us")
  }

  /** Incremental materialized-view maintenance: merge a delta batch
    * into a per-(type, day) summary WITHOUT rescanning the base — the
    * point at 100 TB, where the base aggregate is a compact table and
    * only the new partition is scanned. Works because every kept
    * aggregate is an associative/commutative partial state (count,
    * integer-cents sum, min/max), so base ⊎ delta merges by the SAME
    * groupBy that built each side — the algebra Structured Streaming
    * uses for its state store, expressed as a batch plan. The oracle
    * recomputes from all rows at once: merge(base, delta) must equal
    * the one-shot aggregate exactly (integer states — layout-proof).
    * The 10%-of-event_ids delta split stands in for "today's
    * partition" arriving after the base was built. */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
    val base = eventPartials(ev.filter(pmod(col("event_id"), lit(10)) =!= 0))
    val delta = eventPartials(ev.filter(pmod(col("event_id"), lit(10)) === 0))
    mergePartials(base, delta).orderBy("event_type", "d")
  }

  /** Two-sided key reconciliation between orders and the lineitem
    * fact — the referential-integrity audit a load pipeline runs after
    * every batch: a FULL OUTER join on the key classifies each order
    * key as matched, header-only (order without items), or orphaned
    * (items without a header), with bounded per-class evidence
    * (count + key range, never a row dump). One shuffle join on the
    * key after a map-side distinct on the fact side. */
  def reconcileKeys(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"))
    val l = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("lk")).distinct()
    o.join(l, col("ok") === col("lk"), "full_outer")
      .select(
        when(col("ok").isNotNull && col("lk").isNotNull, "matched")
          .when(col("lk").isNull, "order_without_items")
          .otherwise("items_without_order").as("category"),
        coalesce(col("ok"), col("lk")).as("key"))
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        min("key").as("min_key"), max("key").as("max_key"))
      .orderBy("category")
  }

  /** The per-(type, day) partial-state aggregation — every kept state
    * (count, integer-cents sum, min/max micros) is associative and
    * commutative, so any partition of the input merges back exactly.
    * Shared by the batch MV operator and the streaming maintainer. */
  private[graft] def eventPartials(df: DataFrame): DataFrame = df
    .select(col("event_type"), col("ts").cast("date").as("d"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("vc"))
    .groupBy("event_type", "d")
    .agg(count(lit(1)).as("n"), sum("vc").as("sum_cents"),
      min("ts_us").as("first_us"), max("ts_us").as("last_us"))

  /** Merge two partial-state tables: the same groupBy that built each
    * side, with count→sum promotion. */
  private[graft] def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("event_type", "d")
      .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
        min("first_us").as("first_us"), max("last_us").as("last_us"))

  /** Duplicate-action debounce: collapse repeats of the SAME action by
    * the same user within 2 h to the lead event, reporting how many
    * repeats each kept event suppressed — the repeated-fire cleanup
    * between raw telemetry and attribution/conversion counting (same
    * family as the reference's repeated-breadcrumb guard; keyed by
    * (user, action), unlike `intervalMerge`'s all-events islands).
    * Burst membership is `gap from the previous RAW same-action event
    * < 2 h`, so the rule is a lag + running flag-sum — one
    * (user, type) exchange, no stateful loop — and has an exact
    * streaming twin (StreamingEtl.debounceStream, same rule as keyed
    * state). */
  def debounce(spark: SparkSession, dir: String): DataFrame = {
    val GapUs = 7200L * 1000000L
    val byTs = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us"), col("event_id"))
    graft.sources.Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byTs))
      .withColumn("lead_flag",
        when(col("gap_us").isNull || col("gap_us") >= GapUs, 1L).otherwise(0L))
      .withColumn("burst_id", sum("lead_flag").over(byTs))
      .groupBy("user_id", "event_type", "burst_id")
      .agg(min_by(col("event_id"), struct(col("ts_us"), col("event_id"))).as("event_id"),
        min("ts_us").as("ts_us"),
        (count(lit(1)) - 1L).as("n_suppressed"))
      .select("event_id", "user_id", "event_type", "ts_us", "n_suppressed")
      .orderBy("event_id")
  }

  /** Feed-disorder audit — the number that SIZES a watermark: an event
    * is LATE when its EVENT time precedes the running max event time
    * already delivered for its key, and max lateness says exactly what
    * `withWatermark` horizon loses data vs what state a longer one
    * costs. Arrival order is the two-source ingestion the reference
    * actually runs (two pub/sub subscriptions): source = id parity,
    * the second feed delivering 5 min behind — so the on-time feed
    * overtakes it and genuine late events exist (the raw table is
    * stored time-sorted; replaying it as-is would audit nothing). One
    * running-max window and one aggregate off a single user_id
    * exchange. */
  def disorderAudit(spark: SparkSession, dir: String): DataFrame = {
    val arrival = Window.partitionBy("user_id").orderBy("arrival_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.sources.Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("arrival_us",
        col("ts_us") + pmod(col("event_id"), lit(2)) * lit(300L * 1000000L))
      .withColumn("hwm_us", max("ts_us").over(arrival))
      .withColumn("late", col("hwm_us").isNotNull && col("ts_us") < col("hwm_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        coalesce(max(when(col("late"), col("hwm_us") - col("ts_us"))), lit(0L))
          .as("max_lateness_us"))
      .withColumn("late_ppm", expr("n_late * 1000000 div n_events"))
      .orderBy("user_id")
  }

  /** k-anonymity audit over the event microdata: quasi-identifier =
    * (event_type, hour-of-day, value band) — the attribute combination
    * an adversary could link on. Reports every equivalence class
    * smaller than k=25 (the re-identifiable ones) with the global
    * anonymity floor (k_min = smallest class anywhere) and total class
    * count alongside — the release-gate check a training-data pipeline
    * runs before publishing event-derived data. One combinable
    * three-column aggregate; the 1-row global tally broadcast-crosses
    * into the bounded risk set. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = graft.sources.Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        hour(col("ts")).cast("long").as("event_hour"),
        floor(col("value") / 30).cast("long").as("value_band"))
      .agg(count(lit(1)).as("n"))
    val global = classes.agg(min("n").as("k_min"),
      count(lit(1)).as("n_classes"))
    classes.filter(col("n") < 25)
      .crossJoin(broadcast(global))
      .select("event_type", "event_hour", "value_band", "n", "k_min", "n_classes")
      .orderBy("event_type", "event_hour", "value_band")
  }

  /** Declarative data-quality rule engine: rules are DATA — (name,
    * SQL predicate) pairs compiled with `expr()` into ONE wide
    * aggregation over one scan, so adding a rule never adds a pass
    * (the reference hard-codes each assert as its own row loop,
    * updated_subscriber.py:100-112). Per rule: rows checked,
    * violations, violation rate in exact ppm. */
  val DefaultDqRules: Seq[(String, String)] = Seq(
    ("ts_not_null", "ts IS NOT NULL"),
    ("user_nonneg", "user_id >= 0"),
    // interpolated from the pipeline constants so the rule engine can
    // never drift from what cleanEvents/quarantine actually enforce
    ("value_in_range", s"value >= 0 AND value <= ${MaxValue.toInt}"),
    ("type_in_domain",
      ValidTypes.mkString("event_type IN ('", "','", "')")),
    ("props_has_k", "props LIKE '%\"k\"%'"))

  def dqRules(spark: SparkSession, dir: String,
      rules: Seq[(String, String)] = DefaultDqRules): DataFrame = {
    val e = graft.sources.Tables.events(spark, dir)
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(expr(pred), 0L).otherwise(1L)).as(s"v$i")
    }
    val wide = e.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = rules.indices.map(i => s"'${rules(i)._1}', v$i").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${rules.size}, $stacked) AS (rule_name, n_violations)"))
      .withColumn("violation_ppm", expr("n_violations * 1000000 div n_rows"))
      .select("rule_name", "n_rows", "n_violations", "violation_ppm")
      .orderBy("rule_name")
  }

  /** Per-column data-profiling report over the events table — the
    * null-fraction / cardinality / range summary a pipeline owner reads
    * before trusting a feed (the load-stage sanity check the reference
    * does row-by-row in `load_breadcrumb.py`'s validation pass, done as
    * ONE declarative scan). Numeric and temporal columns are scaled to
    * exact integers (micros / cents) so min/max hash-match the oracle;
    * string columns report NULL bounds and cardinality only. All six
    * per-column profiles come from a single wide aggregation over one
    * scan, then unpivot — the multi-distinct is planned as one Expand +
    * one exchange; at 100 TB swap `count(distinct)` for
    * `approx_count_distinct` (documented trade) and the plan is a plain
    * combinable aggregate. */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"),
        col("event_type"), col("props"))
    def nNull(c: String)   = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn")
    def nDist(c: String)   = countDistinct(col(c)).as(s"${c}_nd")
    val longCols = Seq("event_id", "user_id", "ts_us", "value_cents")
    // string columns profile their LENGTH range (never NULL bounds —
    // keeps the report column a plain non-null BIGINT in every engine)
    val strCols = Seq("event_type", "props")
    val aggs =
      longCols.flatMap(c => Seq(nNull(c), nDist(c),
        min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx"))) ++
      strCols.flatMap(c => Seq(nNull(c), nDist(c),
        min(length(col(c))).cast("long").as(s"${c}_mn"),
        max(length(col(c))).cast("long").as(s"${c}_mx")))
    val wide = e.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = (longCols ++ strCols).map(c =>
      s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx")
    wide.select(col("n_rows"), expr(
        s"stack(${stacked.size}, ${stacked.mkString(", ")}) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
      .orderBy("col_name")
  }
}
