package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Analytics
import graft.etl.EventsEtl

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ETL core (reference Part2/Part3 pipeline semantics)
    "q1_agg" -> ((s, d) => Analytics.q1Agg(s, d)),
    "etl_clean_events" -> ((s, d) => EventsEtl.cleanEvents(s, d)),
    "etl_quarantine" -> ((s, d) => EventsEtl.quarantine(s, d)),
    "etl_derive_speed" -> ((s, d) => EventsEtl.deriveSpeed(s, d)),
    "etl_dedup_keyfirst" -> ((s, d) => EventsEtl.dedupKeyFirst(s, d)),
    "etl_service_key" -> ((s, d) => EventsEtl.serviceKeyCounts(s, d)),
    "etl_json_props" -> ((s, d) => EventsEtl.jsonProps(s, d)),
    // Analytics (reference Part3 queries + relational breadth)
    "q_trip_view" -> ((s, d) => Analytics.tripView(s, d)),
    "q_latest_trace" -> ((s, d) => Analytics.latestTrace(s, d)),
    "q_time_window" -> ((s, d) => Analytics.timeWindow(s, d)),
    "q_threshold_scan" -> ((s, d) => Analytics.thresholdScan(s, d)),
    "q_trip_trace" -> ((s, d) => Analytics.tripTrace(s, d)),
    "q3_shipping" -> ((s, d) => Analytics.q3Shipping(s, d)),
    "q5_region" -> ((s, d) => Analytics.q5Region(s, d)),
    "q_semi_join" -> ((s, d) => Analytics.semiJoin(s, d)),
    "q_anti_join" -> ((s, d) => Analytics.antiJoin(s, d)),
    "q_topn_pergroup" -> ((s, d) => Analytics.topnPerGroup(s, d)),
    "q_rollup" -> ((s, d) => Analytics.rollupAgg(s, d)),
    "q_pivot" -> ((s, d) => Analytics.pivotAgg(s, d)),
    "q_running_agg" -> ((s, d) => Analytics.runningAgg(s, d)),
    "q_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "q_windowed_agg" -> ((s, d) => Analytics.windowedAgg(s, d)),
  )

  /** DuckDB oracle SQL per query (same parquet tables registered under
    * their bare names). Column aliases MUST match the Spark output. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        | SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS sum_base_price_cents,
        | SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS sum_disc_price_cents,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "etl_clean_events" ->
      """SELECT event_id, user_id, event_type, value,
        | CAST(ts AS DATE) AS event_date,
        | CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS event_hour,
        | CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 6 THEN 'Saturday'
        |      WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 0 THEN 'Sunday'
        |      ELSE 'Weekday' END AS service_key
        |FROM events
        |WHERE ts IS NOT NULL AND user_id >= 0 AND value >= 0 AND value <= 300
        |  AND event_type IN ('click','view','signup','purchase','error')
        |ORDER BY event_id""".stripMargin,

    "etl_quarantine" ->
      """SELECT event_id, user_id, event_type, value,
        | CASE WHEN ts IS NULL THEN 'null_ts'
        |      WHEN user_id < 0 THEN 'bad_user'
        |      WHEN value < 0 THEN 'neg_value'
        |      WHEN value > 300 THEN 'over_max'
        |      ELSE 'bad_type' END AS reason
        |FROM events
        |WHERE NOT (ts IS NOT NULL AND user_id >= 0 AND value >= 0 AND value <= 300
        |  AND event_type IN ('click','view','signup','purchase','error'))
        |ORDER BY event_id""".stripMargin,

    "etl_derive_speed" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |d AS (
        |  SELECT e.*, value - lag(value) OVER w AS dv, ts_us - lag(ts_us) OVER w AS dt_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (
        |  SELECT d.*, CASE WHEN dt_us > 0 THEN dv / (dt_us / 1000000.0) END AS speed_raw FROM d)
        |SELECT event_id, user_id, ts_us, value,
        | round(greatest(0.0, coalesce(speed_raw,
        |   lead(speed_raw) OVER (PARTITION BY user_id ORDER BY ts_us))), 6) AS speed
        |FROM s ORDER BY event_id""".stripMargin,

    "etl_dedup_keyfirst" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |   CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 6 THEN 'Saturday'
        |        WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 0 THEN 'Sunday'
        |        ELSE 'Weekday' END AS service_key,
        |   row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS first_event_id, event_type AS first_event_type,
        | service_key, 'Out' AS direction
        |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "etl_service_key" ->
      """SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 6 THEN 'Saturday'
        |      WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 0 THEN 'Sunday'
        |      ELSE 'Weekday' END AS service_key,
        | COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY service_key""".stripMargin,

    "etl_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        | SUM(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS sum_k,
        | round(AVG(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_trip_view" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_orderstatus,
        | CAST(o_orderdate AS DATE) AS order_date, l_linenumber, l_quantity,
        | CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber ASC NULLS FIRST""".stripMargin,

    "q_latest_trace" ->
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value
        |FROM events
        |WHERE user_id = (
        |  SELECT user_id FROM events
        |  WHERE value BETWEEN 200.0 AND 300.0 AND event_type = 'purchase'
        |  ORDER BY ts DESC, event_id LIMIT 1)
        |ORDER BY event_id""".stripMargin,

    "q_time_window" ->
      """SELECT event_id, user_id, event_type,
        | CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS event_hour, value
        |FROM events
        |WHERE hour(CAST(ts AS TIMESTAMP)) BETWEEN 16 AND 18
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
        |  AND dayofweek(CAST(ts AS TIMESTAMP)) = 0
        |ORDER BY event_id""".stripMargin,

    "q_threshold_scan" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE value > 250.0 AND CAST(ts AS DATE) = DATE '2024-01-15'
        |ORDER BY event_id""".stripMargin,

    "q_trip_trace" ->
      """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
        | CAST(row_number() OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS INT) AS seq
        |FROM events ORDER BY user_id, seq""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region" ->
      """SELECT n_name,
        | SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_topn_pergroup" ->
      """WITH r AS (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |   CAST(row_number() OVER (PARTITION BY p_brand
        |     ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
        |  FROM part)
        |SELECT p_brand, rn, p_partkey,
        | CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM r WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(o_orderstatus, 'ALL') AS status,
        | COUNT(*) AS n_orders,
        | SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS total_cents
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        | SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
        | SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
        | SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_running_agg" ->
      """SELECT event_id, user_id,
        | SUM(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |   CAST(round(value*100) AS BIGINT) AS value_cents FROM events),
        |f AS (
        |  SELECT e.*, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |    WHEN lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT f.*, SUM(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(ts_us) AS start_us, MAX(ts_us) AS end_us, SUM(value_cents) AS sum_cents
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_windowed_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))) AS bucket_us,
        | event_type, COUNT(*) AS n,
        | SUM(CAST(round(value*100) AS BIGINT)) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin,
  )
}
