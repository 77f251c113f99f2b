package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`<dir>/<name>.parquet`).
  *
  * All reads are plain parquet scans so Catalyst can push filters and
  * prune columns into the scan; at cluster scale the same API points at
  * a partitioned table root and partition pruning applies unchanged.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some data
    * drops and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    * the loader adapts to the schema it actually reads instead of
    * assuming one physical type:
    *
    *  - nanos (read as long via the legacy flag, because Spark's
    *    vectorized reader has no nanos timestamp): integral-`div`
    *    truncate to the microsecond TimestampType domain (no FP);
    *  - micros NTZ (Spark infers TIMESTAMP_NTZ): cast to TimestampType —
    *    a wall-clock no-op under the engine's pinned UTC session zone,
    *    and it keeps every downstream `unix_micros`/window unchanged;
    *  - already TimestampType: pass through.
    *
    * KNOWN session-conf side effect: `nanosAsLong` is a session-wide
    * legacy flag with no per-read option, and it is consulted at SCAN
    * execution, not at `spark.read` time — set-then-restore would race
    * the lazy job. After this call, other TIMESTAMP(NANOS) parquet in
    * the same session also reads as long (benign for this engine: the
    * events file is the only nanos source; flagged here because the
    * repo's convention elsewhere is per-write/per-read options). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
