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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanos long and truncate to the
    * microsecond TimestampType domain (integral `div`, no FP).
    *
    * KNOWN session-conf side effect: `nanosAsLong` is a session-wide
    * legacy flag with no per-read option, and it is consulted at SCAN
    * execution, not at `spark.read` time — set-then-restore would race
    * the lazy job. After this call, other TIMESTAMP(NANOS) parquet in
    * the same session also reads as long (benign for this engine: the
    * events file is the only nanos source; flagged here because the
    * repo's convention elsewhere is per-write/per-read options). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
