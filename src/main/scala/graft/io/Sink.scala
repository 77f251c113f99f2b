package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Load-stage sinks — the Spark-native replacement for the reference's
  * Postgres COPY loads (load_breadcrumb.py copy_from_df,
  * stop_event_subscriber.py load_to_postgres).
  *
  * At 100 TB the load target is a partitioned columnar table, not a
  * row-store COPY: date/key partitioning gives partition pruning to
  * every downstream query, and dynamic partition overwrite makes
  * re-running a day's load idempotent (the reference's re-run story is
  * "duplicate rows"; ours is "replace the partition").
  */
object Sink {

  /** Write a DataFrame as parquet partitioned by the given columns,
    * replacing only the partitions present in `df` (idempotent loads). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Plain append load for immutable event streams. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
}
