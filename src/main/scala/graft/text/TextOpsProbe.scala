package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Profiling access to TextOps internals (tools only). */
object TextOpsProbe {
  def minhashPieces(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    TextOps.minhashPiecesInternal(spark, dir)
}
