package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for representative queries and greps the
  * properties that matter at scale: parquet filter pushdown
  * (PushedFilters), column pruning (ReadSchema), broadcast joins, and
  * WholeStageCodegen coverage. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_shipping", "q5_region", "etl_clean_events",
        "q_latest_trace", "dedup_minhash", "ann_bruteforce",
        "q_range_join", "etl_backfill_gaps", "q_sessionize_scale")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val plan = graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
    }
    spark.stop()
  }
}
