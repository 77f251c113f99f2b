package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule that swaps the row_number top-k idiom for the
  * heap operator: fires exactly when safe, never changes results. */
class TopKRewriteSpec extends SparkSpec {

  private def windowTopK = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    graft.sources.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_retailprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  private def asSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("auto-rewrite turns row_number top-k into the heap operator") {
    // baseline rows with the rewrite OFF
    val want = asSet(windowTopK.select("p_brand", "p_partkey", "p_retailprice").collect())
    TopK.enableAutoRewrite(spark)
    try {
      val df = windowTopK.select("p_brand", "p_partkey", "p_retailprice")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n${plan.take(1500)}")
      assert(!plan.contains("Window"), s"window survived:\n${plan.take(1500)}")
      assert(asSet(df.collect()) == want)
    } finally TopK.disableAutoRewrite(spark)
  }

  test("rewrite does NOT fire when the rank column is consumed") {
    TopK.enableAutoRewrite(spark)
    try {
      val plan = windowTopK.select("p_brand", "rn", "p_partkey")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"))
    } finally TopK.disableAutoRewrite(spark)
  }

  test("rewrite does NOT fire for non-default null ordering") {
    TopK.enableAutoRewrite(spark)
    try {
      // DESC NULLS FIRST contradicts the heap operator's NULLS LAST
      // contract — must stay on the window path
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc_nulls_first, col("p_partkey"))
      val plan = graft.sources.Tables.part(spark, sfDir)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_brand", "p_partkey")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"))
      assert(plan.contains("Window"))
    } finally TopK.disableAutoRewrite(spark)
  }

  test("global top-k (no PARTITION BY) stays on the window path and still runs") {
    TopK.enableAutoRewrite(spark)
    try {
      // an empty partition spec has no clustering keys for the final
      // stage's ClusteredDistribution — rewriting would crash planning
      val w = Window.orderBy(col("p_retailprice").desc, col("p_partkey"))
      val df = graft.sources.Tables.part(spark, sfDir)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_partkey")
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() == 3)
    } finally TopK.disableAutoRewrite(spark)
  }

  test("rn < Int.MinValue is not rewritten into top-Int.MaxValue") {
    TopK.enableAutoRewrite(spark)
    try {
      // v - 1 on the strict form would wrap to Int.MaxValue and return
      // every row per key; the window path returns the correct 0 rows.
      // The degenerate predicate must be the ONLY filter so limitOf
      // actually sees it (stacked filters wouldn't match the pattern).
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      val df = graft.sources.Tables.part(spark, sfDir)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") < Int.MinValue)
        .select("p_brand", "p_partkey")
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() == 0)
    } finally TopK.disableAutoRewrite(spark)
  }

  test("rewrite does NOT fire for an unsupported ordering contract") {
    TopK.enableAutoRewrite(spark)
    try {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").asc, col("p_partkey"))
      val plan = graft.sources.Tables.part(spark, sfDir)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_brand", "p_partkey")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"))
    } finally TopK.disableAutoRewrite(spark)
  }

  test("the SQL-text top-k report rides the heap operator under the rewrite") {
    val base = graft.analytics.Analytics.sqlTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    TopK.enableAutoRewrite(spark)
    try {
      val df = graft.analytics.Analytics.sqlTopK(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"),
        s"SQL top-k did not rewrite:\n${plan.take(1500)}")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == base)
      assert(base.nonEmpty)
    } finally TopK.disableAutoRewrite(spark)
  }
}
