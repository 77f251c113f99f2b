package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  test("custom operator matches the window formulation exactly") {
    val part = graft.sources.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_retailprice")
    val custom = TopK.perKey(part, 3, Seq("p_brand"), "p_retailprice", "p_partkey")
      .select("p_brand", "p_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val windowed = part.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("p_brand", "p_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == windowed)
  }

  test("plan uses the heap operator with no sort and no window") {
    val part = graft.sources.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_retailprice")
    val plan = TopK.perKey(part, 3, Seq("p_brand"), "p_retailprice", "p_partkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
    assert(!plan.contains("Sort"), plan.take(800))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(800))
  }

  test("per-language quality curation rides the heap operator and matches the window idiom") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = graft.text.TextOps.topQualityPerLang(spark, sfDir)
    assert(got.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val scored = graft.text.TextOps.quality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .join(graft.sources.Tables.documents(spark, sfDir).select("doc_id", "lang"), "doc_id")
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val windowed = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("lang", "doc_id", "quality_score")
    assert(got.count() == windowed.count())
    assert(got.join(windowed, Seq("lang", "doc_id"), "left_anti").count() == 0)
  }

  test("handles ties deterministically and k larger than group") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 5.0),
      ("b", 9L, 1.0)).toDF("g", "id", "v")
    val got = TopK.perKey(df, 3, Seq("g"), "v", "id")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // ties broken by ascending id; group b has fewer than k rows
    assert(got == Set(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L)))
  }
}
