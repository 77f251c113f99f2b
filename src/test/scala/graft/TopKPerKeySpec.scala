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

  test("NULL order values rank last (DESC NULLS LAST), even against negatives") {
    import spark.implicits._
    // NULLs arrive FIRST so a null-as-0.0 bug would admit them over the
    // negative-valued rows; the window contract puts them after every value
    val df = Seq(
      ("a", 1L, None: Option[Double]), ("a", 2L, None),
      ("a", 3L, Some(-5.0)), ("a", 4L, Some(-1.0)), ("a", 5L, Some(-2.0))
    ).toDF("g", "id", "v")
    val got = TopK.perKey(df, 3, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 5L, 3L)) // -1 > -2 > -5 > NULL
    // and with k past the non-null rows, NULLs fill by ascending tie
    val got4 = TopK.perKey(df, 4, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got4 == Set(4L, 5L, 3L, 1L))
  }

  test("NaN ranks greatest regardless of arrival order, matching Spark's sort") {
    import spark.implicits._
    // NaN arrives LAST, after the heap is already full at k=2
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, Double.NaN)).toDF("g", "id", "v")
    val got = TopK.perKey(df, 2, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("v").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("id").collect().map(_.getLong(0)).toSet
    assert(windowed == Set(5L, 4L)) // Spark sorts NaN greatest
    assert(got == windowed)
  }

  test("long ranking columns compare exactly above 2^53 (no double narrowing)") {
    import spark.implicits._
    val big = 9007199254740992L // 2^53
    // tie-break: equal order values, adjacent longs that collapse to the
    // same double; the LARGER tie arrives first so a narrowed compare
    // would see a spurious tie and keep the wrong row
    val dfTie = Seq(("a", big + 1, 1.0), ("a", big, 1.0)).toDF("g", "id", "v")
    val gotTie = TopK.perKey(dfTie, 1, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotTie == Set(big)) // ASC tie: 2^53 < 2^53+1
    // order: adjacent longs as the ranking value itself
    val dfOrd = Seq(("a", 1L, big), ("a", 2L, big + 1)).toDF("g", "id", "v")
    val gotOrd = TopK.perKey(dfOrd, 1, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotOrd == Set(2L)) // DESC order: 2^53+1 wins
  }

  test("result is invariant to the input partition layout (partial-stage correctness)") {
    import spark.implicits._
    // heavy ties (v has 13 values over 7 groups) so the map-side heaps
    // prune different row subsets under every layout; the final stage
    // must still converge on the same top-k
    val df = (1 to 400).map(i => ((i % 7).toString, i.toLong, (i % 13).toDouble))
      .toDF("g", "id", "v")
    val want = TopK.perKey(df.coalesce(1), 3, Seq("g"), "v", "id")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (p <- Seq(2, 5, 11)) {
      val got = TopK.perKey(df.repartition(p), 3, Seq("g"), "v", "id")
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"input layout with $p partitions diverged")
    }
  }

  test("map-side flush under a tiny entry cap never changes results") {
    import spark.implicits._
    val df = (1 to 400).map(i => ((i % 7).toString, i.toLong, (i % 13).toDouble))
      .toDF("g", "id", "v")
    val want = TopK.perKey(df, 3, Seq("g"), "v", "id")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // cap of 4 buffered entries forces dozens of partial-stage flushes
    // (7 groups × k=3 = 21 entries live without it); the final stage
    // must reconstruct the same top-k from the flushed superset
    spark.conf.set("graft.topk.partialFlushEntries", "4")
    try {
      val got = TopK.perKey(df.repartition(5), 3, Seq("g"), "v", "id")
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want)
    } finally spark.conf.unset("graft.topk.partialFlushEntries")
  }

  test("±0.0 group keys merge into one group, like Aggregate/Window keys") {
    import spark.implicits._
    // raw UnsafeRow bytes differ for the two zeros — without key
    // normalization they'd form two groups and emit up to 2k rows
    val df = Seq((0.0, 1L, 5.0), (-0.0, 2L, 4.0), (-0.0, 3L, 3.0))
      .toDF("g", "id", "v")
    val got = TopK.perKey(df, 1, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"±0.0 split the group: kept $got")
  }

  test("±0.0 ORDER values tie (SPARK-26021): the tie column decides") {
    import spark.implicits._
    // 0.0 arrives after -0.0; a strict bitwise order would rank
    // 0.0 > -0.0 DESC and keep id=2 — Spark's sort calls them equal,
    // so ascending tie keeps id=1
    val df = Seq(("a", 1L, -0.0), ("a", 2L, 0.0)).toDF("g", "id", "v")
    val got = TopK.perKey(df, 1, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"zero signs ranked strictly: kept $got")
  }

  test("downstream groupBy on the key reuses the top-k exchange (outputPartitioning)") {
    val part = graft.sources.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_retailprice")
    val plan = TopK.perKey(part, 3, Seq("p_brand"), "p_retailprice", "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected the aggregate to reuse the top-k exchange, found $exchanges:\n${plan.take(1500)}")
  }

  test("empty group columns and non-positive flush caps fail loudly") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(), "v", "id")
    }
    assert(e.getMessage.contains("group column"))
    // a cap of 0 would make the partial stage spin forever consuming
    // nothing — it must fail on the driver instead
    spark.conf.set("graft.topk.partialFlushEntries", "0")
    try {
      val e2 = intercept[IllegalArgumentException] {
        TopK.perKey(df, 1, Seq("g"), "v", "id").collect()
      }
      assert(e2.getMessage.contains("partialFlushEntries"))
    } finally spark.conf.unset("graft.topk.partialFlushEntries")
  }

  test("binary group keys group by value, not reference") {
    import spark.implicits._
    val df = Seq(
      (Array[Byte](1, 2), 1L, 5.0), (Array[Byte](1, 2), 2L, 4.0),
      (Array[Byte](3), 3L, 1.0)).toDF("g", "id", "v")
    val got = TopK.perKey(df, 1, Seq("g"), "v", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    // one winner per distinct key VALUE — reference-equality keys would
    // put every row in its own bucket and emit all three
    assert(got == Set(1L, 3L))
  }
}
