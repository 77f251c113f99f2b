package graft

import org.apache.spark.sql.functions._

/** The integer vector kernels (vec_l2sq_long / vec_dot_long) replace
  * interpreted aggregate(zip_with(...)) lambda folds on per-pair hot
  * paths (vec_rp_eval, vec_outliers, vec_cluster_eval, mm_retrieval).
  * The optimization contract is BIT-IDENTITY with the lambda form —
  * pinned here against the interpreted expressions themselves, plus
  * the null/mismatch edge semantics. */
class VecIntOpsSpec extends SparkSpec {

  private def registered(): Unit = graft.functions.GraftFunctions.register(spark)

  test("vec_l2sq_long and vec_dot_long match the interpreted lambda fold") {
    registered()
    import spark.implicits._
    // deterministic pseudo-random long vectors incl. negatives/zeros
    val rows = (0 until 64).map { r =>
      val a = (0 until 64).map(i => ((r * 64 + i) * 2654435761L % 2000001L) - 1000000L)
      val b = (0 until 64).map(i => ((r * 97 + i * 31) * 40503L % 2000001L) - 1000000L)
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("l2_kernel", expr("vec_l2sq_long(a, b)"))
      .withColumn("l2_lambda", expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .withColumn("dot_kernel", expr("vec_dot_long(a, b)"))
      .withColumn("dot_lambda", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    val bad = df.filter(col("l2_kernel") =!= col("l2_lambda") ||
      col("dot_kernel") =!= col("dot_lambda")).count()
    assert(bad == 0)
    // and a hand-checked anchor
    val r = spark.sql(
      "SELECT vec_l2sq_long(array(1L, 2L, 3L), array(4L, 0L, 3L)) AS l2, " +
        "vec_dot_long(array(1L, 2L, 3L), array(4L, 0L, 3L)) AS d").head()
    assert(r.getLong(0) == 9L + 4L + 0L)
    assert(r.getLong(1) == 4L + 0L + 9L)
  }

  test("RpProject kernel components are bit-identical to the column expansion") {
    registered()
    import spark.implicits._
    val k = 16; val dim = 64
    // deterministic micro-unit-scale vectors incl. negatives
    val rows = (0 until 128).map { r =>
      (r.toLong, (0 until dim).map(i =>
        ((r * dim + i) * 2654435761L % 2000001L) - 1000000L))
    }
    val df = rows.toDF("vec_id", "qv")
    val expanded = df.select(col("vec_id") +:
      graft.vector.VectorOps.rpCompCols(k, dim): _*)
    val fused = df.select(col("vec_id"),
      graft.vector.VectorOps.rpProjectCol(col("qv"), k, dim).as("rp"))
    val joinedBad = expanded.join(fused, "vec_id")
      .filter((0 until k).map(i =>
        col(s"c$i") =!= element_at(col("rp"), i + 1)).reduce(_ || _))
      .count()
    assert(joinedBad == 0)
    // null-element mirror: every component null, array itself non-null
    val nr = spark.range(1).select(graft.vector.VectorOps.rpProjectCol(
      array((0 until dim).map(i =>
        if (i == 3) lit(null).cast("long") else lit(i.toLong)): _*), k, dim).as("rp"))
      .selectExpr("rp IS NULL AS an", "rp[0] IS NULL AS en").head()
    assert(!nr.getBoolean(0) && nr.getBoolean(1))
  }

  test("null semantics mirror the lambda fold; dimension mismatch fails loudly") {
    registered()
    // null array -> null (nullSafeEval), null ELEMENT -> null (the
    // lambda's null + x = null propagation)
    val r = spark.sql(
      "SELECT vec_l2sq_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS a, " +
        "vec_dot_long(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT vec_l2sq_long(array(1L, 2L), array(1L))").collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }
}
