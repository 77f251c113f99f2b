package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class HammingDistanceSpec extends SparkSpec {

  test("hamming64 matches Long.bitCount over random pairs (codegen path)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    val got = pairs.toDF("a", "b")
      .select(expr("hamming64(a, b)").as("h")).as[Long].collect()
    val want = pairs.map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }
    assert(got.toSeq == want)
  }

  test("hamming64 null propagation and type check") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((Some(5L), Option.empty[Long])).toDF("a", "b")
      .selectExpr("hamming64(a, b)").collect()
    assert(r.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(("x", 1L)).toDF("a", "b").selectExpr("hamming64(a, b)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("hamming64") ||
      err.getMessage.toLowerCase.contains("bigint"))
  }

  test("fractional args are a type error, not a silent truncation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // the ergonomic widening covers INTEGRAL types only: hamming64(a, 3.7)
    // must fail analysis, not quietly compare against 3
    val err = intercept[Exception] {
      Seq((5L, 3.7)).toDF("a", "b").selectExpr("hamming64(a, b)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("hamming64") ||
      err.getMessage.toLowerCase.contains("bigint"))
    // int literals still widen ergonomically
    val ok = Seq(Tuple1(5L)).toDF("a").selectExpr("hamming64(a, 4)").collect()
    assert(ok.head.getLong(0) == java.lang.Long.bitCount(5L ^ 4L).toLong)
  }
}
