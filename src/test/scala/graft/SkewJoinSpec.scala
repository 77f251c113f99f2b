package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 1L, i))
      .toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = big.join(small, Seq("k"))
      .agg(count(lit(1)), sum("payload")).collect().head
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .agg(count(lit(1)), sum("payload")).collect().head
    assert(plain == salted)
  }

  test("salt spreads the hot key over multiple partitions") {
    import spark.implicits._
    val big = Seq.fill(1000)((1L, "x")).toDF("k", "v")
    val small = Seq((1L, "dim")).toDF("k", "attr")
    val parts = SkewJoin.saltedJoin(big, small, "k", 8)
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(parts.count(_ > 0) > 1, s"expected >1 non-empty partition, got ${parts.toSeq}")
  }
}
