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

  test("SaltedJoinRewrite: a configured hot key rewrites the join plan and keeps results") {
    import graft.plans.SaltedJoinRewrite
    import spark.implicits._
    SaltedJoinRewrite.enable(spark)
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 1L, i))
      .toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    // baseline BEFORE configuring: plan untouched, results captured
    val plainDf = big.join(small, Seq("k"))
    assert(!plainDf.queryExecution.optimizedPlan.toString.contains("_salt"),
      "rule must be a no-op until keys are configured")
    val plain = plainDf.agg(count(lit(1)), sum("payload")).collect().head
    spark.conf.set(SaltedJoinRewrite.KeysConf, "k")
    spark.conf.set(SaltedJoinRewrite.BucketsConf, "4")
    try {
      val df = big.join(small, Seq("k"))
      val opt = df.queryExecution.optimizedPlan
      // the plan carries the salted shape: a Generate on the dim side
      // and the salt equality in the join condition
      val joins = opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      assert(joins.nonEmpty)
      assert(joins.head.condition.get.references.exists(_.name == "_salt"),
        s"join condition must include the salt:\n$opt")
      assert(opt.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.nonEmpty,
        s"dim side must be exploded across salt values:\n$opt")
      // results unchanged vs the un-rewritten join
      assert(df.agg(count(lit(1)), sum("payload")).collect().head == plain)
      // the hot key's rows actually spread over partitions
      val hot = Seq.fill(1000)((1L, "x")).toDF("k", "v")
      val dim = Seq((1L, "dim")).toDF("k", "attr")
      val parts = hot.join(dim, Seq("k"))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(parts.count(_ > 0) > 1,
        s"expected the hot key in >1 partition, got ${parts.toSeq}")
      // a COMPOUND-key join salts only under its EXPLICIT tuple entry
      // (order-insensitive), never under a bare column name — the
      // cost contract is per profiled key set (r9 ADVICE: a generic
      // configured name must not leak ×B replication onto every
      // compound join that happens to carry it)
      val bigTwo = big.withColumn("k2", col("payload") % 3)
      val smallTwo = small.withColumn("k2", col("k") % 3)
      assert(!bigTwo.join(smallTwo, Seq("k", "k2"))
          .queryExecution.optimizedPlan.toString.contains("_salt"),
        "bare 'k' must not salt the (k, k2) compound join")
      spark.conf.set(SaltedJoinRewrite.KeysConf, "k2 + k")
      val two = bigTwo.join(smallTwo, Seq("k", "k2"))
      val twoPlan = two.queryExecution.optimizedPlan
      assert(twoPlan.collect {
          case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn }
          .head.condition.get.references.exists(_.name == "_salt"),
        s"two-key join under its tuple entry must salt:\n$twoPlan")
      val twoGot = two.agg(count(lit(1)), sum("payload")).collect().head
      spark.conf.set(SaltedJoinRewrite.KeysConf, "") // plain replay
      val twoPlain = bigTwo.join(smallTwo, Seq("k", "k2"))
        .agg(count(lit(1)), sum("payload")).collect().head
      spark.conf.set(SaltedJoinRewrite.KeysConf, "k")
      assert(twoGot == twoPlain, "salted two-key join changed results")
      // a two-key join with NO configured tuple keeps its plan
      val cold = bigTwo.withColumnRenamed("k", "kc")
        .join(smallTwo.withColumnRenamed("k", "kc")
          .withColumnRenamed("attr", "attrc"), Seq("kc", "k2"))
      assert(!cold.queryExecution.optimizedPlan.toString.contains("_salt"),
        "unconfigured keys must keep their plan")
      // a residual non-equality conjunct RIDES the rewrite (r9 verdict
      // item 5: the date-bounded fact join shape) — the key set is
      // still exactly {k}, so bare 'k' fires, the residual lands in
      // the rewritten condition, and results match the plain replay
      val residual = big.join(small,
        big("k") === small("k") && big("payload") > small("k"))
      val resPlan = residual.queryExecution.optimizedPlan
      assert(resPlan.toString.contains("_salt"),
        s"equality + residual must still salt on the equality key:\n$resPlan")
      val resGot = residual.agg(count(lit(1)), sum("payload")).collect().head
      spark.conf.set(SaltedJoinRewrite.KeysConf, "")
      val resPlain = big.join(small,
          big("k") === small("k") && big("payload") > small("k"))
        .agg(count(lit(1)), sum("payload")).collect().head
      spark.conf.set(SaltedJoinRewrite.KeysConf, "k")
      assert(resGot == resPlain, "salted residual join changed results")
      // a join whose ONLY conjunct is a non-equality never salts —
      // there is no key to route on
      assert(!big.join(small, big("payload") > small("k"))
          .queryExecution.optimizedPlan.toString.contains("_salt"),
        "a pure theta join must keep its plan")
    } finally {
      spark.conf.unset(SaltedJoinRewrite.KeysConf)
      spark.conf.unset(SaltedJoinRewrite.BucketsConf)
    }
  }
}
