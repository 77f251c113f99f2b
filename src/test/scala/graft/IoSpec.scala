package graft

import graft.io.Sink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IoSpec extends SparkSpec {

  test("partitioned load writes date partitions and is idempotent on rerun") {
    val out = Files.createTempDirectory("graft_sink").toString
    val clean = graft.etl.EventsEtl.cleanEvents(spark, sfDir)
    Sink.writePartitioned(clean, out, Seq("event_date"))
    val n1 = spark.read.parquet(out).count()
    // rerun the same load — dynamic partition overwrite must not duplicate
    Sink.writePartitioned(clean, out, Seq("event_date"))
    val n2 = spark.read.parquet(out).count()
    assert(n1 == clean.count() && n2 == n1)
    // partition pruning reaches the directory layout
    val oneDay = spark.read.parquet(out).filter(col("event_date") === "2024-01-02")
    assert(oneDay.count() > 0)
  }

  test("partial re-load replaces only its partitions (dynamic overwrite)") {
    val out = Files.createTempDirectory("graft_sink2").toString
    val clean = graft.etl.EventsEtl.cleanEvents(spark, sfDir)
    Sink.writePartitioned(clean, out, Seq("event_date"))
    val total = spark.read.parquet(out).count()
    val oneDay = clean.filter(col("event_date") === "2024-01-02")
    // re-load just one day: other partitions must survive untouched
    Sink.writePartitioned(oneDay, out, Seq("event_date"))
    assert(spark.read.parquet(out).count() == total)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the point
    try {
      graft.sources.Tables.orders(s, sfDir)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      graft.sources.Tables.lineitem(s, sfDir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val j = s.table("lineitem_b")
        .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(j.count() == graft.sources.Tables.lineitem(s, sfDir).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
