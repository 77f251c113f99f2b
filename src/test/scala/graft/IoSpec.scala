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

  test("selective dim join dynamically prunes fact partitions at the scan") {
    // THE 100 TB read-side lever for a date-partitioned lake: a
    // selective dimension join must prune fact PARTITIONS via a
    // runtime (dynamicpruning) subquery, not scan the whole table and
    // filter after. Static literal predicates must land in
    // PartitionFilters the same way.
    val out = Files.createTempDirectory("graft_dpp").toString
    val clean = graft.etl.EventsEtl.cleanEvents(spark, sfDir)
    Sink.writePartitioned(clean, out, Seq("event_date"))
    val fact = spark.read.parquet(out)
    // static pruning: literal partition predicate reaches the scan
    val static = fact.filter(col("event_date") === "2024-01-02")
    val staticPlan = static.queryExecution.executedPlan.toString
    assert(staticPlan.contains("PartitionFilters:") &&
      staticPlan.replaceAll("\\s+", " ").contains("event_date"),
      s"partition predicate missing from scan:\n${staticPlan.take(1500)}")
    // dynamic pruning: qualifying dates only known at runtime — a dim
    // TABLE carrying a flag, filtered on a non-partition predicate
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    clean.select("event_date").distinct()
      .withColumn("day_of_month", dayofmonth(col("event_date")))
      .write.mode("overwrite").parquet(dimPath)
    // attribute-vs-literal comparison: the shape DPP's selectivity
    // heuristic recognizes (a bare boolean attribute does not qualify)
    val dim = spark.read.parquet(dimPath).filter(col("day_of_month") <= 2)
    val joined = fact.join(dim.hint("broadcast"), Seq("event_date"))
    val dppPlan = joined.queryExecution.executedPlan.toString
    assert(dppPlan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${dppPlan.take(2000)}")
    assert(joined.count() > 0)
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

  test("upsert keeps highest version per key, rewrites only touched partitions, idempotent") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_upsert").toString
    val base = Seq(
      ("d1", 1L, 1L, "a"), ("d1", 2L, 1L, "b"), ("d2", 3L, 1L, "c")
    ).toDF("day", "id", "version", "payload")
    Sink.upsertPartitioned(base, out, "day", "id", "version")
    // change set: update id=1 (newer version), insert id=4, d2 untouched
    val changes = Seq(
      ("d1", 1L, 2L, "a2"), ("d1", 4L, 1L, "d")
    ).toDF("day", "id", "version", "payload")
    Sink.upsertPartitioned(changes, out, "day", "id", "version")
    def snapshot() = spark.read.parquet(out)
      .select("day", "id", "version", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val expect = Set(("d1", 1L, 2L, "a2"), ("d1", 2L, 1L, "b"),
      ("d2", 3L, 1L, "c"), ("d1", 4L, 1L, "d"))
    assert(snapshot() == expect)
    // re-applying the same change set changes nothing
    Sink.upsertPartitioned(changes, out, "day", "id", "version")
    assert(snapshot() == expect)
    // stale change (lower version) must not override
    val stale = Seq(("d1", 1L, 1L, "old")).toDF("day", "id", "version", "payload")
    Sink.upsertPartitioned(stale, out, "day", "id", "version")
    assert(snapshot() == expect)
  }

  test("compaction collapses a partition's small files without changing data") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_compact").toString
    // simulate a per-batch append load: several small files per partition
    for (batch <- 1 to 4)
      Seq(("d1", batch.toLong, s"p$batch"), ("d2", batch.toLong + 100, s"q$batch"))
        .toDF("day", "id", "payload")
        .write.mode("append").partitionBy("day").parquet(out)
    def files(day: String) = new java.io.File(s"$out/day=$day").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = spark.read.parquet(out).collect()
      .map(r => (r.getString(r.fieldIndex("day")), r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("payload")))).toSet
    assert(files("d1") > 1)
    Sink.compactPartitions(spark, out, "day", Seq("d1"))
    assert(files("d1") == 1, s"expected 1 file after compaction, got ${files("d1")}")
    assert(files("d2") > 1) // untouched partition keeps its files
    val after = spark.read.parquet(out).collect()
      .map(r => (r.getString(r.fieldIndex("day")), r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("payload")))).toSet
    assert(after == before)
  }

  test("table-existence probe resolves through the Hadoop FileSystem (file: URI)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_exists")
    // absent path and empty directory are both "no table"
    assert(!Sink.tableExists(spark, "file:" + dir.toString + "/nope"))
    assert(!Sink.tableExists(spark, "file:" + dir.toString))
    // _SUCCESS-style markers alone don't count as data
    Files.createFile(dir.resolve("_SUCCESS"))
    assert(!Sink.tableExists(spark, "file:" + dir.toString))
    // real output does — via the scheme-qualified URI, not java.io.File
    val out = dir.resolve("t").toString
    Seq(("d1", 1L, 1L)).toDF("day", "id", "version")
      .write.partitionBy("day").parquet(out)
    assert(Sink.tableExists(spark, "file:" + out))
    // and upsert against the URI path takes the merge branch, not overwrite
    Sink.upsertPartitioned(Seq(("d2", 2L, 1L)).toDF("day", "id", "version"),
      "file:" + out, "day", "id", "version")
    assert(spark.read.parquet(out).count() == 2)
  }

  test("jdbc merge statement: postgres ON CONFLICT upsert, raw tables + quoted columns") {
    val sql = graft.io.JdbcSink.mergeSql("breadcrumb", "breadcrumb_stage",
      Seq("trip_id", "tstamp"), Seq("lat", "lon", "speed"))
    assert(sql ==
      """INSERT INTO breadcrumb ("trip_id", "tstamp", "lat", "lon", "speed") """ +
      """SELECT "trip_id", "tstamp", "lat", "lon", "speed" FROM breadcrumb_stage """ +
      """ON CONFLICT ("trip_id", "tstamp") DO UPDATE SET "lat" = EXCLUDED."lat", """ +
      """"lon" = EXCLUDED."lon", "speed" = EXCLUDED."speed"""")
    // key-only table degrades to DO NOTHING (idempotent insert)
    val keysOnly = graft.io.JdbcSink.mergeSql("t", "t_stage", Seq("id"), Seq.empty)
    assert(keysOnly == """INSERT INTO t ("id") SELECT "id" FROM t_stage ON CONFLICT ("id") DO NOTHING""")
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
