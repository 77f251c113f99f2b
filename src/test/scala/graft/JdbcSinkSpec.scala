package graft

import graft.io.JdbcSink

/** End-to-end JDBC load-stage specs against EMBEDDED DERBY (the row
  * store that ships on the Spark classpath) — the closest in-sandbox
  * stand-in for the reference's Postgres target: real connections,
  * real DDL, real set-based MERGE. */
class JdbcSinkSpec extends SparkSpec {

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props = new java.util.Properties()

  test("append load round-trips through the row store with partition-parallel writes") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 10.5), (2L, "bravo", 20.25), (3L, "carol", 30.0))
      .toDF("id", "name", "v")
    JdbcSink.appendJdbc(df.repartition(2), url, "t_append", props)
    val back = spark.read.jdbc(url, "t_append", props)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(back == Seq((1L, "alpha", 10.5), (2L, "bravo", 20.25), (3L, "carol", 30.0)))
  }

  test("stage-and-merge upsert overwrites matched keys, inserts new, and is idempotent") {
    import spark.implicits._
    def state(): Seq[(Long, Long)] =
      spark.read.jdbc(url, "t_upsert", props).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    JdbcSink.appendJdbc(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      url, "t_upsert", props)
    val batch2 = Seq((2L, 99L), (3L, 30L)).toDF("id", "v")
    JdbcSink.upsertJdbc(batch2, url, "t_upsert", Seq("id"), props, dialect = "ansi")
    assert(state() == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
    // re-applying the same batch is a row-wise no-op (idempotent load)
    JdbcSink.upsertJdbc(batch2, url, "t_upsert", Seq("id"), props, dialect = "ansi")
    assert(state() == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
  }

  test("streaming foreachBatch upserts into the row store exactly-once under replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the reference's full streaming architecture: bus -> validate ->
    // row store (Pub/Sub -> Postgres); here MemoryStream -> Derby
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = stream.toDF().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        JdbcSink.upsertJdbc(batch, url, "t_stream", Seq("id"), props,
          dialect = "ansi")
      }
      .start()
    stream.addData((1L, 10L), (2L, 20L))
    q.processAllAvailable()
    stream.addData((2L, 99L), (3L, 30L)) // update + insert
    q.processAllAvailable(); q.stop()
    // replay the last micro-batch shape manually (at-least-once delivery)
    JdbcSink.upsertJdbc(Seq((2L, 99L), (3L, 30L)).toDF("id", "v"),
      url, "t_stream", Seq("id"), props, dialect = "ansi")
    val got = spark.read.jdbc(url, "t_stream", props).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
  }

  test("merge generators emit the pinned statements in both dialects") {
    val pg = JdbcSink.mergeSql("b", "b_stage", Seq("id"), Seq("v"))
    assert(pg == """INSERT INTO b ("id", "v") SELECT "id", "v" FROM b_stage """ +
      """ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"""")
    val ansi = JdbcSink.mergeSqlStandard("b", "b_stage", Seq("id"), Seq("v"))
    assert(ansi == """MERGE INTO b t USING b_stage s ON (t."id" = s."id")""" +
      """ WHEN MATCHED THEN UPDATE SET t."v" = s."v"""" +
      """ WHEN NOT MATCHED THEN INSERT ("id", "v") VALUES (s."id", s."v")""")
  }
}
