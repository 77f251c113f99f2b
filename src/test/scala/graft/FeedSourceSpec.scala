package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The DSv2 vehicle-feed connector: batch read, offset-tracked
  * incremental micro-batches, and checkpointed restart/replay safety —
  * the reference's data-gather landing zone as a real Spark source. */
class FeedSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.feed.FeedSource"

  private def writeSnapshot(dir: java.io.File, name: String, seqs: Range): Unit = {
    val lines = seqs.map { s =>
      s"""{"seq":$s,"vehicle_id":${s % 7},"route_id":${100 + s % 3},""" +
        s""""ts_ms":${1700000000000L + s * 1000L},"lat":${45.5 + (s % 10) * 0.01},""" +
        s""""lon":${-122.6 - (s % 10) * 0.01},"speed":${(s % 25).toDouble}}"""
    }
    Files.write(new java.io.File(dir, name).toPath,
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("batch read sees every record of every snapshot with the declared schema") {
    val dir = Files.createTempDirectory("feed_batch").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 20)
    writeSnapshot(dir, "poll-0002.jsonl", 20 until 50)
    // a non-snapshot file must be ignored by the listing
    Files.write(new java.io.File(dir, "README.txt").toPath, "x".getBytes)
    val df = spark.read.format(Fmt).option("path", dir.getAbsolutePath).load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("seq", "vehicle_id", "route_id", "ts_ms", "lat", "lon", "speed"))
    assert(df.count() == 50)
    assert(df.agg(sum("seq")).head.getLong(0) == (0 until 50).sum.toLong)
    val r = df.filter(col("seq") === 3).head
    assert(r.getAs[Long]("vehicle_id") == 3 && r.getAs[Long]("route_id") == 100)
    assert(r.getAs[Double]("speed") == 3.0)
  }

  test("micro-batch stream consumes newly landed snapshots exactly once") {
    val dir = Files.createTempDirectory("feed_stream").toFile
    val ckpt = Files.createTempDirectory("feed_ckpt").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 10)
    val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
      .writeStream.format("memory").queryName("feed_mem")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_mem").count() == 10)
      // two more polls land; only they flow through — no replay of
      // the consumed prefix
      writeSnapshot(dir, "poll-0002.jsonl", 10 until 25)
      writeSnapshot(dir, "poll-0003.jsonl", 25 until 30)
      q.processAllAvailable()
      val got = spark.table("feed_mem")
      assert(got.count() == 30, "new snapshots must arrive exactly once")
      assert(got.select("seq").distinct().count() == 30,
        "a replayed file would duplicate seqs")
    } finally q.stop()
  }

  test("compacting a CONSUMED snapshot cannot skip or replay unconsumed files") {
    // the name-keyed offset contract: after poll-0001/0002 are
    // consumed, archiving poll-0001 away must not shift what the next
    // slice sees — poll-0003 arrives exactly once, nothing is re-read
    val dir = Files.createTempDirectory("feed_compact").toFile
    val ckpt = Files.createTempDirectory("feed_compact_ckpt").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 10)
    writeSnapshot(dir, "poll-0002.jsonl", 10 until 18)
    val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
      .writeStream.format("memory").queryName("feed_compact_mem")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_compact_mem").count() == 18)
      // landing-zone hygiene: the consumed head snapshot is archived
      assert(new java.io.File(dir, "poll-0001.jsonl").delete())
      writeSnapshot(dir, "poll-0003.jsonl", 18 until 25)
      q.processAllAvailable()
      val got = spark.table("feed_compact_mem")
      assert(got.count() == 25,
        "compaction of a consumed snapshot shifted the offset window")
      assert(got.select("seq").distinct().count() == 25,
        "a re-read file would duplicate seqs")
    } finally q.stop()
  }

  test("a partially written snapshot (.tmp / hidden names) is never read") {
    // the landing contract: pollers write poll-NNNN.jsonl.tmp then
    // rename into place. An in-flight .tmp (or a Hadoop-convention
    // hidden ._/_  name) appearing mid-listing must be invisible to
    // both batch and streaming reads until the rename completes.
    val dir = Files.createTempDirectory("feed_tmp").toFile
    val ckpt = Files.createTempDirectory("feed_tmp_ckpt").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 5)
    writeSnapshot(dir, "poll-0002.jsonl.tmp", 100 until 200) // in-flight
    writeSnapshot(dir, ".poll-0002.jsonl", 300 until 400)    // hidden
    writeSnapshot(dir, "_tmp-0002.jsonl", 500 until 600)     // hidden
    assert(spark.read.format(Fmt).option("path", dir.getAbsolutePath)
      .load().count() == 5, "batch read must skip in-flight/hidden files")
    val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
      .writeStream.format("memory").queryName("feed_tmp_mem")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_tmp_mem").count() == 5)
      // the rename completes: the snapshot becomes visible atomically
      // and flows through exactly once
      val tmp = new java.io.File(dir, "poll-0002.jsonl.tmp")
      assert(tmp.renameTo(new java.io.File(dir, "poll-0002.jsonl")))
      q.processAllAvailable()
      assert(spark.table("feed_tmp_mem").count() == 105,
        "renamed-into-place snapshot must arrive exactly once")
    } finally q.stop()
  }

  test("latestOffset never regresses below the high-water mark on a transiently empty listing") {
    // object-store listings can be transiently incomplete; a regressed
    // offset would re-plan consumed files on the next slice. The
    // stream instance tracks the max name it has seen and holds the
    // line: delete ALL files after consumption, then land a new one —
    // nothing is re-read, the new file arrives exactly once.
    val dir = Files.createTempDirectory("feed_regress").toFile
    val ckpt = Files.createTempDirectory("feed_regress_ckpt").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 6)
    writeSnapshot(dir, "poll-0002.jsonl", 6 until 12)
    val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
      .writeStream.format("memory").queryName("feed_regress_mem")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_regress_mem").count() == 12)
      // full compaction: the directory goes EMPTY (listing would
      // yield offset "" — strictly below the checkpointed name)
      assert(new java.io.File(dir, "poll-0001.jsonl").delete())
      assert(new java.io.File(dir, "poll-0002.jsonl").delete())
      q.processAllAvailable() // an empty-listing cycle must not regress
      // a consumed file is RESTORED (object-store list consistency
      // heals) alongside a genuinely new poll
      writeSnapshot(dir, "poll-0002.jsonl", 6 until 12)
      writeSnapshot(dir, "poll-0003.jsonl", 12 until 20)
      q.processAllAvailable()
      val got = spark.table("feed_regress_mem")
      assert(got.count() == 20,
        "offset regression re-read a consumed snapshot or skipped the new one")
      assert(got.select("seq").distinct().count() == 20)
    } finally q.stop()
  }

  test("restart from the checkpoint resumes at the recorded offset") {
    val dir = Files.createTempDirectory("feed_restart").toFile
    val ckpt = Files.createTempDirectory("feed_ckpt2").toFile
    val out = Files.createTempDirectory("feed_out").toFile.getAbsolutePath
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 8)
    def run(): Unit = {
      val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 8)
    // a poll lands while the query is DOWN; the restarted query (same
    // checkpoint) must append only the unconsumed suffix — a replay of
    // the consumed prefix would duplicate seqs 0..7 in the sink
    writeSnapshot(dir, "poll-0002.jsonl", 8 until 14)
    run()
    val got = spark.read.parquet(out).select("seq").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 14L).toSeq,
      s"restart must resume past the checkpointed prefix exactly once, got ${got.mkString(",")}")
  }

  test("the stream composes with the engine's transforms (windowed counts per route)") {
    val dir = Files.createTempDirectory("feed_agg").toFile
    val ckpt = Files.createTempDirectory("feed_ckpt3").toFile
    writeSnapshot(dir, "poll-0001.jsonl", 0 until 30)
    val q = spark.readStream.format(Fmt).option("path", dir.getAbsolutePath).load()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("route_id"))
      .agg(count(lit(1)).as("n"), avg("speed").as("avg_speed"))
      .writeStream.format("memory").queryName("feed_win")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("feed_win").agg(sum("n")).head.getLong(0)
      assert(n == 30)
    } finally q.stop()
  }
}
