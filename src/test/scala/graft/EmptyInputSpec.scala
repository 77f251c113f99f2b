package graft

/** Robustness gate: every operator must plan and execute against EMPTY
  * input tables (schema-preserved, zero rows) without throwing — the
  * day-one state of any real deployment, and the failure mode of a
  * partition-pruned read that matched nothing. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      graft.sources.Tables.load(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    // events has shipped as TIMESTAMP(NANOS) in some data drops and
    // micros-NTZ in others; set the nanos legacy flag (harmless on a
    // micros file) and copy the PRE-conversion schema with zero rows —
    // Tables.events then applies whichever adaptation the copied
    // schema calls for, exactly as on the real file
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every query runs to completion on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }

  test("pareto cut yields ZERO rows (not one all-null row) with no purchases") {
    // mirrors the oracle's GROUP BY semantics: an ungrouped agg here
    // would emit a single null row and hash-mismatch on empty corpora
    assert(graft.analytics.Analytics.pareto8020(spark, emptyDir).count() === 0L)
  }
}
