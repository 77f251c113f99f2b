package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion formats the reference pipeline consumes (reference:
  * Part1/data_gather.py JSON breadcrumbs, Part1 vehicle_ids.csv,
  * Part3/stop_event_publisher.py parse_html) — re-expressed as
  * schema'd, quarantine-aware Spark readers.
  */
object Formats {

  val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType),
    StructField("_corrupt", StringType)))

  /** JSON-lines event reader: explicit schema (no inference pass over
    * 100 TB), PERMISSIVE mode with corrupt records captured in a column
    * instead of killing the load — the subscriber's try/except
    * json.loads, auditable. */
  def readJsonEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventJsonSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Schema-evolution parquet reader: mergeSchema unions all footer
    * schemas so files written before a column existed read back with
    * that column null-filled — the append-only table whose producer
    * added fields over time (the reference's breadcrumb feed gained
    * GPS_HDOP mid-project). At scale, pay the footer-merge cost once
    * and pin the merged schema in a catalog. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC interchange: the other columnar warehouse format a consumer
    * may demand. Same pushdown/pruning story as parquet (predicate
    * pushdown + column pruning reach the ORC reader; spec-asserted),
    * so the choice is an interoperability decision, not a plan one. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML event interchange (Spark 4 built-in XML source): one <event>
    * element per row under a <events> root — the config/legacy-feed
    * format B2B integrations still emit. Reads with an EXPLICIT schema
    * (no inference pass at scale) and writes with the matching
    * rowTag/rootTag so the round trip is lossless; same
    * quarantine-aware posture as the JSON reader (malformed elements
    * null out rather than kill the load). */
  val eventXmlSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  def writeXmlEvents(df: DataFrame, path: String): Unit =
    df.write.format("xml")
      .option("rowTag", "event").option("rootTag", "events")
      .mode("overwrite").save(path)

  def readXmlEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .schema(eventXmlSchema)
      .option("rowTag", "event")
      .load(path)

  /** Raw media ingestion via Spark's binaryFile source — the entry
    * point of the multimodal family: a directory of image/audio/video
    * files becomes (path, modificationTime, length, content) rows, and
    * the content bytes flow straight into the binary-column operators
    * (mm_meta/mm_dedup/mm_decode/mm_retrieval). `pathGlobFilter`
    * prunes non-media files AT THE LISTING, and
    * `spark.sql.files.maxPartitionBytes` governs how many files pack
    * into a task — the two dials that matter when the directory holds
    * billions of objects. The filename (not the payload) carries the
    * join key upstream systems use, so it is surfaced as a column. */
  def readMediaDir(spark: SparkSession, path: String,
      glob: String = "*.bin"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("file_name"),
        col("length").cast("long").as("n_bytes"),
        sha2(col("content"), 256).as("digest"),
        col("content").as("media"))

  /** Headerless single-column key list (vehicle_ids.csv analog). */
  def readKeyList(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(StructField("key", LongType))))
      .option("header", "false")
      .csv(path)

  final case class HtmlRow(cells: Seq[String])

  /** Executor-side HTML-table parser (the publisher's BeautifulSoup
    * step, dependency-free): each input string is one fetched page;
    * emits one row per <tr>, cells in order. Runs in mapPartitions so
    * 100 TB of raw pages parse where they live. */
  def parseHtmlTables(pages: Dataset[String]): Dataset[Seq[String]] = {
    import pages.sparkSession.implicits._
    val tr = "(?is)<tr[^>]*>(.*?)</tr>".r
    val cell = "(?is)<t[dh][^>]*>(.*?)</t[dh]>".r
    val tag = "(?s)<[^>]*>".r
    pages.flatMap { html =>
      tr.findAllMatchIn(html).map { row =>
        cell.findAllMatchIn(row.group(1))
          .map(m => tag.replaceAllIn(m.group(1), "").trim)
          .toSeq
      }.filter(_.nonEmpty)
    }
  }

  /** Header+rows HTML table → DataFrame with the header as columns
    * (stop-event pages: first row is <th> names). */
  def htmlTableToDf(spark: SparkSession, pages: Dataset[String]): DataFrame = {
    import spark.implicits._
    val rows = parseHtmlTables(pages)
    // take(1), not head(): zero parsed tables must read as an empty
    // frame, not NoSuchElementException
    val header = rows.take(1).headOption.getOrElse(Seq.empty)
    if (header.isEmpty) return Seq.empty[Seq[String]].toDF("cells")
    // drop ONLY header-shaped repeats (a <th> row re-emitted per page),
    // never a data row that happens to echo the header VALUES — the
    // parser marks nothing, so the distinguishing feature is identity
    // with the first row; a data row identical to the header is
    // indistinguishable in-band and the page format (th first row per
    // page) makes repeats headers. Width mismatches are ragged rows.
    val sanitized = header.map(_.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    // de-collide sanitized names ("Stop ID"/"stop-id" both -> stop_id):
    // suffix later duplicates positionally so col() stays unambiguous
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = sanitized.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    rows.filter(r => r != header && r.length == header.length)
      .map(r => r.toArray)
      .toDF("cells")
      .select(names.zipWithIndex.map { case (name, i) =>
        col("cells").getItem(i).as(name)
      }: _*)
  }
}
