package graft.sources.feed

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for the reference's ingest entry point —
  * the vehicle-positions gather step (reference `Part1/data_gather.py`
  * polls an HTTP API daily and lands JSON snapshots). This source
  * reads the LANDING ZONE the poller writes — a directory of
  * append-only `*.jsonl` snapshot files — as a real Spark table, batch
  * AND micro-batch:
  *
  *  - batch: every record of every snapshot (one input partition per
  *    file — at cluster scale the natural unit of list/read
  *    parallelism, same as the file sources).
  *  - micro-batch (Structured Streaming): the offset is the NAME of the
  *    last snapshot consumed (names ordered lexicographically). Each
  *    micro-batch reads exactly the files named AFTER the recorded
  *    name, a checkpointed restart resumes from that name, and replays
  *    re-read the same files byte-for-byte (exactly-once at file
  *    granularity). Keying the offset on a name — not a count of the
  *    sorted listing — makes it immune to CONSUMED snapshots being
  *    compacted or archived away: deleting a consumed file cannot shift
  *    which unconsumed files a slice sees.
  *
  * ORDERING CONTRACT: snapshot names must be monotonic under
  * lexicographic order — zero-padded sequence numbers or timestamp
  * names, which is what `data_gather.py`-style pollers produce. A
  * non-padded `poll-10` landing after `poll-9` sorts BEFORE it and
  * would be skipped; that is a poller misconfiguration this source
  * rejects by contract rather than papering over.
  *
  * All listing and reads go through the Hadoop FileSystem API
  * (`Path.getFileSystem`), so the landing zone can be local, HDFS, or
  * an object store — the driver lists with the session's Hadoop conf
  * and serializes that SAME conf into the reader factory, so executors
  * open their split with the credentials/endpoint the listing used
  * (the standard file-source arrangement).
  *
  * Scale notes: `latestOffset` is one directory listing (the poller
  * writes O(1) files per interval, and consumed snapshots may be
  * compacted away — see above); record parsing happens in the
  * partition reader executor-side via Jackson (already on Spark's
  * classpath); nothing is buffered on the driver but the file list of
  * the current batch. A production build would add column pruning in
  * `ScanBuilder` and an HTTP-polling writer on the other side; the
  * read path here is the complete DSv2 surface.
  *
  * Usage: `spark.read.format("graft.sources.feed.FeedSource")
  * .option("path", dir).load()` (same for readStream).
  */
class FeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "vehiclefeed requires option 'path'")
    new FeedTable(path)
  }
}

object FeedTable {
  /** The gather schema (reference data_gather.py's vehicle fields,
    * minus the proprietary ones): poll sequence, vehicle, route,
    * event-time millis, position, speed. */
  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("vehicle_id", LongType, nullable = false),
    StructField("route_id", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("speed", DoubleType, nullable = false)))

  private[feed] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** ATOMICITY CONTRACT: pollers must land snapshots by writing to a
    * temp name and renaming into place (`poll-0007.jsonl.tmp` →
    * `poll-0007.jsonl`, the standard Hadoop discipline — rename is
    * atomic on HDFS and a metadata PUT on object stores). The listing
    * enforces the read side of that contract: in-flight `.tmp` files
    * and hidden `.`/`_` names (Hadoop's own convention for
    * work-in-progress output) are never read, so a partially written
    * snapshot appearing mid-listing cannot produce a torn read. */
  private[feed] def isVisibleSnapshot(name: String): Boolean =
    name.endsWith(".jsonl") && !name.endsWith(".tmp") &&
      !name.startsWith(".") && !name.startsWith("_")

  /** Sorted (name, fully-qualified path) snapshot list via the Hadoop
    * FileSystem API — THE ordering contract: streaming offsets are
    * names in this sequence, so names must be lexicographically
    * monotonic (zero-padded/timestamped poller output). */
  def listSnapshots(path: String): Seq[(String, String)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && isVisibleSnapshot(s.getPath.getName))
      .map(s => (s.getPath.getName, s.getPath.toString))
      .sortBy(_._1)
  }
}

class FeedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"vehiclefeed($path)"
  override def schema(): StructType = FeedTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeedScan(path)
}

class FeedScan(path: String) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = FeedTable.Schema
  override def description(): String = s"vehiclefeed scan of $path"
  override def toBatch: Batch = new FeedBatch(path)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FeedMicroBatchStream(path)
}

/** One input partition per snapshot file. */
case class FeedFilePartition(filePath: String) extends InputPartition

class FeedBatch(path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    FeedTable.listSnapshots(path)
      .map { case (_, p) => FeedFilePartition(p): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    FeedReaderFactory(new SerializableConfiguration(FeedTable.hadoopConf()))
}

/** Streaming offset: the NAME of the last snapshot consumed ("" before
  * any). Serialized as a JSON string so arbitrary name bytes survive
  * the checkpoint round-trip. */
case class FeedOffset(lastName: String) extends Offset {
  override def json(): String = FeedOffset.mapper.writeValueAsString(lastName)
}
object FeedOffset {
  private[feed] val mapper = new ObjectMapper()
}

class FeedMicroBatchStream(path: String) extends MicroBatchStream {
  /** High-water mark of every offset name this instance has seen —
    * from the checkpoint (deserializeOffset) or its own listings.
    * `latestOffset` never returns a name below it, so a transiently
    * incomplete listing (object-store eventual consistency, full
    * compaction followed by a file restore) cannot regress the offset
    * and re-read files the stream already consumed. */
  @volatile private var maxSeenName: String = ""
  private def advance(name: String): String = synchronized {
    if (name > maxSeenName) maxSeenName = name
    maxSeenName
  }

  override def initialOffset(): Offset = FeedOffset("")
  override def latestOffset(): Offset = {
    val names = FeedTable.listSnapshots(path)
    FeedOffset(advance(if (names.isEmpty) "" else names.last._1))
  }
  override def deserializeOffset(json: String): Offset = {
    val name = FeedOffset.mapper.readValue(json, classOf[String])
    advance(name)
    FeedOffset(name)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FeedOffset].lastName,
      end.asInstanceOf[FeedOffset].lastName)
    advance(e)
    FeedTable.listSnapshots(path)
      .filter { case (n, _) => n > s && n <= e }
      .map { case (_, p) => FeedFilePartition(p): InputPartition }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    FeedReaderFactory(new SerializableConfiguration(FeedTable.hadoopConf()))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Ships the DRIVER's Hadoop conf to executors (Spark's own file
  * sources do the same) so a landing zone whose credentials/endpoint
  * live in session conf (`spark.hadoop.fs.s3a.*`) opens executor-side
  * with the settings it was listed with. */
case class FeedReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FeedFileReader(partition.asInstanceOf[FeedFilePartition].filePath, conf.value)
}

/** Executor-side JSONL reader through the Hadoop FileSystem (local,
  * HDFS, or object store — whatever scheme the split path carries):
  * one Jackson parse per line, primitive InternalRows out — no driver
  * involvement past the file path. */
class FeedFileReader(filePath: String, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val p = new Path(filePath)
  private val in = p.getFileSystem(conf).open(p)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && line.trim.isEmpty) line = reader.readLine()
    if (line == null) false
    else {
      val node = mapper.readTree(line)
      current = InternalRow(
        node.get("seq").asLong(), node.get("vehicle_id").asLong(),
        node.get("route_id").asLong(), node.get("ts_ms").asLong(),
        node.get("lat").asDouble(), node.get("lon").asDouble(),
        node.get("speed").asDouble())
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
