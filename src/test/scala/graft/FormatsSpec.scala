package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FormatsSpec extends SparkSpec {

  test("json events: valid rows parse, corrupt rows are quarantined not dropped") {
    val d = Files.createTempDirectory("graft_json")
    Files.writeString(d.resolve("part-0.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":7,"event_type":"click","value":10.5,"props":"{}"}
        |{"event_id":2,"ts":"2024-01-01T00:01:00Z","user_id":8,"event_type":"view","value":3.25,"props":"{}"}
        |this is not json at all
        |""".stripMargin)
    // corrupt-column-only queries require materialized parse results
    val df = Formats.readJsonEvents(spark, d.toString).cache()
    assert(df.filter(col("_corrupt").isNull).count() == 2)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    val ok = df.filter(col("event_id") === 1).collect().head
    assert(ok.getAs[Long]("user_id") == 7L && ok.getAs[Double]("value") == 10.5)
  }

  test("orc round-trip preserves data and pushes filters into the scan") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/events"
    val src = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    graft.sources.Formats.writeOrc(src, out)
    val back = graft.sources.Formats.readOrc(spark, out)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    // predicate pushdown + column pruning reach the ORC reader
    val q = back.filter(col("value") > 400.0).select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,400.0)]"),
      s"ORC pushdown regressed:\n${plan.take(1200)}")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,value:double>"),
      s"ORC column pruning regressed:\n${plan.take(1200)}")
  }

  test("xml events round-trip losslessly with an explicit schema") {
    val out = Files.createTempDirectory("graft_xml").toString + "/events"
    val src = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
      .limit(200)
    Formats.writeXmlEvents(src, out)
    val back = Formats.readXmlEvents(spark, out)
    assert(back.schema == Formats.eventXmlSchema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    // files on disk are really XML with the configured row tag
    val f = new java.io.File(out).listFiles().filter(_.getName.endsWith(".xml"))
    assert(f.nonEmpty)
    val head = scala.io.Source.fromFile(f.head).getLines().take(5).mkString("\n")
    assert(head.contains("<events>") || head.contains("<event>"))
  }

  test("csv key list reads headerless single column") {
    val d = Files.createTempDirectory("graft_csv")
    Files.writeString(d.resolve("keys.csv"), "3001\n3002\n3003\n")
    val keys = Formats.readKeyList(spark, d.toString)
      .collect().map(_.getLong(0)).toSet
    assert(keys == Set(3001L, 3002L, 3003L))
  }

  test("html table parses header + rows into a typed DataFrame") {
    import spark.implicits._
    val html =
      """<html><body><table>
        |<tr><th>Vehicle Number</th><th>Trip ID</th><th>Dwell</th></tr>
        |<tr><td> 3001 </td><td>555</td><td>10</td></tr>
        |<tr><td>3002</td><td><b>556</b></td><td>0</td></tr>
        |<tr><td>bad</td></tr>
        |</table></body></html>""".stripMargin
    val df = Formats.htmlTableToDf(spark, Seq(html).toDS())
    assert(df.columns.toSeq == Seq("vehicle_number", "trip_id", "dwell"))
    val rows = df.orderBy("vehicle_number").collect()
    assert(rows.length == 2) // ragged row dropped
    assert(rows(0).getString(0) == "3001" && rows(0).getString(1) == "555")
    assert(rows(1).getString(1) == "556") // nested tags stripped
  }

  test("binaryFile media ingestion: glob prunes, bytes round-trip, digest matches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val payloadA = Array[Byte](1, 2, 3, 4, 5)
    val payloadB = "media-bytes".getBytes("UTF-8")
    java.nio.file.Files.write(dir.resolve("a.bin"), payloadA)
    java.nio.file.Files.write(dir.resolve("b.bin"), payloadB)
    java.nio.file.Files.write(dir.resolve("ignore.txt"), Array[Byte](9))
    val rows = graft.sources.Formats.readMediaDir(spark, dir.toString)
      .orderBy("file_name").collect()
    // the glob filter pruned the .txt at listing time
    assert(rows.map(_.getAs[String]("file_name")).toSeq == Seq("a.bin", "b.bin"))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(b: Array[Byte]) = { md.reset(); md.digest(b).map("%02x".format(_)).mkString }
    assert(rows(0).getAs[Long]("n_bytes") == 5L)
    assert(rows(0).getAs[Array[Byte]]("media").toSeq == payloadA.toSeq)
    assert(rows(0).getAs[String]("digest") == hex(payloadA))
    assert(rows(1).getAs[String]("digest") == hex(payloadB))
    // the content column feeds the mm operators unchanged: digest-dedup
    // over the ingested frame behaves like mm_dedup
    val dups = graft.sources.Formats.readMediaDir(spark, dir.toString)
      .groupBy("digest").count().collect()
    assert(dups.forall(_.getAs[Long]("count") == 1L))
  }
}
