package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Analytics, TemporalOps}
import graft.etl.EventsEtl
import graft.ops.Triangles
import graft.text.CorpusOps

/** Interval coalescing, per-key mode, column profiling, triangle
  * counting, PMI collocations, and lexical diversity. */
class ProfileGraphSpec extends SparkSpec {

  test("interval merge islands equal a brute-force interval union per user") {
    val SpanUs = 600L * 1000000L
    val got = TemporalOps.intervalMerge(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("island_id"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
    assert(got.nonEmpty)
    val raw = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((u, starts) <- raw) {
      // brute force: walk sorted starts, split when gap exceeds span
      var islands = List.empty[(Long, Long, Long)] // (start, end, n)
      for (t <- starts) {
        islands match {
          case (s, e, n) :: rest if t <= e => islands = (s, math.max(e, t + SpanUs), n + 1) :: rest
          case _ => islands = (t, t + SpanUs, 1L) :: islands
        }
      }
      val expect = islands.reverse
      val mine = got.filter(_._1 == u).sortBy(_._2)
      assert(mine.length == expect.length, s"user $u island count")
      for (((s, e, n), i) <- expect.zipWithIndex) {
        assert(mine(i)._3 == s && mine(i)._4 == e && mine(i)._5 == n,
          s"user $u island $i: got ${mine(i)} want ($s,$e,$n)")
      }
    }
    // islands must actually merge something or the operator is vacuous
    assert(got.exists(_._5 > 1))
  }

  test("mode per user matches a hand count and ties break lexically") {
    val rows = Analytics.modePerUser(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val byUser = ev.groupBy(_._1)
    for (r <- rows) {
      val u = r.getAs[Long]("user_id")
      val counts = byUser(u).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val best = counts.toSeq.sortBy { case (t, n) => (-n, t) }.head
      assert(r.getAs[String]("mode_type") == best._1, s"user $u mode")
      assert(r.getAs[Long]("n_mode") == best._2)
      assert(r.getAs[Long]("n_events") == counts.values.sum)
      assert(r.getAs[Long]("n_types") == counts.size.toLong)
    }
  }

  test("column profile agrees with direct aggregates") {
    val prof = EventsEtl.profileColumns(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(prof.size == 6)
    val e = graft.sources.Tables.events(spark, sfDir)
    val n = e.count()
    assert(prof.values.forall(_.getAs[Long]("n_rows") == n))
    val nTypes = e.select("event_type").distinct().count()
    assert(prof("event_type").getAs[Long]("n_distinct") == nTypes)
    val idRow = prof("event_id")
    assert(idRow.getAs[Long]("n_null") == e.filter(col("event_id").isNull).count())
    assert(idRow.getAs[Long]("min_val") ==
      e.agg(min("event_id")).head().getLong(0))
    assert(idRow.getAs[Long]("max_val") ==
      e.agg(max("event_id")).head().getLong(0))
  }

  test("triangle count equals the brute-force enumeration") {
    val edges = Triangles.copurchaseEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val eset = edges.toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var brute = 0L
    for ((a, b) <- edges; c <- adj(a) if c > b && eset.contains((b, c))) brute += 1
    val row = Triangles.triangleCount(spark, sfDir).head()
    assert(row.getAs[Long]("n_edges") == edges.length.toLong)
    assert(row.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(row.getAs[Long]("n_triangles") == brute)
    assert(brute > 0, "test graph has no triangles - vacuous")
  }

  test("pmi lift reproduces a hand computation for the top pair") {
    val rows = CorpusOps.pmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute corpus counts by hand off the raw text
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val words = texts.map(_.toLowerCase.replaceAll("[^a-z ]", "")
      .split(" ").filter(_.nonEmpty))
    val uni = words.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = words.map(_.length.toLong).sum
    val biCounts = words.flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (r <- rows.take(5)) {
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val nAb = biCounts((w1, w2))
      assert(r.getAs[Long]("n_ab") == nAb)
      assert(nAb >= 5)
      assert(r.getAs[Long]("lift_ppm") == nAb * nTot * 1000000L / (uni(w1) * uni(w2)))
    }
    // ranking is by descending lift
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("lexical diversity is integer-exact for a hand-checked doc") {
    val rows = CorpusOps.lexicalDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docId = rows.head.getAs[Long]("doc_id")
    val text = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === docId).select("text").head().getString(0)
    val ws = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
    val counts = ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = ws.length.toLong
    val r = rows.head
    assert(r.getAs[Long]("n_words") == n)
    assert(r.getAs[Long]("n_types") == counts.size.toLong)
    assert(r.getAs[Long]("ttr_ppm") == counts.size.toLong * 1000000L / n)
    assert(r.getAs[Long]("simpson_ppm") ==
      counts.values.map(c => c * c).sum * 1000000L / (n * n))
    // a Simpson index must be at least 1/n_types (uniform lower bound)
    assert(rows.forall(r => r.getAs[Long]("simpson_ppm") >=
      1000000L / math.max(1L, r.getAs[Long]("n_types")) / math.max(1L, r.getAs[Long]("n_words")) ))
  }
}
