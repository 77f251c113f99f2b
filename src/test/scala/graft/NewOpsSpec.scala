package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.etl.EventsEtl
import graft.text.TextOps

/** Specs for the grouping-set / range-window / interval-join /
  * backfill / vocab / filter operator batch. */
class NewOpsSpec extends SparkSpec {

  test("validation is lossless under NULL fields: every row lands clean OR quarantined") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1704067200000L)
    val df = Seq(
      (1L, Option(ts), Option(7L), Option("click"), Option(10.0)),  // valid
      (2L, Option(ts), None: Option[Long], Option("click"), Option(10.0)), // null user
      (3L, Option(ts), Option(7L), Option("click"), None: Option[Double]), // null value
      (4L, Option(ts), Option(7L), None: Option[String], Option(10.0)),    // null type
      (5L, None: Option[java.sql.Timestamp], Option(7L), Option("click"), Option(10.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val clean = df.filter(EventsEtl.validPred)
    val rejects = df.filter(EventsEtl.invalidPred)
      .withColumn("reason", EventsEtl.reasonCol)
    // three-valued logic must not swallow rows: NULL predicate ==> reject
    assert(clean.count() + rejects.count() == 5)
    val reasons = rejects.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("reason")).toMap
    assert(reasons == Map(2L -> "null_user", 3L -> "null_value",
      4L -> "bad_type", 5L -> "null_ts"))
  }

  test("cube grand total equals the orders count; slices are consistent") {
    val orders = graft.sources.Tables.orders(spark, sfDir).count()
    val rows = Analytics.cubeAgg(spark, sfDir).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand.head.getAs[Long]("n_orders") == orders)
    // detail cells sum back to the grand total
    val detail = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(detail.map(_.getAs[Long]("n_orders")).sum == orders)
  }

  test("moving range-frame window always includes the current row") {
    val df = Analytics.movingAgg(spark, sfDir)
    assert(df.count() == graft.sources.Tables.events(spark, sfDir).count())
    assert(df.filter(col("win_n") < 1).count() == 0)
    // singleton windows carry exactly the row's own value
    val own = df.join(graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), round(col("value") * 100).cast("long").as("vc")), "event_id")
      .filter(col("win_n") === 1 && col("win_cents") =!= col("vc"))
    assert(own.count() == 0)
  }

  test("arg-extremes matches the window formulation exactly") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), round(col("value") * 100).cast("long").as("vc"))
    val byTs = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val byVal = Window.partitionBy("user_id").orderBy(col("vc").desc, col("event_id").desc)
    val expected = ev
      .withColumn("rn_first", row_number().over(byTs))
      .withColumn("rn_last", row_number().over(byTs.orderBy(col("ts_us").desc, col("event_id").desc)))
      .withColumn("rn_peak", row_number().over(byVal))
      .groupBy("user_id")
      .agg(
        max(when(col("rn_first") === 1, col("event_type"))).as("first_type"),
        max(when(col("rn_last") === 1, col("event_type"))).as("last_type"),
        max(when(col("rn_peak") === 1, col("event_id"))).as("peak_event_id"),
        max("vc").as("peak_cents"), count(lit(1)).as("n"))
    val got = Analytics.argExtremes(spark, sfDir)
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0)
  }

  test("histogram bins partition the value domain") {
    val rows = Analytics.histogram(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      graft.sources.Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(r.getAs[Long]("min_cents") >= bin * 2000)
      assert(r.getAs[Long]("max_cents") < (bin + 1) * 2000)
    }
  }

  test("binned interval join equals the naive range join") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), round(col("value") * 100).cast("long").as("vc"))
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts_us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("vc").as("c_cents"))
    val W = 300L * 1000000L
    val naive = errors.join(clicks,
        errors("user_id") === clicks("user_id") &&
          col("c_ts") >= col("ts_us") - W && col("c_ts") <= col("ts_us"), "left")
      .groupBy(errors("event_id"), errors("user_id"), col("ts_us"))
      .agg(count(col("c_ts")).as("n_clicks"),
        coalesce(sum("c_cents"), lit(0L)).as("click_cents"))
    val got = Analytics.rangeJoinBinned(spark, sfDir)
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0)
  }

  test("salted skew join agrees with the plain join") {
    val plain = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("value_cents"))
      .join(graft.sources.Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")), "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("value_cents").as("sum_cents"))
    val got = Analytics.skewJoinAgg(spark, sfDir)
    assert(got.exceptAll(plain).count() == 0 && plain.exceptAll(got).count() == 0)
  }

  test("backfill produces a contiguous hourly spine with no lost events") {
    val df = EventsEtl.backfillGaps(spark, sfDir).cache()
    val W = 3600L * 1000000L
    // contiguity: per user, row count == (max-min)/W + 1
    val bad = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("bucket_us").as("b0"), max("bucket_us").as("b1"))
      .filter(col("n") =!= (col("b1") - col("b0")) / W + 1)
    assert(bad.count() == 0)
    // conservation: bucket totals sum to the raw event count
    assert(df.agg(sum("n_events")).head.getLong(0) ==
      graft.sources.Tables.events(spark, sfDir).count())
    // forward fill: no null filled value anywhere (spine starts at an
    // observed bucket, so a carried value always exists)
    assert(df.filter(col("filled_cents").isNull).count() == 0)
    df.unpersist()
  }

  test("bigram vocab is bounded by doc frequency and capped at 100") {
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    val rows = TextOps.ngramFreq(spark, sfDir).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") >= 1 && r.getAs[Long]("n_docs") <= nDocs))
    // descending doc-frequency order
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("candidate-variant equivalence: every prune variant emits identical verified pairs on random skewed corpora") {
    // the prune bounds claim PROVABLE equivalence (admissible bounds +
    // 0.4999 slack vs the verify's round(·,6) ≥ 0.5) — this pins the
    // claim on seeded random corpora with hot-word skew (caps engage)
    // and varied doc lengths (the length filter engages), not just the
    // fixture corpus
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      val docs = (1L to 50L).map { id =>
        val n = 3 + rnd.nextInt(25)
        val words = Seq.fill(n)(vocab(
          math.min(vocab.size - 1, (math.pow(rnd.nextDouble(), 2) * vocab.size).toInt)))
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      val shingled = TextOps.shingledFrom(docs)
      val hashed = TextOps.hashedFrom(shingled)
      val ex = TextOps.invertedIndex(shingled)
      val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      def pairs(cand: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
        TextOps.verifyJaccard(cand, hashed).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      for (cap <- Seq(2L, 8L, Long.MaxValue)) {
        val off = pairs(TextOps.cappedCandidatesVariant(ex, dfTab, cap, "off"))
        for (m <- Seq("fold", "foldlen"))
          assert(pairs(TextOps.cappedCandidatesVariant(ex, dfTab, cap, m)) == off,
            s"capped variant $m diverged at cap=$cap seed=$seed")
      }
      val poff = pairs(TextOps.prefixCandidatesVariant(ex, dfTab, "off"))
      assert(pairs(TextOps.prefixCandidatesVariant(ex, dfTab, "len")) == poff,
        s"prefix len variant diverged at seed=$seed")
      // and the prefix lemma holds on random corpora too: prefix
      // candidates recover the FULL verified pair set
      assert(poff == pairs(ex.select(col("doc_id").as("a_id"), col("sh"))
          .join(ex.select(col("doc_id").as("b_id"), col("sh")), Seq("sh"))
          .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()),
        s"prefix candidates missed exact pairs at seed=$seed")
    }
  }

  test("df-capped jaccard equals the exact operator uncapped, subsets it capped") {
    val exact = TextOps.dedupNgramJaccard(spark, sfDir)
    val uncapped = TextOps.jaccardPairsCapped(spark, sfDir, Long.MaxValue)
    assert(uncapped.exceptAll(exact).count() == 0 && exact.exceptAll(uncapped).count() == 0)
    val capped = TextOps.jaccardPairsCapped(spark, sfDir, 2L)
    // pruning can only LOSE pairs, never invent them or change values
    assert(capped.exceptAll(exact).count() == 0)
  }

  test("exact duplicates always surface as hamming-0 simhash pairs") {
    // identical text ⇒ identical token stream ⇒ identical signature ⇒
    // all four LSH chunks collide ⇒ the pair MUST be reported with
    // hamming 0 — ties the rows-only simhash operator to the
    // oracle-checked exact dedup
    val exactPairs = TextOps.dedupExact(spark, sfDir)
      .filter(col("is_dup"))
      .select(col("canonical_id").as("a_id"), col("doc_id").as("b_id"))
    val simhashZero = TextOps.dedupSimhash(spark, sfDir)
      .filter(col("hamming") === 0)
      .select("a_id", "b_id")
    val missed = exactPairs.exceptAll(simhashZero)
    assert(missed.count() == 0,
      "exact-dup pair missing from simhash hamming-0 pairs")
  }

  test("connected components collapses a deep chain within the round cap") {
    import spark.implicits._
    // a 200-node chain has diameter 199: plain min-label propagation
    // needs 199 rounds, far past the 20-round cap — only pointer
    // jumping (O(log d) rounds) can label it correctly
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = graft.text.TextOps.connectedComponents(chain)
    assert(labels.count() == 200)
    assert(labels.filter(col("label") =!= 0L).count() == 0,
      "chain not fully collapsed to the component minimum")
  }

  test("guardedComponents: driver union-find and distributed loop emit identical labels") {
    import spark.implicits._
    // multi-component graph with a chain (pointer-jumping territory), a
    // star, duplicate edges (distinct-guard), and reversed-order edges
    val edges = ((0L until 50L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (103L, 100L),
        (200L, 201L), (201L, 200L), (300L, 250L))).toDF("a_id", "b_id")
    val fast = graft.text.TextOps.guardedComponents(edges)
      .toDF("node", "fast_label")
    // edgeCap = 0 forces the distributed min-label fallback
    val slow = graft.text.TextOps.guardedComponents(edges, edgeCap = 0L)
      .toDF("node", "slow_label")
    assert(fast.count() == slow.count())
    val diff = fast.join(slow, "node")
      .filter(col("fast_label") =!= col("slow_label"))
    assert(diff.count() == 0,
      "bounded union-find labels diverge from the distributed loop")
    // both must be component-min: the chain collapses to 0, the star to
    // 100, the reversed pair to 200, the out-of-order edge to 250
    assert(fast.filter(col("node") === 50L).head().getLong(1) == 0L)
    assert(fast.filter(col("node") === 300L).head().getLong(1) == 250L)
  }

  test("guardedPowerIterate: driver loop and distributed loop emit identical ranks") {
    import spark.implicits._
    // symmetric multi-component graph with a hub and a chain — ranks
    // must match BIT-FOR-BIT (identical integer arithmetic)
    val und = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("d", "e"),
      ("x", "y"), ("y", "z")).toDF("lo", "hi")
    val edges = und.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
    val fast = graft.ops.PageRank.guardedPowerIterate(edges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val slow = graft.ops.PageRank.guardedPowerIterate(edges, edgeCap = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fast == slow)
    assert(fast.size == 8)
    // the hub out-ranks its leaves
    assert(fast("a") > fast("b") && fast("a") > fast("c"))
  }

  test("near-dup clustering labels both ends of every pair identically") {
    val clusters = TextOps.dedupCluster(spark, sfDir).cache()
    val labels = clusters.select("doc_id", "cluster_id")
    val pairs = TextOps.dedupNgramJaccard(spark, sfDir).select("a_id", "b_id")
    val mismatched = pairs
      .join(labels.toDF("a_id", "a_cl"), "a_id")
      .join(labels.toDF("b_id", "b_cl"), "b_id")
      .filter(col("a_cl") =!= col("b_cl"))
    assert(mismatched.count() == 0)
    // cluster label is the component minimum: never above the member id
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() == 0)
    // exactly one canonical per cluster
    val perCluster = clusters.groupBy("cluster_id")
      .agg(sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canon"))
    assert(perCluster.filter(col("n_canon") =!= 1L).count() == 0)
    clusters.unpersist()
  }

  test("unpivot emits one long row-set per measure over the full table") {
    val rows = Analytics.unpivotMeasures(spark, sfDir).collect()
    val n = graft.sources.Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[String]("measure")).toSet ==
      Set("quantity", "price_cents", "discount_bps"))
    rows.foreach(r => assert(r.getAs[Long]("n") == n))
  }

  test("windowed distinct counts are bounded by event counts") {
    val rows = Analytics.windowedDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") >= 1 &&
        r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }

  test("two-phase sessionization is row-identical to the single-window form") {
    val plain = Analytics.sessionize(spark, sfDir)
    val scalable = Analytics.sessionizeScalable(spark, sfDir)
    assert(scalable.exceptAll(plain).count() == 0 && plain.exceptAll(scalable).count() == 0)
  }

  test("scd2 intervals tile each key's timeline without overlap") {
    val df = EventsEtl.scd2History(spark, sfDir).cache()
    // exactly one open (current) interval per user
    val open = df.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"))
    assert(open.filter(col("n_open") =!= 1L).count() == 0)
    // each closed interval ends exactly where the next one starts
    val w = Window.partitionBy("user_id").orderBy("version")
    val bad = df.withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
    assert(bad.count() == 0)
    // consecutive versions always change the tracked attribute
    val same = df.withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull && col("prev_type") === col("event_type"))
    assert(same.count() == 0)
    // version totals conserve the event count
    assert(df.agg(sum("n_events")).head.getLong(0) ==
      graft.sources.Tables.events(spark, sfDir).count())
    df.unpersist()
  }

  test("mergeSchema reader null-fills columns missing from older files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)
    val df = graft.sources.Formats.readEvolved(spark, dir)
    assert(df.columns.toSet == Set("id", "v1", "v2"))
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("v2")))
    assert(byId(2L).getDouble(byId(2L).fieldIndex("v2")) == 9.5)
  }

  test("c4 filter covers every document with a consistent keep flag") {
    val df = TextOps.c4Filter(spark, sfDir).cache()
    assert(df.count() == graft.sources.Tables.documents(spark, sfDir).count())
    assert(df.filter(col("keep") =!= (col("reason") === "keep")).count() == 0)
    val reasons = df.select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons.subsetOf(Set("keep", "too_few_words", "no_stopword", "high_symbol")))
    // both kept and dropped docs exist at this corpus shape
    assert(df.filter(col("keep")).count() > 0 && df.filter(!col("keep")).count() > 0)
    df.unpersist()
  }
}
