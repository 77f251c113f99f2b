package graft

import org.apache.spark.sql.functions._
import graft.analytics.MlEval
import graft.text.{TextOps, TextRank}
import graft.vector.VectorOps

/** Specs for the model-eval / monitoring batch: every operator is
  * pinned against an in-memory brute-force twin computed from the same
  * tables — the O(n²)/sequential reference the distributed plan must
  * reproduce bit-for-bit (all outputs are integer-exact by design). */
class MlEvalSpec extends SparkSpec {

  private def scoresAndLabels(): Seq[(Long, Boolean)] = {
    val scores = TextOps.qualityClassifier(spark, sfDir)
      .select("doc_id", "logit_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    scores.toSeq.map { case (id, s) => s -> langs(id) }
  }

  test("q_auc equals the O(n²) pairwise Mann-Whitney AUC") {
    val sl = scoresAndLabels()
    val pos = sl.filter(_._2).map(_._1); val neg = sl.filterNot(_._2).map(_._1)
    var wins = 0L; var ties = 0L
    for (p <- pos; n <- neg) {
      if (p > n) wins += 1 else if (p == n) ties += 1
    }
    val expPpm = (BigInt(2) * wins + ties) * 1000000 /
      (BigInt(2) * pos.size * neg.size)
    val row = MlEval.aucScore(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_pos") == pos.size.toLong)
    assert(row.getAs[Long]("n_neg") == neg.size.toLong)
    assert(row.getAs[Long]("wins") == wins)
    assert(row.getAs[Long]("ties") == ties)
    assert(row.getAs[Long]("auc_ppm") == expPpm.toLong)
    // a score with any signal should beat coin-flip floor sanity
    assert(row.getAs[Long]("auc_ppm") >= 0 && row.getAs[Long]("auc_ppm") <= 1000000)
  }

  test("q_calibration deciles partition the corpus with the closed-form cut") {
    val rows = MlEval.calibration(spark, sfDir).collect()
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    // the explicit formula (i-1)*10 div n + 1 puts either ⌊n/10⌋ or
    // ⌈n/10⌉ rows in every decile
    val lo = total / 10; val hi = lo + (if (total % 10 == 0) 0 else 1)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs")
      assert(nd == lo || nd == hi, s"decile size $nd outside [$lo,$hi]")
      assert(r.getAs[Long]("n_pos") <= nd)
      assert(r.getAs[Long]("pos_ppm") == r.getAs[Long]("n_pos") * 1000000 / nd)
      assert(r.getAs[Long]("min_logit") <= r.getAs[Long]("max_logit"))
    }
    // deciles are ordered by score: min of decile d ≥ max of d-1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("min_logit") >= a.getAs[Long]("max_logit") - 0)
    }
  }

  test("q_drift equals the brute-force TVD over value buckets") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), dayofmonth(col("ts")).as("dom"),
        floor(col("value") / 5).cast("long").as("b")).collect()
    val types = ev.map(_.getString(0)).distinct.sorted
    val exp = types.map { t =>
      val rows = ev.filter(_.getString(0) == t)
      val a = rows.filter(_.getAs[Int]("dom") <= 15).map(_.getAs[Long]("b"))
      val b = rows.filter(_.getAs[Int]("dom") > 15).map(_.getAs[Long]("b"))
      val buckets = (a ++ b).distinct
      val na = a.size.toLong; val nb = b.size.toLong
      val num = buckets.map { k =>
        (BigInt(a.count(_ == k)) * nb - BigInt(b.count(_ == k)) * na).abs
      }.sum
      (t, na, nb, buckets.size.toLong, (num * 1000000 / (BigInt(2) * na * nb)).toLong)
    }
    val got = MlEval.drift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("vec_knn_classify equals brute-force exact kNN + majority vote") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .filter { case (_, e, _) => math.sqrt(e.map(x => x.toDouble * x).sum) > 0 }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val train = vecs.filter(_._1 % 5 != 0); val test = vecs.filter(_._1 % 5 == 0)
    val exp = test.sortBy(_._1).map { case (qid, qe, ql) =>
      val top = train.map { case (cid, ce, cl) => (cos(qe, ce), cid, cl) }
        .sortBy { case (c, cid, _) => (-c, cid) }.take(5)
      val votes = top.groupBy(_._3).toSeq.map { case (l, g) => (g.size, l) }
      val (v, pred) = votes.sortBy { case (n, l) => (-n, l) }.head
      (qid, ql, pred, v.toLong, pred == ql)
    }
    val got = VectorOps.knnClassify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("vec_outliers equals brute-force centroid distances") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def micro(e: Array[Float]): Array[Long] =
      e.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val byLabel = vecs.groupBy(_._3)
    val exp = byLabel.toSeq.sortBy(_._1).flatMap { case (l, g) =>
      val ms = g.map { case (id, e, _) => (id, micro(e)) }
      val dim = ms.head._2.length
      val cent = (0 until dim).map { p =>
        // non-negative-shifted floor division, matching the operator
        (ms.map(_._2(p)).sum + ms.size * 10000000L) / ms.size - 10000000L
      }
      val d2 = ms.map { case (id, m) =>
        (id, (0 until dim).map { p => val d = m(p) - cent(p); d * d }.sum)
      }
      d2.sortBy { case (id, d) => (-d, id) }.take(5).zipWithIndex
        .map { case ((id, d), i) => (l, (i + 1).toLong, id, d) }
    }
    val got = VectorOps.vecOutliers(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
  }

  test("text_readability equals the sequential FK computation") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.sortBy(_._1).flatMap { case (id, text) =>
      val words = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      if (words.isEmpty) None else {
        val sents = math.max("[.!?]+".r.findAllIn(text).size, 1).toLong
        val syl = words.map(w => math.max("[aeiouy]+".r.findAllIn(w).size, 1).toLong).sum
        val nw = words.length.toLong
        val fk = (39 * nw * nw + 1180 * syl * sents) / (sents * nw) - 1559
        Some((id, sents, nw, syl, fk))
      }
    }
    val got = TextOps.readability(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("dedup_sweep equals brute-force pair counts and is monotone") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val shingles = docs.map { case (id, t) =>
      val ws = t.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val ppms = for {
      i <- shingles.indices; j <- (i + 1) until shingles.length
      inter = (shingles(i)._2 & shingles(j)._2).size if inter > 0
    } yield inter.toLong * 1000000L / (shingles(i)._2.size + shingles(j)._2.size - inter)
    val exp = (3L to 9L).map(k => (k * 100000L, ppms.count(_ >= k * 100000L).toLong))
    val got = graft.text.TextOps.dedupSweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == exp)
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse,
      "pair counts must be non-increasing in the threshold")
  }

  test("text_filter_cascade equals the sequential rule evaluation") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def md5bucket(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val exp = docs.sortBy(_._1).map { case (id, t) =>
      val ws = t.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      val nw = ws.length.toLong
      val chars = ws.map(_.length.toLong).sum
      val mwl: Option[Long] = if (nw == 0) None else Some(100 * chars / nw)
      val stop = ws.count(w => w == "the" || w == "a").toLong
      val logit: Option[Long] = if (nw == 0) None
        else Some(ws.map(w => (md5bucket(w) * 2654435761L) % 2001L - 1000L).sum)
      val fail: Option[String] =
        if (nw < 10 || nw > 5000) Some("word_count")
        else if (mwl.exists(m => m < 200 || m > 1200)) Some("word_length")
        else if (stop < 1) Some("stopword")
        else if (logit.forall(_ <= -500)) Some("classifier")
        else None
      (id, nw, mwl, stop, logit, fail, fail.isEmpty)
    }
    val got = graft.text.TextOps.filterCascade(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        Option(r.getAs[String]("first_fail")), r.getBoolean(6)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_spatial_join equals the O(n²) brute-force distance join") {
    val pts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), round(col("value") * 100).cast("long").as("xc"),
        (get_json_object(col("props"), "$.k").cast("long") * 100).as("yc"))
      .filter(col("yc").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val R2 = 200L * 200L
    val exp = pts.sortBy(_._1).map { case (id, x, y) =>
      val ds = pts.filter(_._1 != id)
        .map { case (_, bx, by) => (x - bx) * (x - bx) + (y - by) * (y - by) }
        .filter(_ <= R2)
      (id, ds.length.toLong, if (ds.isEmpty) None else Some(ds.min))
    }
    val got = graft.ops.SpatialJoin.spatialNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == exp.toSeq)
    // the grid actually found neighbors (non-degenerate input)
    assert(got.exists(_._2 > 0))
  }

  private def idScoresLabels(): Seq[(Long, Long, Boolean)] = {
    val scores = TextOps.qualityClassifier(spark, sfDir)
      .select("doc_id", "logit_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    scores.toSeq.map { case (id, s) => (id, s, langs(id)) }
  }

  test("q_pr_auc equals the sequential average-precision sum") {
    val rows = idScoresLabels().sortBy { case (id, s, _) => (-s, id) }
    var cum = 0L; var sp = BigInt(0); var np = 0L
    rows.zipWithIndex.foreach { case ((_, _, pos), i0) =>
      val rank = i0 + 1L
      if (pos) { cum += 1; np += 1; sp += BigInt(cum) * 1000000 / rank }
    }
    val r = MlEval.prAuc(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") == rows.size.toLong)
    assert(r.getAs[Long]("n_pos") == np)
    assert(r.getAs[Long]("ap_ppm") == (sp / np).toLong)
    // AP of a scored ranking lives in (prevalence·floor, 1e6]
    assert(r.getAs[Long]("ap_ppm") > 0 && r.getAs[Long]("ap_ppm") <= 1000000)
  }

  test("q_ks_stat equals the sequential max CDF gap with min-score ties") {
    val sl = idScoresLabels()
    val np = sl.count(_._3).toLong; val nn = sl.size - np
    val byS = sl.groupBy(_._2).toSeq.sortBy(_._1)
    var cp = 0L; var cn = 0L
    var best = BigInt(-1); var bestS = 0L
    byS.foreach { case (s, g) =>
      cp += g.count(_._3); cn += g.count(x => !x._3)
      val d = (BigInt(cp) * nn - BigInt(cn) * np).abs
      if (d > best) { best = d; bestS = s }
    }
    val r = MlEval.ksStat(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_pos") == np && r.getAs[Long]("n_neg") == nn)
    assert(r.getAs[Long]("ks_ppm") == (best * 1000000 / (BigInt(np) * nn)).toLong)
    assert(r.getAs[Long]("at_logit") == bestS)
  }

  test("q_gains deciles accumulate to the corpus and match brute force") {
    val rows = idScoresLabels().sortBy { case (id, s, _) => (-s, id) }
    val n = rows.size.toLong
    val totPos = rows.count(_._3).toLong
    val byDec = rows.zipWithIndex.groupBy { case (_, i0) => i0.toLong * 10 / n + 1 }
    var cumPos = 0L; var cumDocs = 0L
    val exp = byDec.toSeq.sortBy(_._1).map { case (d, g) =>
      val ndocs = g.size.toLong; val npos = g.count(_._1._3).toLong
      cumPos += npos; cumDocs += ndocs
      (d, ndocs, npos, cumPos,
        (BigInt(cumPos) * 1000000 / totPos).toLong,
        (BigInt(cumPos) * n * 1000000 / (BigInt(cumDocs) * totPos)).toLong)
    }
    val got = MlEval.gains(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    // the last decile closes the books exactly
    assert(got.last._5 == 1000000L && got.last._6 == 1000000L)
    assert(got.map(_._1).toSeq == (1L to 10L))
  }

  test("q_confusion equals the sequential counts at the keep threshold") {
    val sl = idScoresLabels()
    val tp = sl.count(x => x._3 && x._2 > 0).toLong
    val fp = sl.count(x => !x._3 && x._2 > 0).toLong
    val fn = sl.count(x => x._3 && x._2 <= 0).toLong
    val tn = sl.count(x => !x._3 && x._2 <= 0).toLong
    val r = MlEval.confusion(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((tp, fp, fn, tn)))
    assert(r.getAs[Long]("precision_ppm") == tp * 1000000 / (tp + fp))
    assert(r.getAs[Long]("recall_ppm") == tp * 1000000 / (tp + fn))
    assert(r.getAs[Long]("f1_ppm") == 2 * tp * 1000000 / (2 * tp + fp + fn))
    assert(r.getAs[Long]("accuracy_ppm") == (tp + tn) * 1000000 / sl.size)
  }

  test("q_link_predict equals brute-force wedge scoring on the repeat graph") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Int]()
    li.groupBy(_._1).foreach { case (_, g) =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val scores = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    adj.foreach { case (_, nbrs) =>
      val d = nbrs.size
      if (d >= 2 && d <= 64) {
        val ns = nbrs.toSeq.sorted
        for (i <- ns.indices; j <- (i + 1) until ns.length) {
          val key = (ns(i), ns(j))
          val (cn, ra) = scores.getOrElse(key, (0L, 0L))
          scores(key) = (cn + 1, ra + 1000000L / d)
        }
      }
    }
    val exp = scores.toSeq.filterNot { case (k, _) => edges(k) }
      .map { case ((u, v), (cn, ra)) => (u, v, cn, ra) }
      .sortBy { case (u, v, cn, ra) => (-ra, -cn, u, v) }.take(50)
    val got = graft.ops.LinkPredict.linkPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // predicted edges must not already exist
    assert(got.forall { case (u, v, _, _) => !edges((u, v)) })
  }

  test("vec_cluster_eval equals brute-force cohesion/separation") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def micro(e: Array[Float]): Array[Long] =
      e.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val byLabel = vecs.groupBy(_._3)
    val cents = byLabel.map { case (l, g) =>
      val ms = g.map(v => micro(v._2))
      val dim = ms.head.length
      l -> (0 until dim).map { p =>
        (ms.map(_(p)).sum + ms.size * 10000000L) / ms.size - 10000000L
      }.toArray
    }
    val exp = byLabel.toSeq.sortBy(_._1).map { case (l, g) =>
      val c = cents(l)
      val d2s = g.map { v =>
        val m = micro(v._2)
        c.indices.map { p => val d = m(p) - c(p); BigInt(d) * d }.sum
      }
      val meanD2 = (d2s.sum / g.size).toLong
      val (sepD2, nl) = cents.filter(_._1 != l).toSeq.map { case (ol, oc) =>
        (c.indices.map { p => val d = c(p) - oc(p); d * d }.sum, ol)
      }.minBy { case (dd, ol) => (dd, ol) }
      (l, g.size.toLong, meanD2, nl, sepD2,
        (BigInt(meanD2) * 1000000 / sepD2).toLong)
    }
    val got = VectorOps.clusterEval(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
  }

  test("text_textrank equals the sequential integer power iteration") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val edges = scala.collection.mutable.Set[(String, String)]()
    docs.foreach { t =>
      val ws = t.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      ws.sliding(2).foreach {
        case Array(a, b) if a != b => edges += ((a, b)); edges += ((b, a))
        case _ =>
      }
    }
    val adj = edges.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val n = adj.size
    val M = 1000000000000L; val tele = (M * 15 / 100) / n
    var rank = adj.keys.map(_ -> M / n).toMap
    for (_ <- 1 to 10) {
      val nxt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((a, nbrs) <- adj) {
        val c = (rank(a) * 85) / (100 * nbrs.size)
        nbrs.foreach(b => nxt(b) += c)
      }
      rank = nxt.map { case (k, v) => k -> (v + tele) }.toMap
    }
    val exp = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(30)
    val got = TextRank.keywords(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exp)
  }

  test("q_f1_sweep equals the sequential sweep at every distinct score") {
    val sl = scoresAndLabels()
    val totPos = sl.count(_._2).toLong
    val totNeg = sl.size.toLong - totPos
    val thresholds = sl.map(_._1).distinct.sorted
    def ppm(n: Long, d: Long): Long = if (d == 0) -1L else n * 1000000L / d
    val base = thresholds.map { t =>
      val tp = sl.count(x => x._2 && x._1 >= t).toLong
      val fp = sl.count(x => !x._2 && x._1 >= t).toLong
      val fn = totPos - tp
      (t, tp, fp, fn, ppm(tp, tp + fp), ppm(tp, totPos),
        ppm(2 * tp, 2 * tp + fp + fn))
    }
    val bestF1 = base.map(_._7).max
    val exp = base.map(x => (x._1, x._2, x._3, x._4, x._5, x._6, x._7, x._7 == bestF1))
    val got = MlEval.f1Sweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6), r.getBoolean(7)))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty && exp.exists(_._8))
    // recall is monotone nonincreasing in the threshold
    val recalls = got.map(_._6).toSeq
    assert(recalls == recalls.sorted.reverse)
    // the lowest threshold keeps everything: recall = 1
    assert(got.head._6 == 1000000L)
  }

  test("vec_drift equals the sequential per-label parity-snapshot centroids") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    def centroid(vs: Seq[Seq[Long]]): Seq[Long] = {
      val n = vs.size.toLong
      vs.transpose.map { col =>
        val s = col.sum
        (s + n * 10000000L) / n - 10000000L
      }
    }
    val exp = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (lbl, g) =>
      val a = g.filter(_._1 % 2 == 0).map(_._3)
      val b = g.filter(_._1 % 2 != 0).map(_._3)
      val drift = if (a.isEmpty || b.isEmpty) None
        else Some(centroid(a).zip(centroid(b)).map { case (x, y) => (x - y) * (x - y) }.sum)
      (lbl, a.size.toLong, b.size.toLong, drift)
    }
    val got = graft.vector.VectorOps.vecDrift(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == exp)
    assert(exp.nonEmpty && exp.exists(_._4.exists(_ > 0)))
  }

  test("q_dbscan equals sequential DBSCAN with min-label clusters and min-core border rule") {
    import org.apache.spark.sql.functions._
    val R = 200L
    val pts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("xc"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) * 100").as("yc"))
      .filter(col("yc").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = pts.map(p => p._1 -> (p._2, p._3)).toMap
    val ids = pts.map(_._1)
    // brute-force R-ball adjacency
    val nbrs = ids.map { a =>
      val (ax, ay) = byId(a)
      a -> ids.filter { b =>
        b != a && {
          val (bx, by) = byId(b)
          (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= R * R
        }
      }.toSet
    }.toMap
    val core = ids.filter(a => nbrs(a).size >= 4).toSet
    // union-find over core-core edges, min-label canonicalization
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> find(c)).toMap
    val exp = ids.sorted.map { id =>
      if (core(id)) (id, "core", Some(label(id)))
      else {
        val coreNbrs = nbrs(id).filter(core)
        if (coreNbrs.nonEmpty) (id, "border", Some(coreNbrs.map(label).min))
        else (id, "noise", None)
      }
    }.toSeq
    // explicit R=200: at sf0.001 density THIS radius gives a
    // non-vacuous core/border/noise mix (the entry's R=60 matches the
    // 100×-denser bench SF instead)
    val got = graft.ops.SpatialJoin.dbscan(spark, sfDir, rCents = 200L).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == exp)
    // all three kinds occur at this density, and some cluster is >1 core
    assert(Set("core", "border", "noise").subsetOf(exp.map(_._2).toSet))
    assert(label.values.groupBy(identity).exists(_._2.size > 1))
  }

  test("q_dbscan_auto derives R by the occupancy fixed-point policy and matches fixed-R dbscan at that R") {
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("xc"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) * 100").as("yc"))
      .filter(col("yc").isNotNull)
    // sequential replication of the derivation: bbox seed + two
    // second-moment fixed-point refinements, all integer arithmetic
    val rows = pts.collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = rows.length.toLong
    def isqrt(q: Long): Long = {
      var t = math.floor(math.sqrt(q.toDouble)).toLong
      if ((t + 1) * (t + 1) <= q) t += 1 else if (t * t > q) t -= 1
      math.max(1L, t)
    }
    val tau = 2L
    val area = (rows.map(_._1).max - rows.map(_._1).min) *
      (rows.map(_._2).max - rows.map(_._2).min)
    var r = isqrt(math.max(1L, tau * area / n))
    for (_ <- 0 until 2) {
      val s2 = rows.groupBy { case (x, y) => (x / r, y / r) }
        .values.map(g => g.size.toLong * g.size).sum
      r = isqrt(math.max(1L, tau * n * r * r / s2))
    }
    assert(graft.ops.SpatialJoin.autoR(pts, targetOcc = tau) == r)
    // the auto entry IS fixed-R dbscan at the derived radius, plus the
    // r_cents stamp — so the whole clustering path needs no re-proof
    val auto = graft.ops.SpatialJoin.dbscanAuto(spark, sfDir, targetOcc = tau).collect()
    assert(auto.forall(_.getLong(3) == r))
    val fixed = graft.ops.SpatialJoin.dbscan(spark, sfDir, rCents = r).collect()
    assert(auto.map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSeq ==
      fixed.map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSeq)
    // non-vacuous at the derived density: cores exist
    assert(auto.exists(_.getString(1) == "core"))
  }

  test("q_spatial_auto is the fixed-R neighbor report at the derived radius, r_cents stamped") {
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("xc"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) * 100").as("yc"))
      .filter(col("yc").isNotNull)
    val r = graft.ops.SpatialJoin.autoR(pts, targetOcc = 2L)
    def key(x: org.apache.spark.sql.Row) = (x.getLong(0), x.getLong(1),
      if (x.isNullAt(2)) None else Some(x.getLong(2)))
    // the auto entry IS the fixed-R report at the derived radius plus
    // the r_cents stamp — the derivation is the only new surface (and
    // its arithmetic is already pinned by the dbscan_auto spec above)
    val auto = graft.ops.SpatialJoin.spatialNeighborsAuto(spark, sfDir).collect()
    assert(auto.nonEmpty && auto.forall(_.getLong(3) == r))
    val fixed = graft.ops.SpatialJoin
      .spatialNeighbors(spark, sfDir, rCents = r).collect()
    assert(auto.map(key).toSeq == fixed.map(key).toSeq)
    // non-vacuous: the occupancy policy yields real neighbors
    assert(auto.exists(_.getLong(1) > 0))
  }
}
