package graft

import graft.text.CorpusOps
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  test("chunking tiles each document: stride-48 windows, sizes in [1,64], last chunk reaches the end") {
    val chunks = CorpusOps.chunkDocs(spark, sfDir).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val size = r.getAs[Long]("n_chunk_tokens")
      assert(size >= 1 && size <= 64)
    }
    // per doc: chunk indices contiguous from 0, and every non-final
    // chunk is full (64 words) — the final one holds the remainder
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val byIdx = g.sortBy(_.getAs[Long]("chunk_idx"))
      assert(byIdx.map(_.getAs[Long]("chunk_idx")).toSeq == (0L until byIdx.length).toSeq)
      byIdx.init.foreach(r => assert(r.getAs[Long]("n_chunk_tokens") == 64))
    }
  }

  test("two-phase packed prefix sum is exactly the sequential running total") {
    val rows = CorpusOps.seqPack(spark, sfDir)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    var expected = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_before") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: cum_before drifted from the sequential sum")
      expected += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("bins_spanned") >= 1)
      assert(r.getAs[Long]("last_bin") >= r.getAs[Long]("first_bin"))
    }
  }

  test("stratified sample is deterministic and keeps the rarest label whole") {
    val a = CorpusOps.sampleStratified(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"))).toSet
    val b = CorpusOps.sampleStratified(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"))).toSet
    assert(a == b, "sample is not reproducible")
    val counts = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val rarest = counts.minBy(_._2)._1
    val keptRarest = a.count(_._2 == rarest)
    // the rarest label's rate is target/cnt = 1 — every row survives
    assert(keptRarest == counts(rarest), s"rarest label $rarest lost rows")
    assert(a.size < counts.values.sum, "sampling removed nothing")
  }

  test("contamination reports only training docs, flag consistent with counts") {
    val rows = CorpusOps.contamination(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 100 != 0, "held-out doc leaked into the report")
      assert(r.getAs[Boolean]("contaminated") == (r.getAs[Long]("n_shared_shingles") >= 3))
      assert(r.getAs[Long]("n_heldout_docs") >= 1)
    }
  }

  test("term salience: at most 5 ranked terms per doc, scores non-increasing") {
    val rows = CorpusOps.termSalience(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rank"))
      assert(byRank.length <= 5)
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("repetition ratio is 0 for all-distinct windows and grows with duplication") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // probe frame: distinct windows vs a fully-repeating document
    val probe = Seq((1L, "a b c d e f"), (2L, "x y x y x y x y"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        size(expr("word_shingles3(text)")).cast("double").as("nd"),
        (size(split(col("text"), " ")) - 2).cast("double").as("nw"))
      .collect().map(r => r.getLong(0) -> (1.0 - r.getDouble(1) / r.getDouble(2))).toMap
    assert(probe(1L) == 0.0)
    assert(probe(2L) > 0.5) // 6 windows, 2 distinct ('x y x', 'y x y')
    val rows = CorpusOps.repetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_windows"))
    }
  }

  test("oov: rates in [0,1], n_oov bounded by tokens, vocab covers the common mass") {
    val rows = CorpusOps.oovRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      assert(r.getAs[Double]("oov_rate") == oov.toDouble / n)
    }
    // a 1000-word df-ranked vocabulary must cover most token mass
    val totalTok = rows.map(_.getAs[Long]("n_tokens")).sum
    val totalOov = rows.map(_.getAs[Long]("n_oov")).sum
    assert(totalOov.toDouble / totalTok < 0.5, "top-1000 vocab covered <50% of tokens")
  }

  test("incremental dedup: batch verdicts consistent, agrees with the full pair join") {
    import graft.text.TextOps
    val rows = TextOps.dedupIncremental(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 == 7, "non-batch doc in the batch report")
      val isNew = r.getAs[Boolean]("is_new")
      assert(isNew == r.isNullAt(r.fieldIndex("dup_of")))
      assert(isNew == (r.getAs[Long]("n_dup_candidates") == 0L))
    }
    // cross-check against the symmetric full pair join: a batch doc is
    // a dup iff it appears in a (batch, existing) pair at tau=0.5
    val full = TextOps.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dupFromFull = full.flatMap { case (a, b) =>
      Seq(a, b).filter(id => id % 10 == 7)
        .filter(id => Seq(a, b).exists(o => o != id && o % 10 != 7))
    }.toSet
    val dupFromIncr = rows.filter(!_.getAs[Boolean]("is_new"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(dupFromIncr == dupFromFull,
      s"incremental verdicts ${dupFromIncr} != full-join ${dupFromFull}")
  }

  test("bpe pairs: counts carry multiplicity (>= distinct-doc twin) and order is total") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.CorpusOps.bpePairs(spark, sfDir).collect()
    assert(rows.length == 100)
    // descending with lexical tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      val (na, nb) = (a.getAs[Long]("n_occurrences"), b.getAs[Long]("n_occurrences"))
      assert(na > nb || (na == nb && a.getString(0) < b.getString(0)))
    }
    // occurrence mass >= document frequency for any shared bigram
    val docFreq = graft.text.TextOps.ngramFreq(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    rows.foreach { r =>
      docFreq.get(r.getString(0)).foreach(df =>
        assert(r.getAs[Long]("n_occurrences") >= df))
    }
  }

  test("bm25: scores positive, matched docs contain a query term, top-50 ordered") {
    import org.apache.spark.sql.functions._
    val out = graft.text.CorpusOps.bm25(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Double]("bm25") > 0.0)
      assert(r.getAs[Long]("n_terms_matched") >= 1 && r.getAs[Long]("n_terms_matched") <= 3)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("bm25") >= b.getAs[Double]("bm25"))
    }
    // every scored doc really contains at least one query term
    val matched = graft.sources.Tables.documents(spark, sfDir)
      .filter(lower(col("text")).rlike("\\b(scan|merge|window)\\b"))
      .select("doc_id")
    assert(out.join(matched, Seq("doc_id"), "left_anti").count() == 0)
    out.unpersist()
  }

  test("DSIR weights match a first-principles driver recomputation exactly") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "),
          w => w =!= "").as("ws"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1) == "en", r.getSeq[String](2)))
    // add-1 smoothed unigram models, milli-nat quantized per DISTINCT word
    val ct = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cs = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    raw.foreach { case (_, isT, ws) =>
      ws.foreach(w => if (isT) ct(w) += 1 else cs(w) += 1) }
    val vocab = (ct.keySet ++ cs.keySet).toSet
    val (nt, ns, v) = (ct.values.sum, cs.values.sum, vocab.size.toLong)
    val lr = vocab.map { w =>
      val x = (math.log((ct(w) + 1.0) / (nt + v))
        - math.log((cs(w) + 1.0) / (ns + v))) * 1000
      // Spark round() is HALF_UP away from zero — math.round is not
      w -> java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }.toMap
    val want = raw.filter(r => !r._2 && r._3.nonEmpty).map { case (id, _, ws) =>
      id -> ((ws.length.toLong, ws.map(lr).sum))
    }.toMap
    val got = graft.text.CorpusOps.dsirWeights(spark, sfDir).collect()
    assert(got.length == want.size, "one weight row per non-empty source doc")
    got.foreach { r =>
      val (n, s) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("sum_milli") == s,
        s"weight drift on ${r.getAs[Long]("doc_id")}")
      // Spark div truncates toward zero — mirror in the expectation
      assert(r.getAs[Long]("avg_milli") == s / n)
    }
    // target-language docs never receive a weight row
    val tgt = raw.filter(_._2).map(_._1).toSet
    assert(got.forall(r => !tgt.contains(r.getAs[Long]("doc_id"))))
  }

  test("per-label centroid sums cover all 64 positions with the label's full count") {
    val rows = VectorOps.vecCentroid(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labelCounts = graft.sources.Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.get(0)).foreach { case (label, g) =>
      assert(g.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until 64L).toSeq)
      g.foreach(r => assert(r.getAs[Long]("n_vecs") == labelCounts(label)))
    }
  }

  test("weighted priority sample equals the brute-force top-100 exactly, in order") {
    val got = CorpusOps.sampleWeighted(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
        r.getAs[Long]("u"), r.getAs[Long]("priority"))).toSeq
    val m = 1000003L
    val all = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val u = ((id % m) * 2654435761L) % m + 1
        (id, w, u, w * 1000000000L / u)
      }
    val want = all.sortBy { case (id, _, _, p) => (-p, id) }.take(100).toSeq
    assert(got == want, "priority sample diverged from the sequential reference")
  }

  test("BPE learns the paper's merge sequence on the constructed corpus (lexical ties)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq(
      (0L, "low low low low low", "en", "src0", 19L),
      (1L, "lower lower", "en", "src0", 11L),
      (2L, "newest newest newest newest newest newest", "en", "src0", 41L),
      (3L, "widest widest widest", "en", "src0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusOps.bpeEncode(spark, dir).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("freq"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("encoding"))).toSeq
    // hand-derived 8-round merge sequence: es, est, lo, low, ew, ewest,
    // newest, dest (frequency argmax with (a,b)-lexical tie-breaks)
    assert(got == Seq(
      ("newest", 6L, 1L, "newest"),
      ("low", 5L, 1L, "low"),
      ("widest", 3L, 3L, "w i dest"),
      ("lower", 2L, 3L, "low e r")), s"BPE encoding diverged: $got")
  }

  test("BpeApply kernel is row-identical to the nested-fold lambda chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, filter, split, concat_ws}
    // overlap-heavy symbol streams: 'aaa' under (a,a) must collapse
    // left-to-right non-overlapping to [aa, a]; merge ORDER matters
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "d"))
    val words = Seq("aaa", "aaaa", "aab", "aaab", "abcd", "cdcd", "", "x",
      "aabaab", "ccdd", "banana").toDF("word")
      .withColumn("s", filter(split(col("word"), ""), c => c =!= ""))
    val kernel = org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.BpeApply(
        org.apache.spark.sql.GraftPlanBridge.expression(col("s")), merges))
    val bad = words
      .withColumn("k", concat_ws("|", kernel))
      .withColumn("f", concat_ws("|", CorpusOps.bpeFoldMerges(col("s"), merges)))
      .filter(col("k") =!= col("f")).count()
    assert(bad == 0)
  }

  test("BPE bounded-driver learn branch is row-identical to the distributed loop") {
    // vocabCap = 0 forces the distributed argmax rounds; the default
    // takes the collected driver path — same merges, same encodings
    val driver = CorpusOps.bpeEncode(spark, sfDir).collect().toSeq
    val dist = CorpusOps.bpeEncode(spark, sfDir, vocabCap = 0L).collect().toSeq
    assert(driver == dist)
  }

  test("BPE detokenization round-trips: token concat rebuilds every word") {
    val rows = CorpusOps.bpeEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rebuilt = r.getAs[String]("encoding").split(" ").mkString("")
      assert(rebuilt == r.getAs[String]("word"),
        s"detokenize broke: '${r.getAs[String]("word")}' -> '$rebuilt'")
      assert(r.getAs[Long]("n_tokens") >= 1)
    }
    // merges actually fired: frequent words compress below char count
    assert(rows.exists(r =>
      r.getAs[Long]("n_tokens") < r.getAs[String]("word").length))
  }

  test("token budget equals the sequential greedy quality-ordered prefix") {
    import org.apache.spark.sql.functions._
    val scores = graft.text.TextOps.qualityClassifier(spark, sfDir)
      .select("doc_id", "logit_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .toMap
    val cand = scores.keys.toSeq.map(id => (id, scores(id), toks(id)))
      .sortBy(x => (-x._2, x._1))
    val budget = cand.map(_._3).sum / 2
    var cum = 0L
    val exp = cand.zipWithIndex.flatMap { case ((id, s, n), i) =>
      cum += n
      if (cum <= budget) Some((id, s, n, i + 1L, cum)) else None
    }
    // greedy prefix: once over budget, everything below is out too
    val got = graft.text.CorpusOps.tokenBudget(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // the budget genuinely splits the corpus: some kept, some dropped
    assert(exp.nonEmpty && exp.length < cand.length)
  }

  test("heaps curve: cumulative vocabulary equals the sequential first-occurrence walk") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("filter(split(regexp_replace(lower(text), '[^a-z ]', ''), ' '), w -> w != '')"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val n = docs.map(_._1).max + 1
    val firstOcc = scala.collection.mutable.Map[String, Long]()
    for ((id, ws) <- docs.sortBy(_._1); w <- ws)
      if (!firstOcc.contains(w)) firstOcc(w) = id
    val newPerBucket = firstOcc.values.groupBy(_ * 10 / n)
      .view.mapValues(_.size.toLong).toMap
    val docsPerBucket = docs.map(_._1).groupBy(_ * 10 / n)
      .view.mapValues(_.length.toLong).toMap
    var (cd, cv) = (0L, 0L)
    val exp = docsPerBucket.keys.toSeq.sorted.map { b =>
      cd += docsPerBucket(b); cv += newPerBucket.getOrElse(b, 0L)
      (b, docsPerBucket(b), newPerBucket.getOrElse(b, 0L), cd, cv)
    }
    val got = graft.text.CorpusOps.heapsCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // Heaps' law sanity: the curve is concave-ish — the FIRST tenth
    // contributes the largest single new-vocabulary increment
    assert(got.head._3 == got.map(_._3).max)
    assert(got.last._5 == firstOcc.size.toLong)
  }

  test("epoch assignment matches the sequential Bresenham spread and conserves the plan") {
    val budget = 100000L
    val dtok = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        expr("""CAST(size(filter(split(regexp_replace(lower(text), '[^a-z ]', ''), ' '),
          w -> w != '')) AS BIGINT)"""))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val per = dtok.groupBy(_._2).view.mapValues(g => g.map(_._3).sum).toMap
    val wMicro = per.view.mapValues(t => math.floor(math.sqrt(t.toDouble) * 1e6).toLong).toMap
    val totW = wMicro.values.sum
    val eMilli = per.keys.map { s =>
      val target = wMicro(s) * budget / totW
      s -> target * 1000 / per(s)
    }.toMap
    val exp = dtok.groupBy(_._2).toSeq.flatMap { case (s, g) =>
      g.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        val r = i + 1L
        val e = eMilli(s)
        (id, s, r, e * r / 1000 - e * (r - 1) / 1000)
      }
    }.sortBy(_._1)
    val got = graft.text.CorpusOps.epochAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
    // conservation: per-source copies land within one doc of e·n/1000
    got.groupBy(_._2).foreach { case (s, rows) =>
      val n = rows.length.toLong
      assert(rows.map(_._4).sum == eMilli(s) * n / 1000, s"source $s drifted")
    }
    // both regimes occur on this corpus: some doc repeated, some dropped
    assert(got.exists(_._4 == 0L) || got.exists(_._4 > 1L))
  }
}
