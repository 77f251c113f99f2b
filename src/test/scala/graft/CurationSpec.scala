package graft

import graft.text.{Curation, TextOps}

/** Keep-best canonical selection, leakage-safe splitting, and
  * deterministic corpus sharding. */
class CurationSpec extends SparkSpec {

  test("keep-best retains exactly one doc per cluster, the longest") {
    val rows = Curation.dedupKeepBest(spark, sfDir).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.nonEmpty)
    for ((_, docs) <- byCluster) {
      val kept = docs.filter(_.getAs[Boolean]("kept"))
      assert(kept.length == 1)
      val maxWords = docs.map(_.getAs[Long]("n_words")).max
      assert(kept.head.getAs[Long]("n_words") == maxWords)
      // ties break to the smallest doc_id among max-length members
      val tieIds = docs.filter(_.getAs[Long]("n_words") == maxWords)
        .map(_.getAs[Long]("doc_id"))
      assert(kept.head.getAs[Long]("doc_id") == tieIds.min)
    }
    // keep-best must differ from min-id canonical somewhere, or the
    // testdata exercises nothing (a truncated copy with a lower id)
    val minId = rows.groupBy(_.getAs[Long]("cluster_id"))
      .map { case (c, ds) => c -> ds.map(_.getAs[Long]("doc_id")).min }
    val diverges = rows.exists { r =>
      r.getAs[Boolean]("kept") &&
        r.getAs[Long]("doc_id") != minId(r.getAs[Long]("cluster_id"))
    }
    assert(diverges, "keep-best never diverged from min-id — vacuous corpus")
  }

  test("no near-dup cluster spans two splits; all three splits populated") {
    val rows = Curation.leakageSafeSplit(spark, sfDir).collect()
    val perCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
      .map { case (_, ds) => ds.map(_.getAs[String]("split")).distinct.length }
    assert(perCluster.forall(_ == 1), "cluster assigned to >1 split: eval leakage")
    // every near-dup pair co-assigned (the contract, stated directly)
    val split = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val labels = TextOps.clusterLabels(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("cluster_id")).values.filter(_.length > 1)
    assert(labels.nonEmpty)
    for (c <- labels; ids = c.map(_.getAs[Long]("doc_id")))
      assert(ids.map(split).distinct.length == 1)
    val shares = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(shares.keySet == Set("train", "val", "test"), s"splits: $shares")
    assert(shares("train") > shares("val") && shares("train") > shares("test"))
  }

  test("dedup eval report: verified methods score perfect precision, caps trade recall") {
    val rows = TextOps.dedupEval(spark, sfDir).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("minhash_lsh_32x4", "jaccard_dfcap_64",
      "jaccard_dfcap_8", "jaccard_prefix", "simhash64_h3", "winnow_k3w4"))
    for ((_, r) <- rows) {
      assert(r.getAs[Long]("n_truth") > 0)
      assert(r.getAs[Long]("precision_ppm") <= 1000000L &&
        r.getAs[Long]("recall_ppm") <= 1000000L)
    }
    // jaccard-verified outputs can never emit a false pair
    for (m <- Seq("minhash_lsh_32x4", "jaccard_dfcap_64", "jaccard_dfcap_8",
        "jaccard_prefix"))
      assert(rows(m).getAs[Long]("precision_ppm") == 1000000L ||
        rows(m).getAs[Long]("n_pairs") == 0, s"$m emitted non-truth pairs")
    // the prefix-filter lemma promises TOTAL recall: 1.0/1.0 exactly
    assert(rows("jaccard_prefix").getAs[Long]("recall_ppm") == 1000000L)
    // a looser df cap keeps at least the pairs of a tighter one
    assert(rows("jaccard_dfcap_64").getAs[Long]("recall_ppm") >=
      rows("jaccard_dfcap_8").getAs[Long]("recall_ppm"))
  }

  test("shards partition the corpus; positions are a contiguous permutation") {
    val rows = Curation.globalShuffleShards(spark, sfDir).collect()
    val total = rows.length
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == total)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet == (0L until Curation.Shards.toLong).toSet)
    for ((_, docs) <- byShard) {
      val pos = docs.map(_.getAs[Long]("pos")).sorted
      assert(pos.toSeq == (1L to docs.length.toLong), "positions not contiguous")
      // within-shard order follows (shard_key, doc_id) — the permutation
      val ordered = docs.sortBy(r => (r.getAs[Long]("shard_key"), r.getAs[Long]("doc_id")))
      assert(ordered.map(_.getAs[Long]("pos")).toSeq == (1L to docs.length.toLong))
    }
  }

  test("curate pipeline: dispositions partition the corpus and stages are consistent") {
    import org.apache.spark.sql.functions._
    val out = Curation.curate(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("lang"),
          r.getAs[String]("text").toLowerCase.replaceAll("[^a-z ]", "")
            .split(" ").count(_.nonEmpty)))).toMap
    // exactly one disposition per doc
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == docs.size)
    assert(out.length == docs.size)
    val statuses = Set("filtered_short", "filtered_lang", "dup_exact", "dup_near", "kept")
    out.foreach { r =>
      val st = r.getAs[String]("status")
      assert(statuses.contains(st))
      val (lang, nWords) = docs(r.getAs[Long]("doc_id"))
      st match {
        case "filtered_short" => assert(nWords < 15)
        case "filtered_lang"  => assert(nWords >= 15 && lang != "en")
        case _ =>
          assert(nWords >= 15 && lang == "en") // survivors passed the gate
      }
      // cluster / split shape
      if (st == "kept") {
        assert(!r.isNullAt(r.fieldIndex("cluster_id")))
        assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
      } else assert(r.isNullAt(r.fieldIndex("split")))
      if (st == "dup_near") assert(!r.isNullAt(r.fieldIndex("cluster_id")))
    }
    // exactly one kept doc per near-dup cluster, and it maximizes
    // (n_words, -doc_id) among the cluster's members
    val clustered = out.filter(r => !r.isNullAt(r.fieldIndex("cluster_id")))
    clustered.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, g) =>
      val kept = g.filter(_.getAs[String]("status") == "kept")
      assert(kept.length == 1)
      val byQuality = g.sortBy(r => (-docs(r.getAs[Long]("doc_id"))._2.toLong,
        r.getAs[Long]("doc_id")))
      assert(byQuality.head.getAs[Long]("doc_id") == kept.head.getAs[Long]("doc_id"))
    }
    // pipeline actually exercises every stage on the test corpus
    val byStatus = out.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    assert(byStatus.getOrElse("kept", 0) > 0)
    assert(byStatus.getOrElse("filtered_lang", 0) > 0)
  }

  test("interleave key reproduces the sequential round-robin order") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sources = docs.map(_._2).distinct.sorted
    val s = sources.length.toLong
    val idx = sources.zipWithIndex.map { case (src, i) => src -> i.toLong }.toMap
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      g.map(_._1).sorted.zipWithIndex.map { case (id, r) =>
        (id, src, r + 1L, idx(src), r.toLong * s + idx(src))
      }
    }.sortBy(_._5)
    val got = Curation.interleave(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    // keys are unique (a total order) and the first |sources| rows
    // cycle through every source once — the round-robin contract
    assert(got.map(_._5).distinct.length == got.length)
    assert(got.take(s.toInt).map(_._2).toSet == sources.toSet)
  }
}
