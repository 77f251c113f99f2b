package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("batched inference output is invariant to batch size and layout") {
    import graft.multimodal.Multimodal
    def rows(bs: Int) = Multimodal.batchInfer(spark, sfDir, bs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // the batching contract: a forward pass must not leak batch
    // context across rows — any batch size yields identical output
    val b1 = rows(1)
    assert(b1.nonEmpty)
    assert(rows(32) == b1 && rows(1000) == b1)
    b1.foreach { case (_, dim, cs) => assert(dim == 16 && cs >= 0) }
  }

  test("media dedup groups identical payloads under the min canonical id") {
    import org.apache.spark.sql.functions._
    val df = graft.multimodal.Multimodal.mediaDedup(spark, sfDir).cache()
    assert(df.count() == graft.sources.Tables.documents(spark, sfDir).count())
    // canonical is never above the member, and canonicals are not dups
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
    assert(df.filter(col("doc_id") === col("canonical_id") && col("is_dup")).count() == 0)
    df.unpersist()
  }

  test("decode stub is deterministic and covers every doc") {
    val a = Multimodal.decodeFeatures(spark, sfDir).collect()
    val b = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(a.length == 500 && a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 256)
      // 8 feature slots of one byte each → slot-sum bounded by 8*255
      assert(r.getAs[Long]("feat_sum_255") >= 0 &&
        r.getAs[Long]("feat_sum_255") <= 8L * 255)
    }
  }

  test("resize plan preserves aspect ratio within rounding") {
    Multimodal.resizePlan(spark, sfDir).collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
      assert(tw <= 224 && th <= 224 && (tw == 224 || th == 224))
      assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.05)
    }
  }

  test("frame sampling: stride 2, capped at 4 frames") {
    val df = Multimodal.sampleFrames(spark, sfDir)
    val perDoc = df.groupBy("doc_id").count().agg(max("count")).head.getLong(0)
    assert(perDoc <= 4)
    df.filter(col("frame_idx") % 2 =!= 0).count() == 0
    assert(df.filter(col("frame_ts_ms") =!= col("frame_idx") * 40).count() == 0)
  }

  test("media metadata digests match sha2 of the payload") {
    val r = Multimodal.mediaMeta(spark, sfDir).filter(col("doc_id") === 0).collect().head
    assert(r.getAs[String]("digest").matches("[0-9a-f]{64}"))
    assert(r.getAs[Long]("batch_id") == 0L)
  }

  test("phash LSH emits exactly the all-pairs Hamming<=3 set") {
    // recompute the stub pHash by hand and brute-force all pairs — the
    // chunk-LSH candidates must lose nothing (pigeonhole recall)
    val mask = (1L << 60) - 1
    def phash(id: Long): Long = {
      var h = (id / 25) * 2654435761L & mask
      for (i <- 1L to 4L if id % 5 >= i) h ^= 1L << ((id * i) % 60).toInt
      h
    }
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val brute = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(phash(ids(i)) ^ phash(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)
    val got = Multimodal.phashPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("hamming")))
    assert(got.toSeq.sorted == brute.toSeq.sorted)
    // the planted flips must produce pairs at several Hamming levels
    assert(got.map(_._3).distinct.length >= 3)
  }

  test("cross-modal retrieval equals the sequential shared-space top-3 per prompt") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def embed(bytes: Array[Byte]): Seq[Long] = {
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
      (0 until 8).map(i => (h1 >> (i * 7)) & 127) ++
        (0 until 8).map(i => (h2 >> (i * 7)) & 127)
    }
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> embed(r.getString(1).getBytes("UTF-8")))
    val want = Seq("transit delay report", "vehicle speed trace", "route schedule table")
      .flatMap { p =>
        val qe = embed(p.getBytes("UTF-8"))
        corpus.map { case (id, e) =>
          (p, id, (0 until 16).map(i => e(i) * qe(i)).sum) }
          .sortBy { case (_, id, s) => (-s, id) }.take(3).zipWithIndex
          .map { case ((q, id, s), i) => (q, i + 1L, id, s) }
      }.sortBy { case (q, r, _, _) => (q, r) }
    val got = Multimodal.crossModalSearch(spark, sfDir).collect()
      .map(r => (r.getAs[String]("query"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
    assert(got == want, "cross-modal top-3 diverged from the sequential reference")
  }

  test("scene changes: detection recovers the planted scene structure") {
    val out = Multimodal.sceneChanges(spark, sfDir).collect()
    // independent driver-side truth from the payload sha256
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val truth = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        md.reset()
        val hex = md.digest(r.getAs[String]("text").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val n = (1 + (h1 >> 16) % 16).toInt
        (0 until n).map(i =>
          ((r.getAs[Long]("doc_id"), i),
            i == 0 || ((h1 >> (i % 60)) & 3) == 0))
      }.toMap
    assert(out.length == truth.size)
    out.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))
      assert(r.getAs[Boolean]("is_cut") == truth(key),
        s"detected cut diverged from planted truth at $key")
      // within a scene, consecutive signatures differ by noise only
      if (!r.getAs[Boolean]("is_cut"))
        assert(r.getAs[Long]("hamming_prev") <= 2)
    }
    // scene ids are dense from 1 per doc
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val scenes = g.map(_.getAs[Long]("scene_id"))
      assert(scenes.min == 1L && scenes.max == g.count(_.getAs[Boolean]("is_cut")))
    }
  }

  test("phash cluster labels equal a union-find over the pair list") {
    val pairs = Multimodal.phashPairs(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = ids.map(i => i -> find(i)).toMap
    val sizes = label.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val exp = ids.sorted.map(i =>
      (i, label(i), sizes(label(i)), i == label(i)))
    val got = Multimodal.dedupCluster(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == exp.toSeq)
    // the stub's 25-groups produce real multi-member clusters
    assert(got.exists(_._3 > 1))
  }
}
