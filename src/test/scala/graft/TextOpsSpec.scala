package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("minhash LSH recovers the exact-jaccard pairs at tau=0.5") {
    val exact = TextOps.dedupNgramJaccard(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = TextOps.dedupMinhash(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes minhash precise; 128 perms ⇒ near-total recall
    assert(mh.subsetOf(exact))
    assert(mh.size >= (exact.size * 0.8).toInt)
  }

  test("arith minhash twin: formula vector, subset-of-exact, pipeline determinism") {
    import graft.functions.MinHashAffine128
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // hand vector: one input value x — slot j must be ((2j+3)x + j²+7) mod p
    val x = 123456789L
    val sig = MinHashAffine128.compute(new GenericArrayData(Array[Any](x)))
    (0 until 128).foreach { j =>
      assert(sig.getLong(j) == ((2L * j + 3) * x + j.toLong * j + 7) % 2147483647L)
    }
    // pipeline: verified pairs are a subset of exact jaccard>=0.5 truth
    // (verify stage is exact, so the twin can only lose recall, never precision)
    val exact = TextOps.dedupNgramJaccard(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tw = TextOps.dedupMinhashArith(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tw.subsetOf(exact))
    assert(tw.size >= (exact.size * 0.8).toInt) // 128 perms ⇒ near-total recall
  }

  test("arith simhash twin: structural-zero bits, hamming contract, exact-dup floor") {
    import graft.functions.SimHashRoll64
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // bits 31 and 63 of the packed rolling hash are structurally zero,
    // so no signature may ever set them
    val sig = SimHashRoll64.compute(new GenericArrayData(
      Array[Any](UTF8String.fromString("alpha"), UTF8String.fromString("beta"))))
    assert((sig & (1L << 31)) == 0L && (sig & (1L << 63)) == 0L)
    // single token: signature IS the token's rolling hash (every set
    // bit votes +1, every clear bit votes -1 → sign copies the bit)
    val one = SimHashRoll64.compute(new GenericArrayData(Array[Any](UTF8String.fromString("alpha"))))
    assert(one == graft.functions.WordShingles.rollingHash(UTF8String.fromString("alpha")))
    // pipeline: emitted pairs respect hamming<=3 and identical docs pair at 0
    val rows = TextOps.dedupSimhashArith(spark, sfDir).collect()
    assert(rows.forall(_.getLong(2) <= 3))
    assert(rows.nonEmpty)
  }

  test("prefix-filter join equals the full inverted-index join exactly") {
    // the prefix-filter lemma promises TOTAL recall at t=0.5 (any pair
    // with J >= 0.5 shares a token among each side's floor(n/2)+1
    // rarest) — so unlike the df-capped variant this must be EQUAL to
    // the ground truth, values included, not a subset
    val exact = TextOps.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = TextOps.jaccardPairsPrefix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == exact)
    assert(exact.nonEmpty)
  }

  test("simhash pairs respect the hamming<=3 contract") {
    val rows = TextOps.dedupSimhash(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
    assert(rows.nonEmpty)
  }

  test("simhash chunk-LSH is exactly the hamming<=3 pair set (recall + precision)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // constructed signatures exercising every contract edge:
    //  1 vs 2: hamming 3, all flips inside chunk 0 — candidate via chunks 1-3
    //  1 vs 3: hamming 3 spread over chunks 0,1,2 — candidate via chunk 3 only
    //  1 vs 4: hamming 4 spread over ALL four chunks — shares NO chunk,
    //          invisible to the LSH; under the old <=6 filter this pair's
    //          emission depended on chunk layout, which is not a contract
    //  1 vs 5: hamming 4 clustered in chunk 0 — IS a bucket candidate but
    //          must be filtered (precision side of the <=3 contract)
    val sigs = Seq(
      1L -> 0L,
      2L -> 7L,                                        // bits 0,1,2
      3L -> ((1L << 0) | (1L << 16) | (1L << 32)),     // one flip per chunk 0,1,2
      4L -> ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)),
      5L -> 15L                                        // bits 0..3
    ).toDF("doc_id", "simhash")
    val got = graft.text.TextOps.simhashPairsFromSigs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force truth: every pair at hamming <= 3
    val raw = Seq(1L -> 0L, 2L -> 7L, 3L -> ((1L << 0) | (1L << 16) | (1L << 32)),
      4L -> ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)), 5L -> 15L)
    val want = (for {
      (ai, a) <- raw; (bi, b) <- raw if ai < bi
      h = java.lang.Long.bitCount(a ^ b) if h <= 3
    } yield (ai, bi, h.toLong)).toSet
    assert(got == want, s"got $got, want $want")
    assert(want.contains((1L, 2L, 3L)) && want.contains((1L, 3L, 3L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L)) // no chunk shared
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L)) // candidate, filtered
  }

  test("simhash128 word 0 is bit-identical to simhash64") {
    graft.functions.GraftFunctions.register(spark)
    val drift = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("simhash64(word_tokens(text))").as("s64"),
        element_at(expr("simhash128(word_tokens(text))"), 1).as("w0"))
      .filter(col("s64") =!= col("w0")).count()
    assert(drift == 0, "128-bit signature word 0 drifted from simhash64")
  }

  test("simhash128 chunk-LSH is exactly the hamming<=3 pair set on constructed sigs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // contract edges over the 4×32-bit chunk layout (chunks: s0 lo/hi,
    // s1 lo/hi): hamming-3 spread over three chunks (candidate only via
    // the 4th), hamming-4 spread over all four (invisible — correctly
    // absent), hamming-4 clustered (candidate but filtered)
    val raw = Seq(
      (1L, 0L, 0L),
      (2L, 7L, 0L),                              // h3, all in s0-lo
      (3L, (1L | (1L << 32)), 1L),               // h3: s0-lo, s0-hi, s1-lo
      (4L, (1L | (1L << 32)), (1L | (1L << 32))),// h4, one per chunk
      (5L, 15L, 0L))                             // h4, clustered in s0-lo
    val got = graft.text.TextOps.simhash128PairsFromSigs(
        raw.toDF("doc_id", "s0", "s1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ai, a0, a1) <- raw; (bi, b0, b1) <- raw if ai < bi
      h = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if h <= 3
    } yield (ai, bi, h.toLong)).toSet
    assert(got == want, s"got $got, want $want")
    assert(want.contains((1L, 3L, 3L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L))
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L))
  }

  test("exact duplicates surface as hamming-0 pairs in the 128-bit operator") {
    val exactPairs = TextOps.dedupExact(spark, sfDir)
      .filter(col("is_dup"))
      .select(col("canonical_id").as("a_id"), col("doc_id").as("b_id"))
    val zero = TextOps.dedupSimhash128(spark, sfDir)
      .filter(col("hamming") === 0).select("a_id", "b_id")
    assert(exactPairs.exceptAll(zero).count() == 0,
      "exact-dup pair missing from simhash128 hamming-0 pairs")
  }

  test("capped minhash: cap=inf equals the LSH operator, capped is a subset") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val full = TextOps.dedupMinhash(spark, sfDir).collect().map(key).toSet
    val uncapped = TextOps.minhashPairsCapped(spark, sfDir, Long.MaxValue)
      .collect().map(key).toSet
    assert(uncapped == full)
    val capped = TextOps.minhashPairsCapped(spark, sfDir, 3L).collect().map(key).toSet
    assert(capped.subsetOf(full))
  }

  test("capped tfidf: cap=inf equals the exact pair join, capped is a value-exact subset") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val exact = TextOps.tfidfPairs(spark, sfDir).collect().map(key).toSet
    val uncapped = TextOps.tfidfPairsCapped(spark, sfDir, Long.MaxValue)
      .collect().map(key).toSet
    assert(uncapped == exact)
    assert(exact.nonEmpty)
    // capped pairs: a subset INCLUDING values — the re-verify computes
    // dots over full vectors, so surviving pairs carry the exact cosine
    val capped = TextOps.tfidfPairsCapped(spark, sfDir, 8L).collect().map(key).toSet
    assert(capped.subsetOf(exact))
  }

  test("capped containment: cap=inf equals the exact join, capped is a value-exact subset") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val exact = TextOps.containmentPairs(spark, sfDir).collect().map(key).toSet
    val uncapped = TextOps.containmentPairsCapped(spark, sfDir, Long.MaxValue)
      .collect().map(key).toSet
    assert(uncapped == exact)
    assert(exact.nonEmpty)
    val capped = TextOps.containmentPairsCapped(spark, sfDir, 8L).collect().map(key).toSet
    assert(capped.subsetOf(exact))
  }

  test("capped simhash: cap=inf equals the exact operator, capped is a subset") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = TextOps.dedupSimhash(spark, sfDir).collect().map(key).toSet
    val uncapped = TextOps.simhashPairsCapped(spark, sfDir, Long.MaxValue)
      .collect().map(key).toSet
    assert(uncapped == exact)
    val capped = TextOps.simhashPairsCapped(spark, sfDir, 4L).collect().map(key).toSet
    assert(capped.subsetOf(exact))
  }

  test("exact dedup canonical ids are minimal in group") {
    val df = TextOps.dedupExact(spark, sfDir)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
  }

  test("fused text_profile is field-identical to the 4-regex column formulation") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def legacyCols(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "),
        w => w =!= "")).cast("long").as("n_words"),
      (length(col("text")) -
        length(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))).cast("long").as("n_punct"),
      ((length(lower(col("text"))) - length(expr("replace(lower(text), ' the ', '')")))
        / lit(5)).cast("long").as("n_stop"))
    def fusedCols(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      expr("text_profile(text)").as("p"))
      .select(col("doc_id"), col("p.n_chars").as("n_chars"), col("p.n_words").as("n_words"),
        col("p.n_punct").as("n_punct"), col("p.n_stop").as("n_stop"))
    // corpus-wide equivalence
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    assert(legacyCols(corpus).exceptAll(fusedCols(corpus)).count() == 0)
    assert(fusedCols(corpus).exceptAll(legacyCols(corpus)).count() == 0)
    // constructed edges: dash-joined words, overlapping stopwords,
    // digits-only segments, unicode, empty-ish strings
    val edge = Seq((1L, "a-b c"), (2L, " the the "), (3L, "123 456 a1b"),
      (4L, "汉字 the mix!"), (5L, " "), (6L, "THE THE the x")).toDF("doc_id", "text")
    assert(legacyCols(edge).exceptAll(fusedCols(edge)).count() == 0)
    assert(fusedCols(edge).exceptAll(legacyCols(edge)).count() == 0)
  }

  test("fused token_profile is field-identical to the regex column formulation") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def legacy(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("n_ws"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_re"))
    def fused(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), expr("token_profile(text)").as("p"))
      .select(col("doc_id"), col("p.n_chars").as("n_chars"),
        col("p.n_ws_tokens").as("n_ws"), col("p.n_re_tokens").as("n_re"))
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    assert(legacy(corpus).exceptAll(fused(corpus)).count() == 0)
    assert(fused(corpus).exceptAll(legacy(corpus)).count() == 0)
    val edge = Seq((1L, "a-b  c"), (2L, "ab12cd 34"), (3L, "x\ty z"),
      (4L, "汉字 mix!9"), (5L, "   "), (6L, "A1a")).toDF("doc_id", "text")
    assert(legacy(edge).exceptAll(fused(edge)).count() == 0)
    assert(fused(edge).exceptAll(legacy(edge)).count() == 0)
  }

  test("quality scores are in [0,1] and ratios sane") {
    val rows = TextOps.quality(spark, sfDir).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("punct_ratio") >= 0.0 && r.getAs[Double]("punct_ratio") <= 1.0)
    }
  }

  test("token counts: regex tokens >= whitespace tokens") {
    val bad = TextOps.tokenCounts(spark, sfDir)
      .filter(col("n_re_tokens") < col("n_ws_tokens")).count()
    assert(bad == 0)
  }

  test("rolling hash: noise-insensitive, order-sensitive, known vector") {
    import graft.functions.WordShingles
    import org.apache.spark.unsafe.types.UTF8String
    def rh(s: String) = WordShingles.rollingHash(UTF8String.fromString(s))
    // punctuation/case/space-run noise collapses to the same stream
    assert(rh("Hello,  World!") == rh("hello world"))
    // but word order matters (unlike the bag-of-words fingerprint)
    assert(rh("world hello") != rh("hello world"))
    // fixed test vector: 'ab' -> a1 = ('a'*131+'b'), a2 = ('a'*137+'b')
    val a1 = ('a'.toLong * 131 + 'b') % 2147483647L
    val a2 = ('a'.toLong * 137 + 'b') % 2147483629L
    assert(rh("ab") == ((a1 << 32) | a2))
    // SQL surface works end-to-end
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT rolling_hash('Hello,  World!') AS h").collect().head.getLong(0)
    assert(got == rh("hello world"))
  }

  test("pii redaction replaces emails and long digit runs") {
    import spark.implicits._
    import graft.text.TextOps
    // drive the same expressions through a probe frame
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val longNum = "\\d{7,}"
    val out = Seq((1L, "mail me at jane.doe@example.com or call 5035551234567"))
      .toDF("doc_id", "text")
      .select(
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("e"),
        size(regexp_extract_all(col("text"), lit(longNum), lit(0))).as("n"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"), longNum, "<NUM>").as("t"))
      .collect().head
    assert(out.getInt(0) == 1 && out.getInt(1) == 1)
    assert(out.getString(2) == "mail me at <EMAIL> or call <NUM>")
  }

  test("bloom-pruned incremental dedup == plain fingerprint join, and finds real dups") {
    import org.apache.spark.sql.functions._
    val got = TextOps.dedupBloom(spark, sfDir).cache()
    // semantics-free pruning: identical to the un-pruned join
    val fp = md5(concat_ws(" ", array_sort(array_distinct(
      filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "), w => w =!= "")))))
    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"), fp.as("fp"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val want = batch.join(
        corpus.select(col("fp"), col("doc_id").as("c_id")), Seq("fp"), "left")
      .groupBy("doc_id").agg(min("c_id").as("dup_of"))
      .select(col("doc_id"),
        when(col("dup_of").isNull, "admit").otherwise("dup").as("verdict"), col("dup_of"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the synthetic corpus has cross-split bag-of-words dups — both
    // verdicts must actually occur or the gate is vacuous
    assert(got.filter(col("verdict") === "dup").count() > 0)
    assert(got.filter(col("verdict") === "admit").count() > 0)
    got.unpersist(blocking = false)
  }

  test("gopher rules: fields reproduce the verdict, both outcomes occur") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.gopherRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nW = r.getAs[Long]("n_words")
      val mwl = Option(r.getAs[Double]("mean_word_len")).getOrElse(Double.NaN)
      val dr = Option(r.getAs[Double]("dup_ratio")).getOrElse(Double.NaN)
      val want =
        if (nW < 10) "too_short"
        else if (nW > 100000) "too_long"
        else if (mwl < 2.0 || mwl > 12.0) "word_length"
        else if (r.getAs[Long]("n_stop") < 1) "no_stopwords"
        else if (dr > 0.5) "repetitive"
        else "keep"
      assert(r.getAs[String]("reason") == want, s"rule drift on $r")
      assert(r.getAs[Boolean]("keep") == (want == "keep"))
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")),
      "no failing document — the cascade never fires on this corpus")
  }

  test("fingerprint is order-insensitive (bag-of-words collision)") {
    import spark.implicits._
    // reordered words must collide; different words must not
    val probe = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "delta beta alpha"))
      .toDF("doc_id", "text")
    val fps = probe.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(
        filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "), w => w =!= ""))))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  /** Sequential reference winnowing (k=3, w=4, rightmost-min): the
    * paper's algorithm executed naively, used to pin the distributed
    * closed-form version exactly. */
  private def winnowRef(text: String): Option[(Long, Long, Set[String])] = {
    val words = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
    if (words.length < 6) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val kg = (0 to words.length - 3).map(i => md5hex(words.slice(i, i + 3).mkString(" ")))
    val keys = kg.zipWithIndex.map { case (h, i0) =>
      h + "#" + "%07d".format(9999999 - (i0 + 1))
    }
    val fps = (0 to keys.length - 4).map(j => keys.slice(j, j + 4).min).toSet
    Some((kg.length.toLong, fps.size.toLong, fps))
  }

  test("winnowing matches the sequential reference on every real document") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.winnow(spark, sfDir).collect()
    assert(got.nonEmpty)
    val covered = got.map(_.getAs[Long]("doc_id")).toSet
    got.foreach { r =>
      val Some((m, nFps, fps)) = winnowRef(texts(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_kgrams") == m)
      assert(r.getAs[Long]("n_fingerprints") == nFps)
      assert(r.getAs[String]("fp_digest") ==
        md5hex(fps.toSeq.sorted.mkString(",")))
    }
    // rows appear exactly for docs with >= 6 words
    texts.foreach { case (id, t) =>
      assert(covered.contains(id) == winnowRef(t).isDefined)
    }
  }

  test("winnow pair matching equals the full sequential reconstruction (df filter included)") {
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // sequential reference: per-doc fingerprint HASH sets, df<=50
    // boilerplate filter, pairwise intersection >= 2
    val docHashes = texts.flatMap { case (id, t) =>
      winnowRef(t).map { case (_, _, fps) => id -> fps.map(_.takeWhile(_ != '#')) }
    }
    val df = docHashes.flatMap { case (_, hs) => hs }
      .groupBy(identity).map { case (h, o) => h -> o.length }
    val kept = docHashes.map { case (id, hs) => id -> hs.filter(df(_) <= 50) }
    val want = (for {
      (a, ha) <- kept; (b, hb) <- kept if a < b
      shared = ha.intersect(hb).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    val got = TextOps.dedupWinnow(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("n_shared"))).toSet
    assert(got == want, s"winnow pairs diverged (got ${got.size}, want ${want.size})")
    assert(want.nonEmpty, "constructed corpus produced no near-dup pairs — test is vacuous")
  }

  test("winnowing guarantee: docs sharing a >=6-word run share a fingerprint; selection is sparse") {
    // two documents sharing exactly one 7-word run, otherwise disjoint
    val shared = "the quick brown fox jumps over fences"
    val a = s"alpha bravo charlie delta echo $shared foxtrot golf hotel india juliet"
    val b = s"kilo lima mike november oscar papa $shared quebec romeo sierra tango"
    val Some((_, _, fpsA)) = winnowRef(a)
    val Some((_, _, fpsB)) = winnowRef(b)
    // positions differ between docs, but the HASH part of at least one
    // selected key must coincide (the w+k-1 guarantee on the shared run)
    val hashesA = fpsA.map(_.takeWhile(_ != '#'))
    val hashesB = fpsB.map(_.takeWhile(_ != '#'))
    assert(hashesA.intersect(hashesB).nonEmpty, "shared 7-word run produced no common fingerprint")
    // density: winnowing keeps ~2/(w+1) of k-grams, never all of them
    val Some((m, nFps, _)) = winnowRef(a)
    assert(nFps < m, "winnowing selected every k-gram — no sparsification")
  }

  test("novelty curve: doc 0 fully novel, duplicates fully stale, ppm bounded") {
    import org.apache.spark.sql.functions._
    val out = TextOps.noveltyCurve(spark, sfDir).cache()
    val first = out.orderBy("doc_id").first()
    // the lowest doc_id owns every one of its shingles by definition
    assert(first.getAs[Long]("novelty_ppm") == 1000000L)
    out.collect().foreach { r =>
      val ppm = r.getAs[Long]("novelty_ppm")
      assert(ppm >= 0 && ppm <= 1000000)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    // a doc whose text equals an EARLIER doc's text has zero novelty
    val dups = TextOps.dedupExact(spark, sfDir)
      .filter(col("is_dup")).select("doc_id").collect().map(_.getLong(0))
    if (dups.nonEmpty) {
      val stale = out.filter(col("doc_id").isin(dups.toSeq: _*))
        .filter(col("novelty_ppm") =!= 0).count()
      assert(stale == 0, "an exact duplicate of an earlier doc scored novel shingles")
    }
    out.unpersist()
  }

  test("quality classifier matches a sequential hashed-linear reference") {
    val got = TextOps.qualityClassifier(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_words"),
        r.getAs[Long]("logit_milli"), r.getAs[Boolean]("keep")))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Long = {
      md.reset()
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024
    }
    val want = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        val ws = r.getAs[String]("text").toLowerCase.replaceAll("[^a-z ]", "")
          .split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) None else {
          val logit = ws.map(w => (bucket(w) * 2654435761L) % 2001 - 1000).sum
          Some(r.getAs[Long]("doc_id") -> ((ws.length.toLong, logit, logit > 0)))
        }
      }.toMap
    assert(got == want, "classifier logits diverged from the sequential reference")
    // the weight space is balanced enough that both classes occur
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("span dedup matches a sequential reference and removes real cross-doc spans") {
    val W = 8
    val got = TextOps.spanDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("kept_md5")))).toMap
    // sequential reference over the same corpus
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").toLowerCase.replaceAll("[^a-z ]", "")
          .split(" ").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty).sortBy(_._1)
    // global first occurrence per window text, scanned in (doc, start) order
    val firstSeen = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, ws) <- docs; s <- 0 to ws.length - W)
      firstSeen.getOrElseUpdate(ws.slice(s, s + W).mkString(" "), (id, s))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = docs.map { case (id, ws) =>
      val rm = Array.fill(ws.length)(false)
      for (s <- 0 to ws.length - W)
        if (firstSeen(ws.slice(s, s + W).mkString(" ")) != ((id, s)))
          (s until s + W).foreach(rm(_) = true)
      val kept = ws.indices.filter(!rm(_)).map(ws)
      (id, (ws.length.toLong, rm.count(identity).toLong, md5hex(kept.mkString(" "))))
    }.toMap
    assert(got == want, "span dedup diverged from the sequential reference")
    assert(want.values.map(_._2).sum > 0, "corpus should contain duplicated spans")
    // exact-duplicate docs keep nothing but the canonical copy's spans:
    // every doc whose text equals an earlier doc's text is fully removed
    val byText = docs.groupBy(_._2.mkString(" ")).values.filter(_.length > 1)
    byText.foreach { g =>
      g.sortBy(_._1).drop(1).foreach { case (id, ws) =>
        if (ws.length >= W) assert(got(id)._2 == ws.length.toLong,
          s"non-canonical exact dup $id should be fully span-removed")
      }
    }
  }

  test("cross-source dup matrix equals the regrouped jaccard pair list") {
    val srcs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = TextOps.dedupNgramJaccard(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = pairs.map { case (a, b) =>
      val (sa, sb) = (srcs(a), srcs(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case ((lo, hi), g) => (lo, hi, g.length.toLong) }
      .toSeq.sortBy(x => (x._1, x._2))
    val got = TextOps.crossSourceDup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp)
    // the matrix accounts for every pair exactly once
    assert(got.map(_._3).sum == pairs.length)
  }

  test("langid eval matrix equals the regrouped per-doc predictions") {
    val perDoc = TextOps.langId(spark, sfDir)
      .select("actual_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = perDoc.groupBy(identity).map { case ((a, p), g) => (a, p, g.length.toLong) }
    val totals = perDoc.groupBy(_._1).map { case (a, g) => a -> g.length.toLong }
    val exp = cells.toSeq.sortBy(x => (x._1, x._2)).map { case (a, p, n) =>
      (a, p, n, n * 1000000 / totals(a), a == p)
    }
    val got = TextOps.langidEval(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == exp)
    // rows partition the corpus and shares sum to ~1e6 per actual lang
    assert(got.map(_._3).sum == perDoc.length)
    got.groupBy(_._1).foreach { case (a, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$a shares sum $s out of ppm range")
    }
  }

  test("length-decile dup profile conserves docs and matches the pair list") {
    val pairs = TextOps.dedupNgramJaccard(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dup = (pairs.map(_._1) ++ pairs.map(_._2)).toSet
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length.toLong
    val exp = docs.sortBy(x => (x._2, x._1)).zipWithIndex.map { case ((id, ch), i) =>
      (i.toLong * 10 / n + 1, id, ch)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (dec, g) =>
      val nd = g.count(x => dup(x._2)).toLong
      (dec, g.length.toLong, nd, g.map(_._3).min, g.map(_._3).max,
        nd * 1000000L / g.length)
    }
    val got = TextOps.dedupLengthProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    assert(got.map(_._2).sum == n)
    assert(got.map(_._3).sum == dup.size.toLong)
  }

  test("banding S-curve: hierarchical subset law + report consistency") {
    val sigs = TextOps.minhashSigs(spark, sfDir).localCheckpoint(true)
    def pairsOf(b: Int, r: Int) = TextOps.bandedPairsConf(sigs, b, r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val byConf = Map((32, 4) -> pairsOf(32, 4), (16, 8) -> pairsOf(16, 8),
      (8, 16) -> pairsOf(8, 16), (4, 32) -> pairsOf(4, 32))
    // aligned hierarchical slicing: a coarser (more-rows) band match
    // implies every finer sub-band matches, so candidate sets nest
    assert(byConf((16, 8)).subsetOf(byConf((32, 4))))
    assert(byConf((8, 16)).subsetOf(byConf((16, 8))))
    assert(byConf((4, 32)).subsetOf(byConf((8, 16))))
    assert(byConf((32, 4)).nonEmpty)
    val truth = TextOps.dedupNgramJaccard(spark, sfDir).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val report = TextOps.bandingEval(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(report.length == 4)
    for ((b, r, nCand, nTrue, recall, _) <- report) {
      val cand = byConf((b, r))
      assert(nCand == cand.size.toLong, s"($b,$r) candidate count")
      assert(nTrue == cand.intersect(truth).size.toLong, s"($b,$r) true pairs")
      assert(recall == nTrue * 1000000L / truth.size, s"($b,$r) recall")
    }
    // the S-curve: recall never increases as rows-per-band grows
    val recalls = report.sortBy(_._2).map(_._5).toSeq
    assert(recalls == recalls.sorted.reverse)
  }

  test("dedup truth is fully covered by df<=64 shingles (capped-oracle completeness certificate)") {
    // the r8 bounded dedup_eval oracle derives the truth set from
    // df<=64 candidate pairs + exact verify instead of the full
    // inverted self-join; that is the SAME set iff every J>=0.5 pair
    // shares at least one rare shingle — certified here on the test
    // corpus (and re-certified at sf0.1/sf1 in the round log)
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val shingled = TextOps.shingledFrom(TextOps.docsRepartitioned(spark, sfDir))
    val ex = TextOps.invertedIndex(shingled)
    val fullTruth = TextOps.jaccardPairsFromIndex(ex)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    val rare = ex.join(df.filter(col("df") <= 64), Seq("sh"))
      .select("sh", "doc_id")
    val capped = rare.toDF("sh", "a_id")
      .join(rare.toDF("sh", "b_id"), Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fullTruth.nonEmpty)
    assert(fullTruth.subsetOf(capped),
      s"${fullTruth.diff(capped).size} truth pairs share only hot shingles — " +
        "the bounded oracle would under-count the truth set")
  }

  test("production capped pair path equals the uncapped join exactly, values included") {
    // r8: jaccardPairsFrom (and every operator built on it — cluster
    // labels, curation, cross-source, banding/eval truth) switched to
    // df<=PairDfCap candidates + exact full-array verify: the uncapped
    // self-join costs Σdf² rows (260M at sf1 → 2.33B at sf3), while
    // the capped candidate set SATURATES (1.26M → 60k). This is the
    // in-suite completeness certificate for the default path; the
    // UNCAPPED oracle replays in CORRECTNESS guard it at every SF.
    graft.functions.GraftFunctions.register(spark)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val exact = TextOps.dedupNgramJaccard(spark, sfDir).collect().map(key).toSet
    val capped = TextOps.jaccardPairsCapped(spark, sfDir, TextOps.PairDfCap)
      .collect().map(key).toSet
    assert(capped == exact)
    assert(exact.nonEmpty)
  }

  test("capped threshold sweep equals the uncapped sweep at every cut") {
    // dedupSweep generates candidates at its OWN floor (0.2999, not
    // the pair operator's 0.4999) — a cap-threshold mismatch would
    // silently under-count the 0.3/0.4 cuts while the >=0.5 cuts
    // still passed, so the sweep gets its own full-table certificate
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val swept = TextOps.dedupSweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // uncapped reconstruction: the retired Σdf² formulation, inline
    val docs = TextOps.shingledDocs(spark, sfDir)
    val ex = TextOps.invertedIndex(docs)
    val a = ex.toDF("a_id", "a_n", "sh")
    val b = ex.toDF("b_id", "b_n", "sh")
    val jppm = a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n")
      .agg(count(lit(1)).as("inter"))
      .withColumn("j_ppm", expr("inter * 1000000 div (a_n + b_n - inter)"))
      .select("j_ppm").collect().map(_.getLong(0))
    (3 to 9).foreach { i =>
      val thr = i * 100000L
      assert(swept(thr) == jppm.count(_ >= thr).toLong, s"cut $thr")
    }
    assert(swept.values.exists(_ > 0))
  }

  test("verbatim clique past the df cap: production path stays exact where capped-only is blind") {
    // the ADVERSARIAL corpus the r8 advice named: one document
    // duplicated 100 times (> PairDfCap=64) — every shingle it has
    // carries df=100, so the capped index drops ALL of them and the
    // capped-only generator misses the entire C(100,2) clique. The
    // production union (capped ∪ verbatimCandidates) must recover it
    // exactly, alongside a normal rare-shingle near-dup pair.
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val cliqueText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ((0L until 100L).map(i => (i, cliqueText)) ++ Seq(
      (200L, "one two three four five six seven"),
      (201L, "one two three four five six eight"),
      (300L, "completely different words entirely over here")))
      .toDF("doc_id", "text")
    val shingled = TextOps.shingledFrom(docs)
    val ex = TextOps.invertedIndex(shingled)
    val dfTab = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clique =
      (for (a <- 0L until 100L; b <- (a + 1) until 100L) yield (a, b)).toSet
    // 1. the structural hole, demonstrated: capped-only candidates see
    //    none of the clique (and still see the rare-shingle pair)
    val cappedOnly = pairs(
      TextOps.cappedCandidatesVariant(ex, dfTab, TextOps.PairDfCap, "foldlen"))
    assert(cappedOnly.intersect(clique).isEmpty,
      "df=100 shingles leaked through the df<=64 cap")
    assert(cappedOnly.contains((200L, 201L)))
    // 2. the verbatim arm alone recovers exactly the clique
    assert(pairs(TextOps.verbatimCandidatesFromIndex(ex)) == clique)
    // 3. production output == uncapped exact join, values included
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = triples(TextOps.jaccardPairsFromIndex(ex))
    val prod = triples(TextOps.jaccardPairsFrom(shingled))
    assert(prod == exact)
    assert(clique.subsetOf(prod.map(t => (t._1, t._2))))
    assert(prod.filter(t => clique.contains((t._1, t._2))).forall(_._3 == 1.0))
  }

  test("verbatim clique above VerbatimGroupCap: self-join arm emits the identical pair set") {
    // the r9 ADVICE design point: a clique LARGER than the
    // collect-and-explode gate (256) must route through the streamed
    // signature self-join and still emit exactly C(n,2) pairs, while
    // a small clique in the same corpus rides the explode arm — the
    // two arms' union is the full answer with no overlap and no gap
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val bigN = TextOps.VerbatimGroupCap + 44  // 300 > the 256 gate
    val docs = ((0L until bigN.toLong).map(i =>
        (i, "mirror page body repeated everywhere endlessly tonight")) ++
      (1000L until 1003L).map(i =>
        (i, "tiny clique of three identical documents here")) ++
      Seq((2000L, "a lone unduplicated document sits apart quietly")))
      .toDF("doc_id", "text")
    val ex = TextOps.invertedIndex(TextOps.shingledFrom(docs))
    val got = TextOps.verbatimCandidatesFromIndex(ex)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bigClique = (for (a <- 0L until bigN.toLong; b <- (a + 1) until bigN.toLong)
      yield (a, b)).toSet
    val smallClique = Set((1000L, 1001L), (1000L, 1002L), (1001L, 1002L))
    assert(got == bigClique ++ smallClique,
      s"expected ${bigClique.size + 3} pairs, got ${got.size}")
  }

  test("sampled eval: under-budget identity and in-sample exactness") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // corpus (500 docs) under the default 5000-doc budget: the
    // admission filter passes everything — the sampled twin IS the
    // full eval, row for row
    assert(rows(TextOps.dedupEvalSampled(spark, sfDir))
      == rows(TextOps.dedupEval(spark, sfDir)))
    // forced sampling (budget 100): the report still carries all six
    // methods, the truth shrinks, and the prefix-filter lemma holds on
    // ANY subcorpus — its row must stay exactly 1.0/1.0
    val sampled = rows(TextOps.dedupEvalSampled(spark, sfDir, budget = 100L))
    val full = rows(TextOps.dedupEval(spark, sfDir))
    assert(sampled.map(_._1) == full.map(_._1))
    assert(sampled.head._3 < full.head._3)  // n_truth thinned
    val pfx = sampled.find(_._1 == "jaccard_prefix").get
    assert(pfx._5 == 1000000L && pfx._6 == 1000000L)
  }

  test("dedup_truth_guard reports zero production misses on the corpus") {
    val row = TextOps.dedupTruthGuard(spark, sfDir).head()
    val exactN = TextOps.dedupNgramJaccard(spark, sfDir).count()
    assert(row.getLong(0) == exactN)       // n_exact is the uncapped count
    assert(row.getLong(1) == exactN)       // production finds all of them
    assert(row.getLong(2) == 0L)           // and misses none
    assert(exactN > 0)
  }
}
