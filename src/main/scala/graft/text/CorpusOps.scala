package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data corpus preparation operators — the steps between "a
  * deduplicated document table" and "token sequences a trainer reads":
  * chunking, sequence packing, stratified sampling, eval-set
  * contamination scans, and term-salience profiling.
  *
  * Scale design mirrors TextOps: per-row columnar work repartitioned
  * off small file splits; joins on hashed keys; the one inherently
  * sequential computation (packing's running token offset) is a
  * distributed two-phase prefix sum whose only global step is over ONE
  * row per bucket, not per document.
  */
object CorpusOps {

  /** The canonical tokenization and the parallelized scan, SHARED with
    * TextOps — one source of truth, no drifting copies. */
  private def wordsCol: Column = TextOps.wordsCol

  private def docs(spark: SparkSession, dir: String): DataFrame =
    TextOps.docsRepartitioned(spark, dir)

  /** Overlapping token-window chunking (window 64 words, stride 48):
    * the context-window split a pre-training pipeline applies to long
    * documents. Chunk count and membership are closed-form per row, so
    * the whole operator is embarrassingly parallel — explode over an
    * integer sequence, no shuffle before the presentation sort. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), wordsCol.as("words"))
      .withColumn("n", size(col("words")))
      .filter(col("n") > 0)
      // integer-exact chunk count: 1 chunk ≤ 64 words, then one more
      // per started stride: ((n-17) div 48) + 1 ≡ ceil((n-64)/48) + 1
      .withColumn("n_chunks",
        when(col("n") <= 64, lit(1L))
          .otherwise(expr("((n - 17) div 48) + 1").cast("long")))
      .select(col("doc_id"), col("words"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk_words",
        slice(col("words"), (col("chunk_idx") * 48 + 1).cast("int"), lit(64)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk_words")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk_words"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** GPT-style sequence packing: concatenate the corpus token stream in
    * doc_id order and cut it into fixed 2048-token training bins; each
    * document reports the bin range it lands in (documents spill across
    * bin boundaries — the standard concat-and-split regime).
    *
    * The running token offset is a DISTRIBUTED two-phase prefix sum:
    * per-bucket local cumulative sums (hash-partitioned window), bucket
    * subtotals prefix-summed over one-row-per-bucket (the only global
    * window — bounded by bucket count, not corpus size), broadcast back
    * as offsets. No operator ever orders the full corpus in one task. */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val toks = docs(spark, dir)
      .select(col("doc_id"), size(wordsCol).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("doc_id div 1000"))
    val byDoc = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = toks.withColumn("local_before",
      coalesce(sum("n_tokens").over(byDoc), lit(0L)))
    val byBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_total"))
      .withColumn("offset", coalesce(sum("bucket_total").over(byBucket), lit(0L)))
      .select("bucket", "offset")
    local.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_before", col("offset") + col("local_before"))
      .withColumn("first_bin", expr(s"cum_before div $budget"))
      .withColumn("last_bin",
        when(col("n_tokens") > 0,
          expr(s"(cum_before + n_tokens - 1) div $budget"))
          .otherwise(col("first_bin")))
      .select(col("doc_id"), col("n_tokens"), col("cum_before"),
        col("first_bin"), col("last_bin"),
        (col("last_bin") - col("first_bin") + 1).as("bins_spanned"))
      .orderBy("doc_id")
  }

  /** Label-balanced deterministic downsampling: sample every language
    * down to the rarest language's count, selecting rows by a keyed
    * pseudo-hash so the sample is reproducible and shard-independent
    * (no RNG state, no per-partition seeds — the property that makes a
    * sample re-computable on a different cluster layout). The
    * keep-decision `h·cnt < target·M` is integer-exact rational
    * arithmetic: fraction target/cnt of each label's hash space. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000003L // prime hash-space modulus
    val perLang = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("cnt"))
    // rarest-language count: a 1-row agg cross-joined onto the tiny
    // per-language dimension (both bounded by #labels, not corpus size)
    val counts = perLang.crossJoin(perLang.agg(min("cnt").as("target")))
    docs(spark, dir)
      .join(broadcast(counts), Seq("lang"))
      .withColumn("sample_key", pmod(pmod(col("doc_id"), lit(m)) * 2654435761L, lit(m)))
      .filter(col("sample_key") * col("cnt") < col("target") * m)
      .select(col("doc_id"), col("lang"), col("sample_key"))
      .orderBy("doc_id")
  }

  /** Eval-set contamination scan: which training documents share word
    * 3-shingles with the held-out set (doc_id ≡ 0 mod 100 plays the
    * eval split)? The join is the same inverted-index shape as the
    * Jaccard dedup — shingles hashed to longs, candidates bounded per
    * shared shingle (df-cap applies identically at 100 TB), held-out
    * side orders of magnitude smaller than the corpus by construction. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val ex = docs(spark, dir)
      .select(col("doc_id"), explode(expr("word_shingles3(text)")).as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("sh"))
    val held = ex.filter(pmod(col("doc_id"), lit(100)) === 0).toDF("h_id", "sh")
    val corp = ex.filter(pmod(col("doc_id"), lit(100)) =!= 0).toDF("c_id", "sh")
    // shuffled-hash, held-out side as build: ~1% of the corpus by
    // construction, and nothing needs the sort a merge join would pay
    corp.join(held.hint("shuffle_hash"), Seq("sh"))
      .groupBy("c_id")
      .agg(countDistinct("sh").as("n_shared_shingles"),
        countDistinct("h_id").as("n_heldout_docs"))
      .withColumn("contaminated", col("n_shared_shingles") >= 3)
      .select(col("c_id").as("doc_id"), col("n_shared_shingles"),
        col("n_heldout_docs"), col("contaminated"))
      .orderBy("doc_id")
  }

  /** Training-mixture table: per-source token mass → smoothed sampling
    * weight (√tokens — the standard compromise between proportional
    * and uniform mixing) → token budget share and epoch factor
    * (target/actual; > 1 means the source upsamples). The sqrt weight
    * is anchored to integer micro-units before the cross-source sum so
    * the aggregate is order-independent — summing raw doubles across
    * partitions would drift. Source count is bounded (it's a catalog,
    * not data), so the 1-row total cross-join is free at any scale. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    val budget = 100000L
    val per = docs(spark, dir)
      .select(col("source"), size(wordsCol).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .withColumn("w_micro",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    per.crossJoin(per.agg(sum("w_micro").as("tot_w")))
      // nullif denominators: an all-empty source (or corpus) yields 0
      // weights, and double /0 is Inf/NaN in Spark — NULL is the
      // repo's pinned divide-by-zero convention
      .withColumn("share", col("w_micro").cast("double") /
        nullif(col("tot_w"), lit(0L)))
      .withColumn("target_tokens", floor(col("share") * budget).cast("long"))
      .withColumn("epochs", col("target_tokens").cast("double") /
        nullif(col("n_tokens"), lit(0L)))
      .select("source", "n_docs", "n_tokens", "w_micro", "share",
        "target_tokens", "epochs")
      .orderBy("source")
  }

  /** Intra-document repetition: how much of a document is the same
    * 3-word window repeating? 1 − distinct/total shingle windows — the
    * boilerplate/spam signal the C4 cascade uses alongside the symbol
    * and stopword rules. Pure per-row arithmetic off the codegen'd
    * shingler: no shuffle before the presentation sort. */
  /** DSIR importance weights (Xie et al. '23, "Data Selection via
    * Importance Resampling", unigram feature space): each candidate
    * (non-target) document scores Σ_w n_w·[ln p̂_target(w) −
    * ln p̂_source(w)] with add-1 smoothed unigram models — the
    * log-likelihood-ratio that upweights source docs resembling the
    * target domain (lang='en' plays the target). Resampling then keeps
    * docs ∝ exp(weight); the weight table is the operator.
    *
    * Engine-exactness discipline (the lm_score pattern): the log-ratio
    * is quantized ONCE per distinct word to integer milli-nats, so
    * every per-doc sum is an exact integer aggregate — no FP
    * accumulation-order drift across layouts or engines. Scale shape:
    * two vocabulary-bounded aggregates (word counts, one-row totals
    * broadcast), then an index join of the token stream against the
    * vocabulary table (shuffled-hash — the bounded side builds) and a
    * map-side-combinable per-doc sum. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").as("is_t"),
        explode(wordsCol).as("w"))
      .select(col("doc_id"), col("is_t"), xxhash64(col("w")).as("wk"))
    val wc = toks.groupBy("wk").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cs"))
    val tot = wc.agg(sum("ct").as("nt"), sum("cs").as("ns"),
      count(lit(1)).as("v"))
    val ratio = wc.crossJoin(broadcast(tot))
      .select(col("wk"),
        round((log((col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double"))
          - log((col("cs") + 1).cast("double") / (col("ns") + col("v")).cast("double")))
          * 1000, 0).cast("long").as("lr_milli"))
    toks.filter(!col("is_t"))
      .join(ratio.hint("shuffle_hash"), Seq("wk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr_milli").as("sum_milli"))
      .withColumn("avg_milli", expr("sum_milli div n_tokens"))
      .orderBy("doc_id")
  }

  def repetition(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir)
      .select(col("doc_id"), size(wordsCol).cast("long").as("n_words"),
        size(expr("word_shingles3(text)")).cast("long").as("n_distinct"))
      .filter(col("n_words") >= 3)
      .withColumn("n_windows", col("n_words") - 2)
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_windows"))
      .select("doc_id", "n_windows", "n_distinct", "rep_ratio")
      .orderBy("doc_id")
  }

  /** Tokenizer vocabulary coverage: build the top-1000 corpus words by
    * document frequency (ties broken lexically — deterministic), then
    * score every document's out-of-vocabulary rate against it. The
    * vocabulary is BOUNDED by construction (top-k), so broadcasting it
    * into the coverage join is scale-correct — this is the one text
    * join in the library where a broadcast hint is provably safe at any
    * corpus size. OOV rate is the trainer-facing signal for tokenizer
    * fit / corpus drift. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    // one explode+shuffle builds (doc, term, tf); document frequency
    // is then a row-count over it (each (doc, term) appears once) and
    // coverage sums tf — the corpus never explodes twice
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(wordsCol).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(1000)
      .select(col("term"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .orderBy("doc_id")
  }

  /** BPE-style merge-pair statistics: corpus-wide counts of ADJACENT
    * token pairs WITH multiplicity — the statistic a byte-pair-encoding
    * tokenizer trainer maximizes at each merge step (ngramFreq is the
    * per-document-distinct twin; merge ranking needs raw occurrence
    * mass). Pair extraction is closed-form per row (transform over an
    * index sequence — no join, no second explode of the corpus); the
    * only shuffle is the pair-count aggregation, map-side combinable
    * because hot pairs collapse to one partial per task. Top-100 with a
    * lexical tiebreak so the output is a total order. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), wordsCol.as("words"))
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(words) - 1),
          |  i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))""".stripMargin))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(100)

  /** BM25 relevance scoring of every document against a fixed query
    * term set — the retrieval-quality scorer a data pipeline runs to
    * mine training documents for a topic. Classic BM25 (k1=1.2,
    * b=0.75) with one deliberate substitution: the idf factor is the
    * raw Robertson odds (N − df + 0.5)/(df + 0.5) WITHOUT the log —
    * ln() is libm-dependent and engines disagree in the last bit,
    * while +,×,/ are IEEE-exact, so this variant is reproducible
    * bit-for-bit across any engine (and the log is monotone in the
    * odds, so per-term ranking is unchanged). Per-term scores are
    * summed in FIXED column order (conditional aggregation), never by
    * a shuffle-order-dependent SUM over doubles. The df/avgdl sides
    * are one-row or #terms-row aggregates — broadcast by construction;
    * the corpus is touched once for tf and once for doc length. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("scan", "merge", "window")
    val dl = docs(spark, dir)
      .select(col("doc_id"), size(wordsCol).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(wordsCol).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("score",
        col("idf") * (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") / col("avgdl")))))
    scored.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms_matched"),
        sum(when(col("term") === terms(0), col("score"))).as("s0"),
        sum(when(col("term") === terms(1), col("score"))).as("s1"),
        sum(when(col("term") === terms(2), col("score"))).as("s2"))
      .withColumn("bm25",
        coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0)) +
          coalesce(col("s2"), lit(0.0)))
      .select("doc_id", "n_terms_matched", "bm25")
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(50)
  }

  /** Per-document salient terms: top-5 words by tf/df weighting (term
    * frequency over corpus document frequency — the idf-monotone
    * salience score kept as an exact IEEE division so every engine
    * computes identical bits; ln-based idf is libm-dependent). The df
    * side is a vocabulary-sized aggregate with map-side partials; no
    * broadcast hint — vocabulary scales with the corpus. */
  def termSalience(spark: SparkSession, dir: String): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(wordsCol).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df = distinct docs per term = row count over the tf frame (each
    // (doc, term) appears once) — no second explode of the corpus
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df.hint("shuffle_hash"), Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  /** Corpus collocations: top-100 word bigrams by pointwise lift —
    * n(a,b)·N / (n(a)·n(b)), the exp of PMI, kept in exact integer
    * ppm (`div`) so the ranking is engine-independent where libm log
    * is not. Token-LEVEL counts (every occurrence), unlike
    * `ngramFreq`'s document frequency. The plan is two vocabulary-
    * bounded hash aggregates (bigram counts, unigram counts) and two
    * joins of the bigram table against the unigram table — everything
    * map-side combinable, the 1-row total joined by broadcast cross.
    * The ≥5-occurrence floor is the standard collocation support cut
    * and bounds the report against hapax noise. */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val ws = docs(spark, dir).select(wordsCol.as("ws")).filter(size(col("ws")) > 1)
    val uni = docs(spark, dir).select(explode(wordsCol).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val tot = uni.agg(sum("n").as("n_tot"))
    val bi = ws.select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    bi.join(uni.toDF("w1", "n_a"), Seq("w1"))
      .join(uni.toDF("w2", "n_b"), Seq("w2"))
      .crossJoin(broadcast(tot))
      // DECIMAL(38): n_ab·n_tot·1e6 wraps long at corpus scale (same
      // overflow class fixed in basketLift)
      .withColumn("lift_ppm", expr(
        "CAST(n_ab AS DECIMAL(38,0)) * n_tot * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)"))
      .select("w1", "w2", "n_ab", "n_a", "n_b", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** Corpus Zipf profile: the top-500 vocabulary words by token count
    * with rank, the rank×count product (≈constant under Zipf's law —
    * the corpus-health eyeball), and cumulative token share in exact
    * ppm. The vocabulary count is one combinable aggregate; the global
    * order-by is over the VOCABULARY (bounded, never corpus rows), and
    * the running share runs inside the already-limited 500-row slice,
    * so the single-partition window is constant-size at any corpus
    * scale. */
  def zipfProfile(spark: SparkSession, dir: String): DataFrame = {
    val uni = docs(spark, dir).select(explode(wordsCol).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val tot = uni.agg(sum("n").as("n_tot"))
    val top = uni.orderBy(col("n").desc, col("word")).limit(500)
    val w = Window.orderBy(col("n").desc, col("word"))
    val cum = Window.orderBy(col("n").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum("n").over(cum))
      .crossJoin(broadcast(tot))
      .withColumn("rank_x_n", col("rank") * col("n"))
      .withColumn("cum_share_ppm", expr("cum_n * 1000000 div n_tot"))
      .select("rank", "word", "n", "rank_x_n", "cum_share_ppm")
      .orderBy("rank")
  }

  /** Per-document lexical diversity: type count, type-token ratio, and
    * the Simpson repetition index Σn_w² ·1e6 / N² (the probability two
    * random tokens are the same word) — the gibberish/boilerplate
    * signal that catches low-entropy docs without a libm log. All
    * integer-exact ppm. Two stacked per-doc hash aggregations, both
    * map-side combinable; embarrassingly parallel across documents. */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(wordsCol).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), count(lit(1)).as("n_types"),
        sum(col("n") * col("n")).as("sum_sq"))
      .withColumn("ttr_ppm", expr("n_types * 1000000 div n_words"))
      .withColumn("simpson_ppm", expr(
        "CAST(sum_sq AS DECIMAL(38,0)) * 1000000 div (CAST(n_words AS DECIMAL(38,0)) * n_words)"))
      .select("doc_id", "n_words", "n_types", "ttr_ppm", "simpson_ppm")
      .orderBy("doc_id")

  /** Weighted sampling without replacement by PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM '07): each document draws priority
    * q_i = w_i/u_i with u_i uniform, and the k largest priorities form
    * the sample — the size-bounded weighted sample a mixture pipeline
    * uses to over-select long/high-quality documents. Determinism and
    * engine-parity come from integer arithmetic end to end: u_i is a
    * Knuth-multiplicative hash residue in [1, M] (no RNG state, so the
    * sample is reproducible on any cluster layout) and the priority is
    * the BIGINT floor of w·S/u. The top-k plans as
    * TakeOrderedAndProject: per-partition k-row heaps, one k-row merge
    * on the driver — no global sort and no full-corpus shuffle, which
    * is the whole 100 TB story for "pick 100 of a trillion docs". */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000003L // prime hash-space modulus (shared with sampleStratified)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("u", pmod(pmod(col("doc_id"), lit(m)) * 2654435761L, lit(m)) + 1)
      // w ≤ 1e9 chars and S = 1e9 keep w·S < 2^63: overflow-free BIGINT
      .withColumn("priority", expr("(weight * 1000000000) div u"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100)
      .select("doc_id", "weight", "u", "priority")
  }

  /** Byte-pair-encoding tokenizer, learn + apply (Sennrich, Haddow &
    * Birch, ACL '16): iteratively merge the corpus-wide most frequent
    * adjacent symbol pair, then encode every word greedily with the
    * learned merge table. The published scale trick IS the
    * implementation shape: learning runs over the WORD-FREQUENCY
    * DICTIONARY (one groupBy of the corpus — vocabulary-bounded, not
    * corpus-bounded), each merge round is one map-side-combinable pair
    * aggregate over that dictionary, and the driver reads exactly ONE
    * row per round (the argmax pair — same bounded-driver pattern as
    * dedup_cluster's convergence count). Encoding is a pure column
    * expression: a left fold (`aggregate`) per learned merge collapses
    * adjacent (a,b) left-to-right non-overlapping — per-row, no state,
    * embarrassingly parallel at any scale. Ties in pair frequency break
    * lexically so the learned table is deterministic on any layout.
    *
    * No SQL oracle by design (the learn loop is iterative argmax —
    * DuckDB would need K chained recomputations); the spec pins a
    * hand-computed merge sequence on a constructed corpus, the
    * detokenization round-trip (concat(tokens) == word) on real data,
    * and layout invariance. */
  /** greedy left-to-right application of the learned merges, in learn
    * order (BPE's apply rule): each merge is one array fold. Retained
    * (spec-only consumer) as the executable definition the codegen'd
    * [[graft.functions.BpeApply]] kernel is pinned against — the
    * production query applies the kernel, whose nested-lambda twin
    * this is. */
  private[graft] def bpeFoldMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (s, (a, b)) =>
      aggregate(s, array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    }

  /** `vocabCap` gates the bounded-driver learn path (below); the spec
    * forces the distributed branch with vocabCap = 0 and pins the two
    * branches row-identical. */
  def bpeEncode(spark: SparkSession, dir: String,
      vocabCap: Long = 2000000L): DataFrame = {
    val rounds = 8
    val chars: Column => Column =
      w => filter(split(w, ""), c => c =!= "")
    // ONE codegen'd kernel applies the whole learned merge list
    // (r11, guide §4): the nested-fold column form re-planned a
    // k-lambda tree every learn round — measured 2.5 s of Catalyst
    // planning vs 0.3 s of execution per pass at sf0.1. Identical
    // fold semantics (BpeApply scaladoc), spec-pinned.
    def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
      if (merges.isEmpty) syms
      else org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.BpeApply(
          org.apache.spark.sql.GraftPlanBridge.expression(syms), merges))
    val vocab = docs(spark, dir)
      .select(explode(wordsCol).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .persist()
    var merges = Vector.empty[(String, String)]
    // BOUNDED-DRIVER learn loop (r11 — the guardedComponents /
    // dbscan-super-cell discipline): BPE learning runs over the word-
    // frequency DICTIONARY, which is Heaps-law bounded — it saturates
    // long before the corpus stops growing, which is the published
    // scale trick this operator already exploits. Under the cap the
    // dictionary is collected ONCE and the 8 argmax rounds run on the
    // driver (each distributed round was a whole job over the tiny
    // persisted vocab: 8 × ~0.3 s of scheduling/shuffle overhead per
    // pass, ~2.5 s of the query's 2.9 s wall at sf0.1); past the cap
    // the distributed loop below runs unchanged. Branch equivalence:
    // same adjacent-pair multiset (every occurrence weighted by word
    // freq), same argmax order (freq desc, then (a, b) ascending —
    // vocab words are [a-z]+ so Scala's UTF-16 and Spark's UTF-8
    // binary string orders coincide), same empty-round skip, and the
    // incremental merge application is exactly the sequential fold
    // (fold(m₁..mₖ₊₁, chars) ≡ apply mₖ₊₁ to fold(m₁..mₖ, chars)) —
    // spec-pinned on the hand-derived corpus.
    if (vocab.count() <= vocabCap) {
      val rows = vocab.collect()
      // tie-break guard (r11 ADVICE): the driver argmax orders (a, b)
      // in Scala's UTF-16 string order, the distributed branch in
      // Spark's UTF-8 binary order — the two coincide only on ASCII.
      // wordsCol strips text to [a-z ] so this cannot fire today; the
      // assertion turns a future tokenization change into a loud
      // failure instead of silently learning a different merge table.
      require(rows.forall(r => r.getString(0).forall(_ < 0x80)),
        "bounded-driver BPE needs ASCII symbols (UTF-16 vs UTF-8 tie-break)")
      var syms: Array[(Array[String], Long)] = rows.map { r =>
        (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1))
      }
      for (_ <- 1 to rounds) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        syms.foreach { case (s, f) =>
          var i = 0
          while (i < s.length - 1) {
            val k = (s(i), s(i + 1))
            counts(k) = counts.getOrElse(k, 0L) + f
            i += 1
          }
        }
        if (counts.nonEmpty) {
          val (a, b) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
          merges :+= ((a, b))
          val ab = a + b
          syms = syms.map { case (s, f) =>
            if (s.length < 2) (s, f)
            else {
              val out = new Array[String](s.length)
              var o = 0; var j = 0
              while (j < s.length) {
                if (o > 0 && out(o - 1) == a && s(j) == b) out(o - 1) = ab
                else { out(o) = s(j); o += 1 }
                j += 1
              }
              (java.util.Arrays.copyOf(out, o), f)
            }
          }
        }
      }
    } else {
      for (_ <- 1 to rounds) {
        val best = vocab
          .select(col("freq"), applyMerges(chars(col("word")), merges).as("s"))
          .filter(size(col("s")) >= 2)
          .select(col("freq"), explode(expr(
            """transform(sequence(1, size(s) - 1),
              |  i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"""
              .stripMargin)).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1).collect()
        if (best.nonEmpty)
          merges :+= (best(0).getAs[String]("a"), best(0).getAs[String]("b"))
      }
    }
    vocab.unpersist(blocking = false)
    // the returned frame re-derives the dictionary from source: the
    // query stays stateless (nothing persisted escapes the function)
    docs(spark, dir)
      .select(explode(wordsCol).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("tokens", applyMerges(chars(col("word")), merges))
      .select(col("word"), col("freq"),
        size(col("tokens")).cast("long").as("n_tokens"),
        concat_ws(" ", col("tokens")).as("encoding"))
      .orderBy(col("freq").desc, col("word"))
      .limit(200)
  }

  /** Token-budget curation: fill a training budget — 50% of the
    * corpus's whitespace tokens, scale-free by construction — with the
    * highest-quality documents first (quality = the hashed linear
    * classifier's logit, ties pinned by doc_id). The greedy
    * quality-ordered prefix is what budgeted pretraining actually
    * ships: rank docs by score, admit until the token meter fills.
    *
    * Scale shape: rank AND running token total come from ONE two-phase
    * pass (in-cell rank + running sum over 10-milli logit cells,
    * broadcast per-cell (count, token) offsets — no one-task global
    * sort, the `prAuc` discipline); the budget is a 1×1 broadcast
    * scalar. Admission compares the INCLUSIVE running total, so the
    * first doc that would overflow the budget is dropped along with
    * everything below it. Token sums stay BIGINT (corpus tokens ≪
    * 9.2e18); docs the classifier never scores (wordless) are outside
    * the candidate set, exactly as in the eval-curve family. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val scored = TextOps.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("logit_milli"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("token_profile(text).n_ws_tokens").as("n_tok"))
    val j = scored.join(toks, Seq("doc_id"))
      .withColumn("_c", expr("logit_milli div 10"))
    val inCell = Window.partitionBy("_c")
      .orderBy(col("logit_milli").desc, col("doc_id").asc)
    val inCellRun = inCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("_c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = j.groupBy("_c")
      .agg(count(lit(1)).as("_n"), sum("n_tok").as("_t"))
      .withColumn("_offn", coalesce(sum("_n").over(offW), lit(0L)))
      .withColumn("_offt", coalesce(sum("_t").over(offW), lit(0L)))
      .select("_c", "_offn", "_offt")
    val budget = j.agg(expr("sum(n_tok) div 2").as("budget_tok"))
    j.withColumn("_i", row_number().over(inCell).cast("long"))
      .withColumn("_tin", sum("n_tok").over(inCellRun))
      .join(broadcast(offsets), Seq("_c"))
      .withColumn("rank", col("_offn") + col("_i"))
      .withColumn("cum_tokens", col("_offt") + col("_tin"))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget_tok"))
      .select("doc_id", "logit_milli", "n_tok", "rank", "cum_tokens")
      .orderBy("rank")
  }

  /** Heaps'-law vocabulary growth curve: cumulative distinct-word
    * count after each tenth of the corpus (doc_id order) — the
    * diminishing-returns report behind "how much NEW vocabulary does
    * more data buy". The exact cumulative distinct needs no running
    * set: a word contributes exactly once, AT its globally FIRST
    * document (one min-aggregate over the token stream), so the curve
    * is a 10-row cumulative sum over first-occurrence counts. One
    * vocabulary-bounded aggregate + bounded windows; the corpus-size
    * scalar rides a 1-row broadcast. */
  def heapsCurve(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.documents(spark, dir)
      .agg((max("doc_id") + 1).as("n"))
    val newW = docs(spark, dir)
      .select(col("doc_id"), explode(wordsCol).as("w"))
      .groupBy("w").agg(min("doc_id").as("fd"))
      .crossJoin(broadcast(mx))
      .select(expr("fd * 10 div n").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_words"))
    val run = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir).crossJoin(broadcast(mx))
      .select(expr("doc_id * 10 div n").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .join(newW, Seq("bucket"), "left")
      .withColumn("new_words", coalesce(col("new_words"), lit(0L)))
      // bounded 10-row table: the unpartitioned windows are by design
      .withColumn("cum_docs", sum("n_docs").over(run))
      .withColumn("cum_vocab", sum("new_words").over(run))
      .orderBy("bucket")
  }

  /** Epoch materialization — the executable step after `corpusMix`'s
    * plan: assign every document its REPEAT COUNT for the training run
    * so each source hits its (√-smoothed) token target. The per-source
    * milli-epoch factor e = target·1000 div tokens spreads over docs by
    * the exact Bresenham rule
    *
    *   n_copies(r) = (e·r div 1000) − (e·(r−1) div 1000)
    *
    * over the per-source doc_id rank r — deterministic (no RNG, no
    * hashing), and Σ n_copies = e·n div 1000 exactly, so the realized
    * epoch count is within one doc of the plan (spec-pinned). An
    * upsampled source (e > 1000) repeats docs ⌊e/1000⌋..⌈e/1000⌉
    * times; a downsampled one (e < 1000) drops the Bresenham gaps
    * (n_copies = 0) — both from the same formula. Scale shape: the
    * rank is the generalized two-phase row_number (no one-task-per-
    * source window), the plan table is |sources|-bounded and broadcast,
    * everything else is closed-form per row. All-integer ⇒ fully
    * oracled. */
  def epochAssign(spark: SparkSession, dir: String): DataFrame = {
    val budget = 100000L
    val dtok = docs(spark, dir)
      .select(col("doc_id"), col("source"), size(wordsCol).cast("long").as("n_tok"))
    val per = dtok.groupBy("source")
      .agg(sum("n_tok").as("n_tokens"))
      .withColumn("w_micro",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    val tot = per.agg(sum("w_micro").as("tot_w"))
    val plan = per.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(s"w_micro * $budget div nullif(tot_w, 0)"))
      .withColumn("e_milli", expr("target_tokens * 1000 div nullif(n_tokens, 0)"))
      .select("source", "e_milli")
    graft.analytics.Analytics
      .twoPhaseRowNumber(dtok, Seq("source"), "doc_id", "doc_id",
        expr("doc_id div 64"), asc = true, out = "r")
      .join(broadcast(plan), Seq("source"))
      .withColumn("n_copies",
        expr("e_milli * r div 1000 - e_milli * (r - 1) div 1000"))
      .select("doc_id", "source", "r", "n_copies")
      .orderBy("doc_id")
  }
}
