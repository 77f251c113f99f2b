package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model-evaluation / data-monitoring operators over the classifier
  * scores and event streams — the measurement half of a training-data
  * pipeline (reference analogue: the validation/assertion passes in
  * Part2/data_valid8.py; the score side composes graft.text.TextOps
  * .qualityClassifier the way any filter-eval harness composes its
  * filter model).
  *
  * Everything is integer-exact (ppm / milli units, integral `div`) so
  * DuckDB recomputes identical bits — no libm, no FP accumulation
  * ordering.
  */
object MlEval {

  /** Shared labeled-score relation: every document's hashed-classifier
    * logit joined with its `lang = 'en'` truth bit — the input of all
    * threshold-free eval curves below. */
  private def labeledScores(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextOps.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("logit_milli"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), (col("lang") === "en").as("is_pos")),
        Seq("doc_id"))

  /** Exact distributed AUC (area under the ROC curve) of the hashed
    * quality classifier against the `lang = 'en'` truth label, with
    * full tie handling — the Mann-Whitney pairwise form:
    *
    *   AUC = (#{pos > neg} + ½·#{pos == neg}) / (n_pos · n_neg)
    *
    * computed WITHOUT materializing pairs: group once by distinct
    * score (combinable aggregate, output bounded by distinct logits),
    * then wins = Σ_g np_g · (negatives strictly below g) off a running
    * negative count, and ties = Σ_g np_g·nn_g. The running count uses
    * the repo's two-phase cell pattern (in-cell window + broadcast
    * per-cell offsets) so no single task ever sorts the whole distinct-
    * score table. Reported as exact integer ppm; numerator widened to
    * DECIMAL(38,0) — wins ~ n²/4 overflows BIGINT·10⁶ at ~10⁹ docs. */
  def aucScore(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.text.TextOps.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("logit_milli"))
    val labeled = scored.join(
      Tables.documents(spark, dir)
        .select(col("doc_id"), (col("lang") === "en").as("is_pos")),
      Seq("doc_id"))
    val byScore = labeled.groupBy(col("logit_milli").as("s"))
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("is_pos"), 1L).otherwise(0L)).as("nn"))
    // negatives strictly below each score, two-phase: trunc-div cells
    // are monotone non-decreasing in s (fixed positive divisor), so
    // cell order extends score order
    val cell = expr("s div 1000")
    val inCell = Window.partitionBy("_c").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    val b = byScore.withColumn("_c", cell)
    val offsets = b.groupBy("_c").agg(sum("nn").as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(offW), lit(0L)))
      .select("_c", "_off")
    b.withColumn("_in", coalesce(sum("nn").over(inCell), lit(0L)))
      .join(broadcast(offsets), Seq("_c"))
      .withColumn("nn_below", col("_off") + col("_in"))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(col("np") * col("nn_below")).as("wins"),
        sum(col("np") * col("nn")).as("ties"))
      .withColumn("auc_ppm", expr(
        """CAST((CAST(2 AS DECIMAL(38,0)) * wins + ties) * 1000000
          | div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)""".stripMargin))
      .select("n_pos", "n_neg", "wins", "ties", "auc_ppm")
  }

  /** Classifier calibration by score decile: rank every document by
    * (logit, doc_id), cut into 10 closed-form buckets, and report the
    * observed positive rate per bucket — the reliability table behind
    * every calibration curve. Decile assignment is the explicit
    * integer formula `(i-1)·10 div n + 1` (documented contract, NOT
    * window-ntile semantics) so both engines compute it from the same
    * rank; ranking itself is the two-phase bucketed row_number — no
    * global one-task sort. One driver scalar (corpus count) fixes n. */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val labeled = graft.text.TextOps.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("logit_milli"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), (col("lang") === "en").as("is_pos")),
        Seq("doc_id"))
    val n = labeled.count() // the one driver-side scalar: corpus size
    if (n == 0)
      return labeled.select(lit(0L).as("decile"), lit(0L).as("n_docs"),
        lit(0L).as("n_pos"), lit(0L).as("min_logit"), lit(0L).as("max_logit"),
        lit(0L).as("pos_ppm")).limit(0)
    // cells of 10-logit width spread each decile's rank work
    Analytics.twoPhaseRowNumber(labeled, Seq.empty, "logit_milli", "doc_id",
        expr("logit_milli div 10"), asc = true, out = "i")
      .withColumn("decile", expr(s"(i - 1) * 10 div ${n}L + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"),
        min("logit_milli").as("min_logit"),
        max("logit_milli").as("max_logit"))
      .withColumn("pos_ppm", expr("n_pos * 1000000 div n_docs"))
      .orderBy("decile")
  }

  /** Exact average precision (the area under the precision-recall
    * curve in its standard step form) — the retrieval-style companion
    * to ROC-AUC, and the better headline number when positives are
    * rare (a quality filter for a low-resource language sees exactly
    * this regime):
    *
    *   AP = (1/n_pos) · Σ_{positives} precision@rank(p)
    *
    * with rank over the total order (logit desc, doc_id asc), so ties
    * are pinned and both engines compute identical bits. Per-positive
    * precision is the integral `1e6·cum_pos div rank`; the sum widens
    * to DECIMAL(38,0) (Σ of ≤1e6 terms over 1e12 positives brushes the
    * BIGINT edge). Rank AND running positive count come from ONE
    * two-phase pass: in-cell window over 10-milli logit cells plus a
    * broadcast per-cell (count, positives) offset table — no one-task
    * global sort, same discipline as `aucScore`. */
  def prAuc(spark: SparkSession, dir: String): DataFrame = {
    val labeled = labeledScores(spark, dir)
      .withColumn("_p", when(col("is_pos"), 1L).otherwise(0L))
      .withColumn("_c", expr("logit_milli div 10"))
    val inCell = Window.partitionBy("_c")
      .orderBy(col("logit_milli").desc, col("doc_id").asc)
    val inCellSum = inCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // descending cell order: cells are monotone in the (descending) key
    val offW = Window.orderBy(col("_c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = labeled.groupBy("_c")
      .agg(count(lit(1)).as("_n"), sum("_p").as("_np"))
      .withColumn("_offn", coalesce(sum("_n").over(offW), lit(0L)))
      .withColumn("_offp", coalesce(sum("_np").over(offW), lit(0L)))
      .select("_c", "_offn", "_offp")
    val totals = labeled.agg(count(lit(1)).as("n_docs"))
    labeled
      .withColumn("_i", row_number().over(inCell).cast("long"))
      .withColumn("_pin", sum("_p").over(inCellSum))
      .join(broadcast(offsets), Seq("_c"))
      .withColumn("rank", col("_offn") + col("_i"))
      .withColumn("cum_pos", col("_offp") + col("_pin"))
      .filter(col("is_pos"))
      .agg(count(lit(1)).as("n_pos"),
        sum(expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div rank AS DECIMAL(38,0))"))
          .as("_sp"))
      .crossJoin(totals) // 1×1
      .withColumn("ap_ppm", expr("CAST(_sp div n_pos AS BIGINT)"))
      .select("n_docs", "n_pos", "ap_ppm")
  }

  /** Exact Kolmogorov-Smirnov statistic between the positive and
    * negative score distributions — the classical separability test
    * (credit scoring's "KS"), sharper than a single threshold's
    * confusion counts: max over thresholds of the CDF gap, reported
    * with the logit where the gap peaks (= the optimal cutoff).
    *
    *   KS = max_s |cumPos(s)/n_pos − cumNeg(s)/n_neg|
    *
    * cross-multiplied into integers (DECIMAL(38,0) — cum·total is
    * ~n² at the peak). One distinct-score aggregate bounds the table
    * by distinct logits; running sums are the same two-phase cell
    * pass as `aucScore`; the argmax is ONE lexicographic struct max
    * (gap, −s) — ties resolve to the smallest logit. */
  def ksStat(spark: SparkSession, dir: String): DataFrame = {
    val byScore = labeledScores(spark, dir)
      .groupBy(col("logit_milli").as("s"))
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("is_pos"), 1L).otherwise(0L)).as("nn"))
    val inCell = Window.partitionBy("_c").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    val b = byScore.withColumn("_c", expr("s div 1000"))
    val offsets = b.groupBy("_c")
      .agg(sum("np").as("_np"), sum("nn").as("_nn"))
      .withColumn("_offp", coalesce(sum("_np").over(offW), lit(0L)))
      .withColumn("_offn", coalesce(sum("_nn").over(offW), lit(0L)))
      .select("_c", "_offp", "_offn")
    val totals = byScore.agg(sum("np").as("n_pos"), sum("nn").as("n_neg"))
    b.withColumn("_pin", sum("np").over(inCell))
      .withColumn("_nin", sum("nn").over(inCell))
      .join(broadcast(offsets), Seq("_c"))
      .withColumn("cp", col("_offp") + col("_pin"))
      .withColumn("cn", col("_offn") + col("_nin"))
      .crossJoin(broadcast(totals))
      .withColumn("d_num", expr(
        "abs(CAST(cp AS DECIMAL(38,0)) * n_neg - CAST(cn AS DECIMAL(38,0)) * n_pos)"))
      .agg(max("n_pos").as("n_pos"), max("n_neg").as("n_neg"),
        max(struct(col("d_num"), (-col("s")).as("ns"))).as("m"))
      .select(col("n_pos"), col("n_neg"),
        expr("CAST(m.d_num * 1000000 div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)")
          .as("ks_ppm"),
        (-col("m.ns")).as("at_logit"))
  }

  /** Cumulative gains / lift table by score decile — "how much of the
    * good data does the top-k% of the ranking capture?", the curve
    * behind every budgeted-curation decision (label the top decile
    * first, crawl the top two). Deciles reuse the calibration cut
    * ((i−1)·10 div n + 1 over the two-phase DESCENDING rank — decile 1
    * is the model's best); the cumulative pass is a window over the
    * 10-row decile table, not the corpus. lift = (cum_pos/cum_docs) /
    * (tot_pos/n), cross-multiplied in DECIMAL(38,0). */
  def gains(spark: SparkSession, dir: String): DataFrame = {
    val labeled = labeledScores(spark, dir)
    val n = labeled.count() // the one driver scalar, as in calibration
    if (n == 0)
      return labeled.select(lit(0L).as("decile"), lit(0L).as("n_docs"),
        lit(0L).as("n_pos"), lit(0L).as("cum_pos"), lit(0L).as("gain_ppm"),
        lit(0L).as("lift_ppm")).limit(0)
    val byDecile = Analytics.twoPhaseRowNumber(labeled, Seq.empty, "logit_milli",
        "doc_id", expr("logit_milli div 10"), asc = false, out = "i")
      .withColumn("decile", expr(s"(i - 1) * 10 div ${n}L + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"))
    // the running/total windows see exactly 10 rows — bounded by design
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_pos", sum("n_pos").over(w))
      .withColumn("cum_docs", sum("n_docs").over(w))
      .withColumn("tot_pos", sum("n_pos").over(Window.partitionBy()))
      .withColumn("gain_ppm",
        expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div tot_pos AS BIGINT)"))
      .withColumn("lift_ppm", expr(
        s"""CAST(CAST(cum_pos AS DECIMAL(38,0)) * ${n}L * 1000000
           | div (CAST(cum_docs AS DECIMAL(38,0)) * tot_pos) AS BIGINT)""".stripMargin))
      .select("decile", "n_docs", "n_pos", "cum_pos", "gain_ppm", "lift_ppm")
      .orderBy("decile")
  }

  /** Confusion counts and the derived rates at the classifier's
    * operating threshold (keep = logit > 0, the exact contract of
    * `text_classifier`) — the four numbers every deployed filter is
    * judged by, as one map-side-combinable aggregate over the scan
    * (nothing shuffles but four partial sums). Rates in integral ppm;
    * the F1 numerator widens to DECIMAL(38,0) for the 10¹²-doc tier. */
  def confusion(spark: SparkSession, dir: String): DataFrame =
    labeledScores(spark, dir)
      .agg(
        sum(when(col("is_pos") && col("logit_milli") > 0, 1L).otherwise(0L)).as("tp"),
        sum(when(!col("is_pos") && col("logit_milli") > 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("is_pos") && col("logit_milli") <= 0, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("is_pos") && col("logit_milli") <= 0, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_ppm", expr("tp * 1000000 div (tp + fp)"))
      .withColumn("recall_ppm", expr("tp * 1000000 div (tp + fn)"))
      .withColumn("f1_ppm", expr(
        """CAST(CAST(2 AS DECIMAL(38,0)) * tp * 1000000
          | div (CAST(2 AS DECIMAL(38,0)) * tp + fp + fn) AS BIGINT)""".stripMargin))
      .withColumn("accuracy_ppm", expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)"))

  /** Distribution drift between the first and second half of the
    * month, per event type: exact total-variation distance over the
    * 5-unit value histogram, in ppm —
    *
    *   TVD = ½ Σ_b |n_a(b)/N_a − n_b(b)/N_b|
    *       = Σ_b |n_a(b)·N_b − n_b(b)·N_a| / (2·N_a·N_b)
    *
    * the training-data drift monitor (did this source's value
    * distribution move between snapshots?). One combinable
    * (type, bucket) aggregate with period counts as conditional sums,
    * one broadcast join of per-type totals (bounded by |types|), one
    * final per-type aggregate. The cross-multiplied numerator keeps
    * the arithmetic integer-exact (no per-bucket division); N_a·N_b
    * overflows BIGINT at ~10⁹ rows per side, so the final ratio runs
    * in DECIMAL(38,0) like q_gini. */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("in_a"),
        floor(col("value") / 5).cast("long").as("bucket"))
    val byBucket = ev.groupBy("event_type", "bucket")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
    val totals = byBucket.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    byBucket.join(broadcast(totals), Seq("event_type"))
      .groupBy("event_type")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        count(lit(1)).as("n_buckets"),
        // per-bucket cross products hit BIGINT limits at ~10⁹ rows a
        // side (ca·N_b ~ 10¹⁸) — widen BEFORE the multiply, not after
        sum(expr("abs(CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)"))
          .as("num"))
      .withColumn("tvd_ppm", expr(
        """CAST(num * 1000000
          | div (CAST(2 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)""".stripMargin))
      .select("event_type", "n_a", "n_b", "n_buckets", "tvd_ppm")
      .orderBy("event_type")
  }

  /** Operating-point sweep: exact TP/FP/FN + precision/recall/F1 (ppm)
    * at EVERY distinct classifier score as the ≥-threshold — the table
    * a pipeline reads to pick its filter cutoff (the thresholded
    * companion of the threshold-free q_auc / q_pr_auc curves), with the
    * best-F1 row(s) flagged. Same shape discipline as aucScore: one
    * combinable group-by-distinct-score aggregate (output bounded by
    * distinct logits, never corpus-sized), cumulative
    * below-the-threshold counts via the two-phase cell pattern (no
    * single-task global window), totals and the F1 max as 1-row
    * broadcast crossJoins. All-integer ppm — both engines agree
    * bit-for-bit. */
  def f1Sweep(spark: SparkSession, dir: String): DataFrame = {
    val byScore = labeledScores(spark, dir)
      .groupBy(col("logit_milli").as("s"))
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("is_pos"), 1L).otherwise(0L)).as("nn"))
    val tot = byScore.agg(coalesce(sum("np"), lit(0L)).as("tot_pos"),
      coalesce(sum("nn"), lit(0L)).as("tot_neg"))
    val inCell = Window.partitionBy("_c").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    val b = byScore.withColumn("_c", expr("s div 1000"))
    val offsets = b.groupBy("_c")
      .agg(sum("np").as("_np"), sum("nn").as("_nn"))
      .withColumn("_offp", coalesce(sum("_np").over(offW), lit(0L)))
      .withColumn("_offn", coalesce(sum("_nn").over(offW), lit(0L)))
      .select("_c", "_offp", "_offn")
    val swept = b
      .withColumn("_inp", coalesce(sum("np").over(inCell), lit(0L)))
      .withColumn("_inn", coalesce(sum("nn").over(inCell), lit(0L)))
      .join(broadcast(offsets), Seq("_c"))
      .crossJoin(broadcast(tot))
      .withColumn("tp", col("tot_pos") - (col("_offp") + col("_inp")))
      .withColumn("fp", col("tot_neg") - (col("_offn") + col("_inn")))
      .withColumn("fn", col("_offp") + col("_inp"))
      .withColumn("precision_ppm", expr("tp * 1000000 div nullif(tp + fp, 0)"))
      .withColumn("recall_ppm", expr("tp * 1000000 div nullif(tot_pos, 0)"))
      .withColumn("f1_ppm", expr("2 * tp * 1000000 div nullif(2 * tp + fp + fn, 0)"))
    val best = swept.agg(max("f1_ppm").as("_best"))
    swept.crossJoin(broadcast(best))
      .select(col("s").as("thresh_milli"), col("tp"), col("fp"), col("fn"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"),
        (col("f1_ppm") === col("_best")).as("is_best"))
      .orderBy("thresh_milli")
  }
}
