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
}
