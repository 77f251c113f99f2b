package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** EXACT heavy hitters at stream scale via the two-pass
  * candidates-then-verify pattern: pass 1 runs a Misra-Gries summary
  * (k counters — FIXED memory per task, mergeable, Agarwal et al.,
  * "Mergeable Summaries", PODS'12) whose output is guaranteed to
  * contain every item with frequency > n/(k+1); pass 2 exactly counts
  * ONLY the ≤ k candidates and applies the real threshold. Because
  * threshold (n/30) > guarantee bound (n/501), the composed answer is
  * exact — the oracle is the plain GROUP BY/HAVING — while per-task
  * state stays k entries no matter how large the corpus or vocabulary
  * grows (a plain groupBy-then-filter shuffles the whole vocabulary;
  * this shuffles k-entry summaries and then only candidate rows).
  */
object HeavyHitters {
  /** Counter budget. Completeness contract: the final threshold must
    * exceed n/(Counters+1) — with cnt·30 > n, 1/30 > 1/501 always. */
  val Counters = 500

  /** Misra-Gries: bounded-size frequency summary. reduce is the
    * textbook step (increment / insert / global decrement); merge adds
    * counters then subtracts the (k+1)-th largest count from all —
    * the mergeability construction that keeps total error ≤ n/(k+1).
    */
  case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], w: String): Map[String, Long] =
      m.get(w) match {
        case Some(c) => m.updated(w, c + 1L)
        case None if m.size < k => m.updated(w, 1L)
        case None => // decrement-all: drop counters that hit zero
          m.collect { case (key, c) if c > 1L => key -> (c - 1L) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toArray.sortWith(_ > _).apply(k) // (k+1)-th largest
        sum.collect { case (w, c) if c > cut => w -> (c - cut) }
      }
    }

    override def finish(m: Map[String, Long]): Array[String] = m.keys.toArray.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Array[String]] =
      ExpressionEncoder[Array[String]]()
  }

  /** corpus token stream (same canonicalization as the text operators /
    * the DuckDB oracle), spread over all cores. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(explode(filter(
        split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "),
        w => w =!= "")).as("word"))

  /** Words above 1/30 of total token mass, exactly. */
  def heavyWords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens(spark, dir)
    // pass 1: bounded-memory candidate generation (≤ k strings reach
    // the driver — config-bounded like the IVF sample, not data-scaled)
    val candidates: Array[String] =
      toks.as[String].select(MisraGries(Counters).toColumn).head()
    // pass 2: ONE scan yields both the exact candidate counts and the
    // total token mass — non-candidates collapse into a single NULL
    // group, so n_total is the sum over the (k+1)-row grouped result
    // (the previous shape read the token stream twice more: once for
    // the total, once for the counts)
    val grouped = toks
      .groupBy(when(col("word").isin(candidates.toIndexedSeq: _*), col("word"))
        .as("cw"))
      .agg(count(lit(1)).as("cnt"))
    grouped
      .withColumn("n_total",
        sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("cw").isNotNull && col("cnt") * 30 > col("n_total"))
      .select(col("cw").as("word"), col("cnt"))
      .orderBy(col("cnt").desc, col("word"))
  }
}
