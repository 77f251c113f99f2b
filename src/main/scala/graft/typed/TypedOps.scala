package graft.typed

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset API over the event stream: case-class rows with
  * compile-time field checks, and a custom `Aggregator` that folds a
  * user's activity summary in one pass (partial-aggregates merge
  * associatively, so map-side combine applies at scale).
  */
object TypedOps {

  final case class Event(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value_cents: Long)

  final case class UserSummary(n: Long, first_us: Long, last_us: Long, sum_cents: Long)

  /** one-pass (count, min ts, max ts, sum) fold */
  object SummaryAgg extends Aggregator[Event, UserSummary, UserSummary] {
    override def zero: UserSummary = UserSummary(0L, Long.MaxValue, Long.MinValue, 0L)
    override def reduce(b: UserSummary, e: Event): UserSummary =
      UserSummary(b.n + 1, math.min(b.first_us, e.ts_us),
        math.max(b.last_us, e.ts_us), b.sum_cents + e.value_cents)
    override def merge(a: UserSummary, b: UserSummary): UserSummary =
      UserSummary(a.n + b.n, math.min(a.first_us, b.first_us),
        math.max(a.last_us, b.last_us), a.sum_cents + b.sum_cents)
    override def finish(r: UserSummary): UserSummary = r
    override def bufferEncoder: Encoder[UserSummary] = Encoders.product[UserSummary]
    override def outputEncoder: Encoder[UserSummary] = Encoders.product[UserSummary]
  }

  def typedEvents(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, dir)
      // ts_us is a non-nullable Long in the case class: a null ts would
      // fail the Event encoder at runtime ("null in non-nullable
      // field"), so exclude invalid rows explicitly — same guard the
      // ETL layer applies
      .filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .as[Event]
  }

  /** Per-user activity summary via the typed Aggregator. */
  def userSummaries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    typedEvents(spark, dir)
      .groupByKey(_.user_id)
      .agg(SummaryAgg.toColumn.name("s"))
      .select(col("key").as("user_id"), col("s.n").as("n"),
        col("s.first_us").as("first_us"), col("s.last_us").as("last_us"),
        col("s.sum_cents").as("sum_cents"))
      .orderBy("user_id")
  }
}
