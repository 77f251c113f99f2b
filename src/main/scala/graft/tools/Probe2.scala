package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, dir).repartition(32)
    time("baseline-count")(docs.count())
    val words = filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "), w => w =!= "")
    time("words-only")(docs.select(size(words).as("n")).agg(sum("n")).collect())
    val shExpr = when(size(words) >= 3,
      array_distinct(transform(sequence(lit(0), size(words) - 3),
        i => concat_ws(" ", element_at(words, i + 1), element_at(words, i + 2), element_at(words, i + 3)))))
      .otherwise(array().cast("array<string>"))
    time("shingle-hof")(docs.select(size(shExpr).as("n")).agg(sum("n")).collect())
    val shUdf = udf { text: String =>
      val ws = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ").filter(_.nonEmpty)
      if (ws.length < 3) Array.empty[String]
      else ws.sliding(3).map(_.mkString(" ")).toArray.distinct
    }
    time("shingle-udf")(docs.select(size(shUdf(col("text"))).as("n")).agg(sum("n")).collect())
    time("shingle-hof-2nd")(docs.select(size(shExpr).as("n")).agg(sum("n")).collect())
    spark.stop()
  }
}
