package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.text.TextOps
    // pieces of the jaccard pipeline
    val docs = graft.sources.Tables.documents(spark, dir)
    val words = filter(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "), w => w =!= "")
    val sh = when(size(words) >= 3,
      array_distinct(transform(sequence(lit(0), size(words) - 3),
        i => concat_ws(" ", element_at(words, i + 1), element_at(words, i + 2), element_at(words, i + 3)))))
      .otherwise(array().cast("array<string>"))
    val s = docs.select(col("doc_id"), sh.as("shingles")).filter(size(col("shingles")) > 0)
    time("shingle-compute")(s.count())
    val ex = s.select(col("doc_id"), size(col("shingles")).as("n_sh"), explode(col("shingles")).as("sh"))
    time("explode")(ex.count())
    val a = ex.toDF("a_id", "a_n", "sh"); val b = ex.toDF("b_id", "b_n", "sh")
    val pairs = a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
    time("pair-join-count")(println("pairs=" + pairs.count()))
    val g = pairs.groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("inter"))
    time("group")(g.count())
    time("full-jaccard")(TextOps.dedupNgramJaccard(spark, dir).count())
    time("full-minhash")(TextOps.dedupMinhash(spark, dir).count())
    spark.stop()
  }
}
