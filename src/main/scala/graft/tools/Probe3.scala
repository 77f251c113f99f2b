package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe3 {
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
    import graft.text.TextOpsProbe._
    val (shingled, banded) = minhashPieces(spark, dir)
    time("shingled")(println("docs=" + shingled.count()))
    time("banded")(println("banded=" + banded.count()))
    val l = banded.toDF("a_id", "band_id", "band_hash")
    val r = banded.toDF("b_id", "band_id", "band_hash")
    val raw = l.join(r, Seq("band_id", "band_hash")).filter(col("a_id") < col("b_id"))
    time("raw-cand")(println("raw pairs=" + raw.count()))
    val cand = raw.select("a_id", "b_id").distinct()
    time("cand-distinct")(println("cand=" + cand.count()))
    spark.stop()
  }
}
