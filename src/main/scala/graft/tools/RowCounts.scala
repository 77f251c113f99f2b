package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-cardinality probe for the volume smokes: run named
  * SparkEntry queries against one or more data dirs and print row
  * counts (full rows for tiny reports). Separates "wall grew because
  * the ANSWER grew" (output-bound operators: proximity pairs, dup-pair
  * reports, co-occurrence graphs — any density² output is a property
  * of the data, not the plan) from a genuine plan pathology, which is
  * the judgment the sf3/sf10 smoke tables need. */
object RowCounts {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: RowCounts <query[,query…]> <dataDir> [dataDir…]")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs; n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val c = df.count()
        println(s"[rowcounts] $n\t$dir\t$c")
        if (c <= 12) df.collect().foreach(r => println(s"[rowcounts]   $r"))
      } catch {
        case e: Throwable =>
          // getMessage is null for NPEs and friends — fall back to the
          // class name so the handler can't itself abort the sweep
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          println(s"[rowcounts] $n\t$dir\tERROR ${msg.take(120)}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
