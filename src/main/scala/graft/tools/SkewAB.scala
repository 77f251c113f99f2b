package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Repeated-measures A/B of the two skew-join mitigations on ONE
  * constructed hot-key join: graft's salting utility (ops.SkewJoin)
  * vs AQE's OptimizeSkewedJoin split, each against the unmitigated
  * shuffle join — `runMain graft.tools.SkewAB [rows] [reps]`.
  *
  * The fixture is the canonical pathology: `hotFrac` of the fact rows
  * share one key, the dim is too big to broadcast (and broadcast is
  * disabled anyway so every variant is a real shuffle join). Variants
  * run ROUND-ROBIN (one rep of each per round) so machine drift lands
  * on all arms equally — the same repeated-measures discipline as
  * tools/PairJoinAB — and the report is per-variant medians.
  */
object SkewAB {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000000)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nKeys = 1000000L
    // 90% of fact rows on key 0, the rest uniform over a 1M-key dim
    val fact = spark.range(rows)
      .select(when(col("id") % 10 =!= 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
        (col("id") % 1000).as("payload"))
    val dim = spark.range(nKeys).select(col("id").as("k"),
      (col("id") % 97).as("attr"))
    fact.persist(); dim.persist()
    fact.count(); dim.count()

    def plainJoin(): DataFrame =
      fact.join(dim, Seq("k")).groupBy("attr")
        .agg(count(lit(1)).as("n"), sum("payload").as("s"))
    def saltedJoin(): DataFrame =
      graft.ops.SkewJoin.saltedJoin(fact, dim, "k", 8).groupBy("attr")
        .agg(count(lit(1)).as("n"), sum("payload").as("s"))

    def aqe(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("plain_noaqe", () => { aqe(false); plainJoin() }),
      ("plain_aqe_skewsplit", () => { aqe(true); plainJoin() }),
      ("salted8_noaqe", () => { aqe(false); saltedJoin() }),
      ("salted8_aqe", () => { aqe(true); saltedJoin() }))

    // one warm pass each (codegen/JIT), then round-robin timed reps
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- variants) {
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    // all variants must agree (salting is semantics-free)
    val sums = variants.map { case (n, f) =>
      n -> f().agg(sum("n"), sum("s")).head.toString }
    require(sums.map(_._2).distinct.size == 1,
      s"variant results diverged: $sums")
    for ((name, _) <- variants) {
      val ts = times(name).sorted
      println(f"[skewab] $name%-20s median=${ts(ts.size / 2)}%.2f s " +
        f"min=${ts.head}%.2f max=${ts.last}%.2f reps=$reps rows=$rows")
    }
    spark.stop()
  }
}
