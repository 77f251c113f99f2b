package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the two-level IVF assignment: group-size
  * skew of the coarse layer, home-cell occupancy under flat vs routed
  * assignment, and the scored-pair cardinality each induces — the
  * numbers that decide whether a slow auto-kNN wall is assignment
  * work or join fan-out. */
object TlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", expr("vec_norm(e)"))
      .filter(col("nrm") > 0)
    val n = base.count()
    val nlist = graft.vector.VectorOps.deriveNlist(n, 128L)
    println(s"[tlprobe] n=$n nlist=$nlist")
    val t0 = System.nanoTime()
    val cents = graft.vector.VectorOps.trainCentroidsK(spark, dir, nlist)
    println(f"[tlprobe] train ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val idx = graft.functions.TwoLevel.build(cents)
    val sizes = idx.members.map(_.length).sorted
    println(s"[tlprobe] g=${idx.supers.length} p=${idx.p} " +
      s"memberSizes min=${sizes.head} med=${sizes(sizes.length / 2)} " +
      s"max=${sizes.last} top5=${sizes.takeRight(5).mkString(",")}")
    import org.apache.spark.sql.GraftPlanBridge.{column => exCol, expression => exExpr}
    def occStats(name: String, cellCol: org.apache.spark.sql.Column): Unit = {
      val t = System.nanoTime()
      val occ = base.withColumn("cell", cellCol)
        .groupBy("cell").agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("cells"), max("m").as("maxOcc"),
          expr("sum(m*m)").as("sumSq")).head()
      println(f"[tlprobe] $name cells=${occ.getLong(0)} maxOcc=${occ.getLong(1)} " +
        f"sumSq=${occ.getLong(2)} assignWall=${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    occStats("flat", exCol(graft.functions.NearestCell(exExpr(col("e")), cents)))
    occStats("tl  ", element_at(
      exCol(graft.functions.TwoLevelCells(exExpr(col("e")), idx, 1)), 1))
    for (p <- Seq(6, 8, 12)) {
      val idxP = graft.functions.TwoLevel.build(cents, p)
      occStats(s"tl$p ", element_at(
        exCol(graft.functions.TwoLevelCells(exExpr(col("e")), idxP, 1)), 1))
    }
    // full-pipeline walls, both routings on the SAME derived nlist
    def fullWall(name: String, twoLevel: Boolean): Unit = {
      val t = System.nanoTime()
      val c = graft.vector.VectorOps
        .knnGraphAnnImpl(spark, dir, 5, 3, Some(nlist), twoLevel)
        .count()
      println(f"[tlprobe] full-$name rows=$c wall=${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    fullWall("flat", twoLevel = false)
    fullWall("tl", twoLevel = true)
    fullWall("flat2", twoLevel = false)
    fullWall("tl2", twoLevel = true)
    spark.stop()
  }
}
