package graft

import graft.text.{ShingleIndex, TextOps}
import org.apache.spark.sql.functions._

class ShingleIndexSpec extends SparkSpec {

  test("persisted bucketed index: batch join shuffles only the batch side") {
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the point
    try {
      ShingleIndex.build(s, sfDir, "shingle_index_plan")
      val join = ShingleIndex.batchRows(s, sfDir)
        .join(s.table("shingle_index_plan").toDF("e_id", "e_n", "sh"), Seq("sh"))
      val plan = join.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1,
        s"expected ONE exchange (batch side only), got $exchanges:\n${plan.take(1500)}")
      assert(join.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS shingle_index_plan")
    }
  }

  test("admission against the persisted index matches the recomputed-index operator") {
    try {
      ShingleIndex.build(spark, sfDir, "shingle_index_eq")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3))
      val fromIndex = ShingleIndex.admitBatch(spark, sfDir, "shingle_index_eq")
        .collect().map(key).toSeq
      val recomputed = TextOps.dedupIncremental(spark, sfDir)
        .collect().map(key).toSeq
      assert(fromIndex == recomputed)
    } finally spark.sql("DROP TABLE IF EXISTS shingle_index_eq")
  }

  test("index maintenance: appending an admitted batch preserves co-location") {
    val s = spark
    try {
      ShingleIndex.build(s, sfDir, "shingle_index_app")
      val before = s.table("shingle_index_app").count()
      // append the batch's own rows under the same bucket spec
      ShingleIndex.batchRows(s, sfDir)
        .toDF("doc_id", "n_sh", "sh")
        .write.bucketBy(8, "sh").sortBy("sh")
        .mode("append").saveAsTable("shingle_index_app")
      assert(s.table("shingle_index_app").count() > before)
      // still bucket-joinable without shuffling the table side
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val join = ShingleIndex.batchRows(s, sfDir)
          .join(s.table("shingle_index_app").toDF("e_id", "e_n", "sh"), Seq("sh"))
        val exchanges = join.queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("Exchange hashpartitioning"))
        assert(exchanges == 1)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally s.sql("DROP TABLE IF EXISTS shingle_index_app")
  }
}
