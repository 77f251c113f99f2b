package graft

import org.apache.spark.sql.functions._
import graft.etl.EventsEtl

/** Pipeline-observability gate: CollectMetrics aggregates must ride the
  * load action itself (no second scan) and reconcile exactly with the
  * quarantine split.
  */
class ObserveSpec extends SparkSpec {

  test("observe metrics reconcile with the clean/quarantine split in one action") {
    val (clean, obs) = EventsEtl.observedClean(spark, sfDir)
    val nClean = clean.count() // the single action that populates obs
    val m = obs.get
    val total = graft.sources.Tables.events(spark, sfDir).count()
    val nQuar = EventsEtl.quarantine(spark, sfDir).count()
    assert(m("n_rows") == total)
    assert(m("n_invalid") == nQuar)
    assert(m("n_rows").asInstanceOf[Long] - m("n_invalid").asInstanceOf[Long] == nClean)
    val overMax = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value") > EventsEtl.MaxValue).count()
    assert(m("n_over_max") == overMax)
  }

  test("observed clean output is row-identical to cleanEvents") {
    val (clean, _) = EventsEtl.observedClean(spark, sfDir)
    val base = EventsEtl.cleanEvents(spark, sfDir)
    assert(clean.exceptAll(base).count() == 0)
    assert(base.exceptAll(clean).count() == 0)
  }
}
