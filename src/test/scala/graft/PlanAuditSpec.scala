package graft

import graft.analytics.Analytics
import graft.etl.EventsEtl

/** Plan-shape regression guards: these properties are what make the
  * queries scale; losing one is a perf bug even while results stay
  * correct. */
class PlanAuditSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("validation predicate pushes into the events parquet scan") {
    val plan = executed(EventsEtl.cleanEvents(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull"),
      s"expected parquet pushdown in:\n${plan.take(2000)}")
  }

  test("q5_region joins all dimensions via broadcast") {
    val plan = executed(Analytics.q5Region(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    // and no sort-merge join anywhere in the star
    assert(!plan.contains("SortMergeJoin"), s"star join fell back to SMJ:\n${plan.take(1500)}")
  }

  test("q1_agg reads only the needed columns") {
    val plan = executed(Analytics.q1Agg(spark, sfDir))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_partkey"),
      s"column pruning regressed: $readSchema")
  }

  test("sessionize shares one hash exchange across windows and aggregation") {
    val plan = executed(Analytics.sessionize(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges")
  }

  test("driver entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("binned interval join plans as an equi-join, not a cartesian/BNLJ") {
    val plan = executed(Analytics.rangeJoinBinned(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a product join:\n${plan.take(1500)}")
  }

  test("moving range-frame window runs off a single hash exchange") {
    val plan = executed(Analytics.movingAgg(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges")
  }

  test("arg-extremes is a plain aggregate — no window, no sort before the agg") {
    val plan = executed(Analytics.argExtremes(spark, sfDir))
    assert(!plan.contains("Window"), s"argExtremes regressed to a window plan:\n${plan.take(1200)}")
  }

  test("blocked embedding dedup forces no broadcast and never degenerates to a product") {
    // at spec SF the planner may legitimately broadcast the small side;
    // the scale property is that nothing FORCES it — with auto-broadcast
    // off the plan must be a pure shuffle join, no hint, no product
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(graft.vector.VectorOps.dedupEmbedding(spark, sfDir))
      assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
        s"all-pairs join forces a data-scaled broadcast/product:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("regex-heavy document scans are repartitioned off the single file split") {
    val plan = executed(graft.text.TextOps.tokenCounts(spark, sfDir))
    assert(plan.linesIterator.exists(_.contains("Exchange hashpartitioning(doc_id")),
      s"document scan lost its parallelizing repartition:\n${plan.take(1500)}")
  }

  test("inverted shingle-index joins run shuffled-hash, never paying merge sorts") {
    for ((name, df) <- Seq(
        "jaccard" -> graft.text.TextOps.dedupNgramJaccard(spark, sfDir),
        "incremental" -> graft.text.TextOps.dedupIncremental(spark, sfDir),
        "contamination" -> graft.text.CorpusOps.contamination(spark, sfDir))) {
      val plan = executed(df)
      assert(plan.contains("ShuffledHashJoin"),
        s"$name index join lost its shuffled-hash hint:\n${plan.take(1200)}")
    }
  }

  test("prefix join: shuffled-hash candidate join, per-doc rank window, no product join") {
    val plan = executed(graft.text.TextOps.jaccardPairsPrefix(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"),
      s"prefix candidate join lost its shuffled-hash hint:\n${plan.take(1200)}")
    // the rarity rank must ride a doc_id exchange, never a global sort
    assert(plan.contains("hashpartitioning(doc_id"),
      s"prefix rank window lost its per-doc partitioning:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join degenerated to a product join:\n${plan.take(1500)}")
  }

  test("capped tfidf/containment: shuffled-hash joins, no product join") {
    for ((name, df) <- Seq(
        "tfidf_capped" -> graft.text.TextOps.tfidfPairsCapped(spark, sfDir, 64L),
        "containment_capped" -> graft.text.TextOps.containmentPairsCapped(spark, sfDir, 64L))) {
      val plan = executed(df)
      assert(plan.contains("ShuffledHashJoin"),
        s"$name candidate join lost its shuffled-hash hint:\n${plan.take(1200)}")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated to a product join:\n${plan.take(1500)}")
    }
  }

  test("ANN graph dedups on the scalar cosine, never the embedding arrays") {
    // the met-via-≤probes-cells dropDuplicates must run AFTER the dot
    // product: its aggregate then carries first(cos) — three scalars
    // through the exchange — instead of first(qe)/first(ce), which
    // would ship both full embedding arrays per candidate row (measured
    // 10.2× vs ~3× on the 3×-replica scale smoke)
    val plan = executed(graft.vector.VectorOps.vecKnnGraphAnn(spark, sfDir))
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(l => l.contains("first(cos")),
      s"pair dedup no longer aggregates the scalar cosine:\n${aggLines.mkString("\n").take(1500)}")
    assert(!aggLines.exists(l => l.contains("first(qe") || l.contains("first(ce")),
      s"pair dedup ships embedding arrays through its exchange:\n${aggLines.mkString("\n").take(1500)}")
  }

  test("capped jaccard candidates fold the partial-intersection bound in the join shuffle") {
    val plan = executed(graft.text.TextOps.jaccardPairsCapped(spark, sfDir, 64L))
    assert(plan.contains("ShuffledHashJoin"),
      s"capped candidate join lost its shuffled-hash hint:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"capped join degenerated to a product join:\n${plan.take(1500)}")
    // the fold that powers the prune-before-verify bound: a count
    // aggregate keyed on the pair (the old distinct() had no function)
    assert(plan.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("count(1)") && l.contains("a_id")),
      s"capped candidates lost the inter_c fold (prune-before-verify):\n${plan.take(2000)}")
  }

  test("seq_pack's corpus-wide window is bucket-partitioned, not single-partition") {
    val plan = executed(graft.text.CorpusOps.seqPack(spark, sfDir))
    assert(plan.contains("hashpartitioning(bucket"),
      s"packing prefix sum lost its bucket partitioning:\n${plan.take(1500)}")
  }

  test("oov coverage joins the bounded vocabulary via broadcast") {
    val plan = executed(graft.text.CorpusOps.oovRate(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"bounded vocab should broadcast:\n${plan.take(1500)}")
  }

  test("backfill runs aggs, spine, join and forward-fill off ONE hash exchange") {
    val plan = executed(EventsEtl.backfillGaps(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(2000)}")
  }

  test("interval merge rides ONE user_id exchange for break, counter, and agg") {
    val plan = executed(graft.analytics.TemporalOps.intervalMerge(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(2000)}")
  }

  test("debounce rides ONE (user, action) exchange for lag, flag-sum, and agg") {
    val plan = executed(EventsEtl.debounce(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(2000)}")
  }

  test("path mining trigrams come from leads, never an array collection") {
    val plan = executed(Analytics.pathMining(spark, sfDir))
    assert(!plan.contains("collect_list"), s"paths regressed to array collection:\n${plan.take(1200)}")
  }

  test("mode per user is two stacked aggregates — no window anywhere") {
    val plan = executed(Analytics.modePerUser(spark, sfDir))
    assert(!plan.contains("Window"), s"mode regressed to a window plan:\n${plan.take(1200)}")
  }

  test("column profile is ONE scan of events — no union of per-column passes") {
    val plan = executed(EventsEtl.profileColumns(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n${plan.take(2000)}")
  }

  test("dq rule engine is ONE scan regardless of rule count") {
    val plan = executed(EventsEtl.dqRules(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n${plan.take(2000)}")
  }

  test("triangle count never plans a cartesian or nested-loop product") {
    val plan = executed(graft.ops.Triangles.triangleCount(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      s"triangle join degenerated:\n${plan.take(1500)}")
    // the only BNLJ allowed is the 1-row tally crossJoin at the top
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"unexpected product joins ($bnlj):\n${plan.take(1500)}")
  }

  test("edit-distance blocking plans as a shuffled hash join, never a product") {
    val plan = executed(graft.ops.RecordLinkage.editDistancePairs(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"),
      s"variant index join lost its SHJ hint:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to an all-pairs product:\n${plan.take(1500)}")
  }

  test("disjunctive join is three equi-joins — no nested-loop OR join") {
    val plan = executed(Analytics.disjunctiveJoin(spark, sfDir))
    // the three 1-row scalar results may legitimately cross-join at the
    // top; the DATA-scaled joins must all be hash equi-joins
    assert(!plan.contains("CartesianProduct"),
      s"OR join degenerated:\n${plan.take(1500)}")
    val hashJoins = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") || l.contains("ShuffledHashJoin")
        || l.contains("SortMergeJoin"))
    assert(hashJoins >= 3, s"expected >=3 equi-joins, got $hashJoins:\n${plan.take(1500)}")
  }

  test("weighted median windows ride ONE exchange over the value histogram") {
    val plan = executed(Analytics.weightedMedian(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one exchange for the (flag, cents) pre-agg, one to co-partition
    // the flag-level windows — and nothing beyond
    assert(hashExchanges <= 2, s"expected <=2 hash exchanges, got $hashExchanges:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("interpolation never joins a calendar table — spine is generated per key") {
    val plan = executed(graft.analytics.TemporalOps.interpolate(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"expected <=2 scans of events, got $scans:\n${plan.take(2000)}")
    assert(plan.contains("Generate explode"), s"spine generation missing:\n${plan.take(1500)}")
  }

  test("bloom dedup probes the filter BEFORE the join, on the corpus side") {
    val plan = executed(graft.text.TextOps.dedupBloom(spark, sfDir))
    // the codegen'd probe must appear as a Filter, not post-join logic
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n${plan.take(2000)}")
    val probeLine = plan.linesIterator.indexWhere(_.contains("bloom_might_contain"))
    val joinLine = plan.linesIterator.indexWhere(_.contains("HashJoin"))
    assert(probeLine > joinLine, // deeper in the tree = printed later? no:
      // executedPlan prints root-first, so the probe (below the join)
      // must appear AFTER the join operator line
      s"bloom probe not below the join (probe@$probeLine join@$joinLine)")
  }

  test("DSIR scores via a shuffled-hash index join, never a sort-merge") {
    val plan = executed(graft.text.CorpusOps.dsirWeights(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"),
      s"vocabulary index join lost the SHJ hint:\n${plan.take(2000)}")
  }

  test("semantic dedup partitions pairs on (cluster, block-pair) — no broadcast of the corpus") {
    val plan = executed(graft.vector.VectorOps.semanticDedup(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"cluster pair search degenerated to a product:\n${plan.take(2000)}")
  }

  test("sketch quantile rollup is two stacked aggregates on one events scan") {
    val plan = executed(Analytics.sketchQuantiles(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 events scan, got $scans")
    assert(plan.contains("kll_agg") && plan.contains("kll_merge_agg"))
  }

  test("weighted sample plans as TakeOrdered per-partition heaps, not a global sort") {
    val plan = executed(graft.text.CorpusOps.sampleWeighted(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k priority sample lost its heap plan:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"top-k sample pays a full range-sort exchange:\n${plan.take(1500)}")
  }

  test("global rank never sorts the full table in one task") {
    val plan = executed(Analytics.globalRank(spark, sfDir))
    // the per-row rank window must carry the bucket hash partition
    // spec — the only single-partition window allowed is the offsets
    // prefix over the ~600-row bucket dimension
    assert(plan.contains("windowspecdefinition(bucket"),
      s"per-row rank window lost its bucket partitioning:\n${plan.take(2000)}")
  }

  test("knn graph forces no broadcast and no product (blocked pair join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(graft.vector.VectorOps.vecKnnGraph(spark, sfDir))
      assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
        s"knn pair scoring degenerated to a product:\n${plan.take(1500)}")
      assert(plan.contains("TopKPerKey"),
        s"knn ranking lost the heap top-k operator:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rfm quintiles carry no data-scaled single-partition window") {
    val plan = executed(Analytics.rfmSegmentation(spark, sfDir))
    // every per-row rank window must be partitioned by the range
    // bucket; the only unpartitioned windows left are the bounded
    // one-row-per-bucket offset prefixes
    assert(plan.contains("windowspecdefinition(_bkt"),
      s"rfm rank windows lost their bucket partitioning:\n${plan.take(2000)}")
    assert(!plan.contains("ntile("),
      s"rfm still plans the global ntile window:\n${plan.take(2000)}")
  }

  test("span dedup coverage window is per-doc and the scan is repartitioned") {
    val plan = executed(graft.text.TextOps.spanDedup(spark, sfDir))
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"span coverage window lost its per-doc partitioning:\n${plan.take(1500)}")
    assert(plan.linesIterator.exists(_.contains("Exchange hashpartitioning(doc_id")),
      s"document scan lost its parallelizing repartition:\n${plan.take(1500)}")
  }

  test("anomaly fences broadcast the per-type stats, never shuffling the corpus twice") {
    val plan = executed(Analytics.robustAnomalies(spark, sfDir))
    assert(plan.contains("BroadcastExchange"),
      s"per-type stat tables lost their broadcast:\n${plan.take(1500)}")
  }

  test("auc running count rides bucket-partitioned windows, not one global sort") {
    val plan = executed(graft.analytics.MlEval.aucScore(spark, sfDir))
    // the in-cell prefix window must be partitioned by the score cell;
    // the only unpartitioned window is the bounded per-cell offset table
    assert(plan.contains("windowspecdefinition(_c"),
      s"auc prefix window lost its cell partitioning:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"),
      s"auc cell offsets lost their broadcast:\n${plan.take(1500)}")
  }

  test("drift broadcasts per-type totals back over the bounded histogram") {
    val plan = executed(graft.analytics.MlEval.drift(spark, sfDir))
    assert(plan.contains("BroadcastExchange"),
      s"drift totals lost their broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"drift histogram join fell back to SMJ:\n${plan.take(1500)}")
  }

  test("outlier distances ride a broadcast centroid join and the heap top-k") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // forced broadcast of the labels×dim centroid arrays must
      // survive auto-broadcast off (it is corpus-constant by design)
      val plan = executed(graft.vector.VectorOps.vecOutliers(spark, sfDir))
      assert(plan.contains("BroadcastExchange"),
        s"centroid arrays lost their forced broadcast:\n${plan.take(1500)}")
      assert(plan.contains("TopKPerKey"),
        s"outlier ranking lost the heap top-k operator:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("knn classifier blocked product forces no data-scaled broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(graft.vector.VectorOps.knnClassify(spark, sfDir))
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"test×train product forces a data-scaled broadcast/product:\n${plan.take(1500)}")
      assert(plan.contains("TopKPerKey"),
        s"neighbor ranking lost the heap top-k operator:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pr-auc rank and prefix windows are cell-partitioned with broadcast offsets") {
    val plan = executed(graft.analytics.MlEval.prAuc(spark, sfDir))
    assert(plan.contains("windowspecdefinition(_c"),
      s"pr-auc prefix window lost its cell partitioning:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"),
      s"pr-auc cell offsets lost their broadcast:\n${plan.take(1500)}")
  }

  test("ks statistic rides the bounded distinct-score table, one struct argmax") {
    val plan = executed(graft.analytics.MlEval.ksStat(spark, sfDir))
    assert(plan.contains("windowspecdefinition(_c"),
      s"ks prefix window lost its cell partitioning:\n${plan.take(2000)}")
    // the argmax is an aggregate over the score table — no rank window
    assert(!plan.contains("row_number"),
      s"ks argmax regressed to a rank window:\n${plan.take(1500)}")
  }

  test("link prediction tail is a TakeOrdered heap, never a product join") {
    val plan = executed(graft.ops.LinkPredict.linkPredict(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 lost the TakeOrdered heap:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/anti joins fell back to a product:\n${plan.take(1500)}")
  }

  test("clamped balance rides ONE user exchange for both windows and the agg") {
    val plan = executed(graft.analytics.Analytics.clampedBalance(spark, sfDir))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1500)}")
  }

  test("bootstrap is one scan into a combinable B-group aggregate — no window") {
    val plan = executed(graft.analytics.Analytics.bootstrap(spark, sfDir))
    assert(!plan.contains("Window"), s"bootstrap regressed to a window plan:\n${plan.take(1200)}")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"bootstrap lost map-side partial aggregation:\n${plan.take(1500)}")
  }

  test("cluster eval forces the corpus-constant centroid broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(graft.vector.VectorOps.clusterEval(spark, sfDir))
      assert(plan.contains("BroadcastExchange"),
        s"centroid arrays lost their forced broadcast:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("value share: one data-scaled hash aggregate, scalar rides a broadcast") {
    val plan = executed(graft.analytics.Analytics.valueShare(spark, sfDir))
    // the (tot, np) scalar joins via broadcast, never a global window
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"global scalar lost its broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"scalar became a global window:\n${plan.take(1200)}")
  }

  test("late blame: semi and anti legs stay equi-keyed, no product join") {
    val plan = executed(graft.analytics.Analytics.lateBlame(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"double correlation fell back to a product join:\n${plan.take(1500)}")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected one semi and one anti leg:\n${plan.take(1500)}")
  }

  test("rrf fusion runs every list stage through the bounded heap operator") {
    val plan = executed(graft.vector.VectorOps.annRrf(spark, sfDir))
    val heaps = plan.linesIterator.count(_.contains("TopKPerKey"))
    // 2 retriever lists + the fused tail, each partial+final = 6 nodes
    assert(heaps >= 3, s"expected heap top-k stages, got $heaps:\n${plan.take(1500)}")
  }

  test("interleave joins the bounded source-index table via broadcast") {
    val plan = executed(graft.text.Curation.interleave(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"source-index table lost its broadcast:\n${plan.take(1500)}")
  }

  test("min-cost decorrelation: fact scanned via aggregates, dims broadcast, no SMJ on dims") {
    val plan = executed(Analytics.minCostSupplier(spark, sfDir))
    // the three dimension joins (part/supplier/nation) ride broadcasts
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3, s"expected >=3 broadcast dim joins, got $bhj:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("top supplier: scalar max rides a 1-row broadcast, the view computes once") {
    val plan = executed(Analytics.topSupplier(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"scalar max lost its broadcast:\n${plan.take(1500)}")
    // the supplier-bounded revenue view is pinned once: the final plan
    // reads the checkpointed view, never re-scanning the fact file for
    // the scalar-max leg
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(scans == 0 && plan.contains("ExistingRDD"),
      s"expected the pinned view, got $scans fact scans:\n${plan.take(1200)}")
  }

  test("active users: distinct fan-out plan has no window and bounded explodes") {
    val plan = executed(Analytics.activeUsers(spark, sfDir))
    assert(!plan.contains("Window"), s"rolling distinct regressed to a window:\n${plan.take(1200)}")
    val gens = plan.linesIterator.count(_.contains("Generate explode"))
    assert(gens == 2, s"expected 2 bounded sequence explodes, got $gens")
  }

  test("f1 sweep windows are cell-partitioned with broadcast offsets and totals") {
    val plan = executed(graft.analytics.MlEval.f1Sweep(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      s"scalar totals lost their broadcast:\n${plan.take(1500)}")
    // the offset/total tables ride broadcast joins
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("skyline running min is cell-partitioned — no one-task global window") {
    val plan = executed(Analytics.skyline(spark, sfDir))
    // the only unpartitioned window runs over the bounded CELL table
    // (one row per qty-range cell), never the distinct-pair table;
    // the offsets join rides a broadcast
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"cell offsets lost their broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("quintile shift: per-week rank rides cells, sizes broadcast, 5x5 rollup") {
    val plan = executed(Analytics.quintileShift(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"week-size table lost its broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("epoch assignment: plan table broadcast, rank cells spread the corpus") {
    val plan = executed(graft.text.CorpusOps.epochAssign(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"plan table lost its broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("vec drift: corpus scanned once for centroids, never joined to itself") {
    val plan = executed(graft.vector.VectorOps.vecDrift(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"drift grew a product join:\n${plan.take(1500)}")
    // the drift join keys on the bounded label table, not vec_id
    assert(!plan.contains("SortMergeJoin"),
      s"bounded label join fell back to SMJ:\n${plan.take(1500)}")
  }

  test("q6_forecast: all predicates push to the lineitem scan, no join, no window") {
    val plan = executed(Analytics.forecastRevenue(spark, sfDir))
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"date predicate did not reach the scan:\n${plan.take(2000)}")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"pure scan-aggregate grew a join/window:\n${plan.take(1500)}")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_returnflag"),
      s"column pruning regressed: $readSchema")
  }

  test("q8_mktshare: dims broadcast; share stays in [0, 1e6]") {
    val plan = executed(Analytics.marketShare(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension broadcast lost:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val rows = Analytics.marketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("mkt_share_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"share out of range: $ppm")
    }
  }

  test("q9_profit: name-filtered part dim broadcast, no product join") {
    val plan = executed(Analytics.productProfit(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"part/supplier broadcast lost:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q12_latesplit: date window pushes to the scan; counts partition the late set") {
    val plan = executed(Analytics.lateShipmentSplit(spark, sfDir))
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"ship-date window did not reach the scan:\n${plan.take(2000)}")
    assert(!plan.contains("Window"))
    // high + low must tile the late-line population exactly
    val rows = Analytics.lateShipmentSplit(spark, sfDir).collect()
    val split = rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    import org.apache.spark.sql.functions._
    val direct = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.sources.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .count()
    assert(split == direct, s"split $split != direct late count $direct")
  }

  test("q19_brand_ranges: disjunction stays residual on ONE equi-join — no BNLJ") {
    val plan = executed(Analytics.brandRangeRevenue(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"OR-predicate forced a product join:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"clause-eligible part prefilter lost its broadcast:\n${plan.take(1500)}")
  }
}
