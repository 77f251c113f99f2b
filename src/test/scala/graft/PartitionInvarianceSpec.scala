package graft

/** Results must not depend on the cluster layout: the same query on
  * the same data with a different shuffle-partition count has to
  * produce identical rows in identical order. Catches accumulation-
  * order arithmetic, partition-local state leaks, and non-total sort
  * keys — the bugs that pass every fixed-layout test and then corrupt
  * the first production run on different hardware. Exercises the
  * operators with layout-sensitive structure: distributed prefix sum,
  * iterative label propagation, window stacks, block-partitioned
  * products, index joins, ntile. */
class PartitionInvarianceSpec extends SparkSpec {

  test("order-sensitive operators are shuffle-partition-count invariant") {
    val names = Seq("seq_pack", "dedup_cluster", "q_sessionize", "vec_centroid",
      "q_ntile", "dedup_incremental", "dedup_embedding", "q_running_agg",
      "q_corr_moments", "q_pagerank", "etl_incremental_agg",
      "dedup_keep_best", "corpus_split", "corpus_shard", "q_concurrency",
      "q_decay_score", "q_bfs_hops", "q_sketch_rollup",
      // session-5 surface: iterative peeling, checkpointed graph
      // tallies, rank-based bounds, LSH buckets, running windows,
      // top-k limit boundaries — all layout-sensitive shapes
      "q_interval_merge", "q_mode", "q_triangles", "q_kcore", "q_paths",
      "q_winsorize", "q_attribution", "q_skew_profile", "q_basket_lift",
      "q_gini", "q_wow_change", "etl_profile", "etl_debounce",
      "etl_dq_rules", "text_pmi", "text_diversity", "text_zipf",
      "text_dup_coverage", "mm_phash",
      // linkage/interpolation batch: variant-index joins, window
      // stacks over a generated spine, 1-row scalar composition
      "dedup_editdist", "text_containment", "q_interpolate",
      "q_disjunctive", "q_weighted_median", "text_tfidf", "vec_pca",
      "text_top_quality", "q_funnel_time", "text_lm_score", "vec_kmeans",
      // sketch/curation batch: mergeable sketch states (exact regime),
      // cluster-bucketed blocked products, Bloom-pruned joins,
      // vocabulary-quantized integer sums
      "q_sketch_quantiles", "q_theta_sketch", "dedup_semantic",
      "dedup_bloom", "corpus_dsir",
      // sampling/rank/tokenizer batch: top-k limit boundary, two-phase
      // bucket offsets, iterative argmax merge learning
      "sample_weighted", "q_global_rank", "text_bpe_encode",
      "q_theta_retention", "dedup_winnow", "mm_retrieval",
      // continuation-session surface: blocked kNN products + heap
      // top-k, global first-occurrence selection + window coverage,
      // composed pipeline with CC loop, two-phase ntile/rank cells,
      // per-type stat broadcasts, prefix-slice ranking
      "vec_knn_graph", "text_span_dedup", "corpus_curate", "q_rfm",
      "q_anomaly", "vec_mrl_eval", "mm_scene_change",
      "q_trace_downsample",
      // two-phase cell upgrades: rank/prefix offsets must reproduce
      // the window semantics on any layout
      "q_changepoint", "q_ntile", "text_novelty", "text_classifier",
      "ann_bq", "vec_knn_graph_ann", "q_forecast", "sample_diverse",
      // ml-eval batch: two-phase prefix sums (AUC), two-phase decile
      // ranks, blocked kNN product + vote argmax, iterative word-graph
      // ranking
      "q_auc", "q_calibration", "vec_knn_classify", "text_textrank",
      "vec_outliers", "dedup_sweep", "text_filter_cascade",
      "q_spatial_join",
      // round 7: the derived radius (profiling aggregates) and the
      // clustering it feeds must not move with layout
      "q_dbscan_auto",
      // eval-curve batch: two-phase descending ranks + running sums,
      // struct argmax over distinct scores, wedge-join + TakeOrdered
      // boundary, centroid arithmetic from partial sums
      "q_pr_auc", "q_ks_stat", "q_gains", "q_confusion",
      "q_link_predict", "vec_cluster_eval",
      // recurrence/resample batch: stacked prefix windows + struct
      // argmax, hash-deterministic resample weights, broadcast fold
      // ranges over conditional counts
      "q_clamped_balance", "q_bootstrap", "q_ts_cv_folds",
      // relational-shape + fusion batch: semi/anti double correlation,
      // heap top-k list boundaries feeding a full-outer fuse, two-phase
      // per-source ranks, global-scalar broadcast thresholds
      "q_late_blame", "q_value_share", "q_dormant_rich", "ann_rrf",
      "corpus_interleave",
      // interval/weighting batch: session windows + bucket-exploded
      // equi-join dedup, lead-weighted decimal sums, stacked aggregates
      "q_overlap_join", "q_twap", "q_hhi",
      // two-phase rank + running-token admission against a broadcast
      // budget scalar
      "corpus_budget",
      // eval rollups: bounded-table shares/cumsums off broadcast totals
      "text_langid_eval", "q_cohort_ltv", "dedup_cross_source",
      "mm_dedup_cluster", "q_min_cost", "q_top_supplier", "q_parts_supp",
      "q_active_users", "dedup_banding_eval", "q_shortest_path",
      "q_f1_sweep", "vec_drift", "q_order_priority", "q_new_returning",
      "q_top_percent", "q_dbscan", "q14_promo", "q10_returns", "q7_volume",
      "corpus_epochs", "q_skyline", "q_quintile_shift", "q_allocation",
      "q_sql_topk", "q_lead_time", "text_heaps", "dedup_length_profile",
      "q_week_profile", "q_pareto", "linkage_cluster", "q_user_features",
      // round-6 surface: df-capped candidate joins + array-shipped
      // exact verifies, the thinned-plane DBSCAN twin, real-pixel
      // decode/resize/frames (partition-local codec work must not
      // leak layout into output)
      "text_tfidf_capped", "text_containment_capped", "q_dbscan_small",
      "mm_decode", "mm_resize", "mm_frames", "mm_batch_infer")
    for (n <- names) {
      val base = SparkEntry.queries(n)(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val alt = SparkEntry.queries(n)(spark, sfDir).collect().toSeq
        assert(base == alt, s"$n output depends on shuffle partitioning")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
