package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for the named queries (or
  * a default headline set) so scan pushdown (`PushedFilters`), column
  * pruning (`ReadSchema`), join strategies and WholeStageCodegen spans can
  * be reviewed. Usage: runMain graft.Explain [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_projection", "q03_pushdown_filter", "q13_upsert_keep_last",
        "j01_broadcast_join", "j02_star_join_revenue", "q1_agg", "g01_rollup",
        "d03_minhash_pairs", "s01_ann_bruteforce", "s04_ann_ivf",
        "s03_cosine_neardup", "t08_seq_pack",
        "j05_asof_join", "j06_range_join", "b01_bloom_decontaminate",
        "s07_label_centroids", "s08_knn_classify", "t18_apply_mixture",
        "d07_span_dedup", "z01_zorder_layout", "t19_importance",
        "c02_scd2_history", "c03_apply_cdc", "g04_grouping_sets",
        "s09_semantic_dedup", "t21_bigram_lm", "z02_shard_layout",
        "m05_frame_neardup", "c04_snapshot_diff", "a05_bottomk_sample",
        "w05_range_window",
        "s11_pca_project", "c06_cluster_reps", "t23_overlap_frac",
        "t24_importance_resample", "j08_asof_tolerance", "e04_event_debounce",
        "d10_neardup_free", "s14_knn_graph",
        "s15_graph_rank", "s16_knn_hubness", "s17_hard_negatives",
        "c11_leakage_safe_split", "t25_bpe_pairs", "z05_epoch_shuffle",
        "s19_ann_ivfpq", "t26_quality_classify", "j09_interval_overlap",
        "t28_weighted_sample", "z06_hilbert_layout", "s20_robust_scale",
        "t29_pack_efficiency", "t30_boilerplate_lines",
        "s21_diverse_select", "t31_lang_confusion", "c12_curation_funnel",
        "m06_frame_jaccard", "z08_hilbert_nd", "s22_ann_index_persist",
        "c13_incremental_clusters",
        "c18_pareto_frontier", "c19_quantile_normalize", "c20_budget_select",
        "c22_ks_drift", "d16_fuzzy_decontaminate", "g09_path_analysis",
        "g10_rfm_segments", "g11_attribution", "s30_label_propagation",
        "s31_personalized_pagerank", "s32_ann_join", "t36_zipf_fit",
        "t38_bpe_encode", "t39_kneser_ney")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
