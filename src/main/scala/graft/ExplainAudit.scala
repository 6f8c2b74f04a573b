package graft
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q6_filtered_revenue", "q13_part_type_revenue", "q1_pricing_summary", "q21_minhash_pairs", "q34_asof_join", "q35_range_join", "q40_token_quantiles", "q44_sequence_packing", "q48_cross_corpus", "q49_minhash_capped", "q50_dup_spans", "q51_source_matrix", "q57_token_mixture", "q62_cross_corpus_capped", "q63_video_frame_dups", "q67_semantic_dedup", "q68_decontam_bloom", "q69_filter_rules", "q70_incremental_dedup", "q71_surprisal", "q72_cluster_best", "q73_data_card", "q83_bm25", "q84_pq_ann", "q85_geo_line_distance", "q86_geo_grid_audit", "q87_pagerank", "q88_bpe_train", "q89_fuzzy_join", "q90_gap_fill", "q95_interval_coverage", "q96_sparse_cosine", "q97_hll_card", "q98_heavy_hitters", "q100_triangles", "q101_containment", "q102_burst", "q104_quality_calibrated", "q105_bigram_surprisal", "q106_funnel", "q107_robust_outliers", "q108_histogram_drift", "q109_event_pivot", "q110_transitions", "q111_hybrid_rrf", "q112_ann_recall", "q113_lsh_recall", "q114_rolling_spend", "q115_retention", "q116_khop_seeds", "q117_mutual_knn", "q118_skyline", "q119_cube_grouping", "q120_zorder_audit", "q121_seasonality", "q122_vocab_growth", "q123_scene_cuts", "q124_itemsets", "q125_ivf_balance", "q126_dataset_split", "q127_seasonal_anomaly", "q128_hll_union", "q129_conversion_latency", "q130_change_point", "q131_quantile_sketch", "q132_unpivot", "q133_salted_join", "q134_assoc_rules", "q135_survivorship", "q136_temporal_dedup", "q137_bpe_encode", "q138_geo_knn", "q139_geo_overlap_area", "q140_bpe_packing", "q141_zonal_stats", "q142_random_projection", "q143_projected_recall", "q144_attribution", "q145_winsorize", "q146_emerging_terms", "q147_label_cosine", "q148_session_paths", "q149_fk_audit", "q150_decayed_engagement", "q151_cluster_sizes", "q152_source_drift", "q153_tokenizer_equity", "q154_detector_agreement", "q155_dataset_checksum", "q156_column_profile", "q157_bpe_encode_loaded", "q158_decontam_bloom_loaded", "q159_skew_advisor", "q160_split_leakage", "q161_temperature_mixture", "q162_k_anonymity", "q163_source_divergence", "q164_snm_pairs", "q165_benford", "q166_matryoshka_recall", "q167_shard_plan", "q168_embedding_coverage", "q169_training_manifest", "q170_hits", "q171_snm_verified", "q172_seeded_pagerank", "q173_lsh_sweep", "q174_snm_recall")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(3000))
    }
    spark.stop()
  }
}
