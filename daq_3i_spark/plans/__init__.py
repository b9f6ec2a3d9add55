from daq_3i_spark.plans.registry import QUERIES, QueryDef, register, spark_queries, oracle_map  # noqa: F401

# importing the op modules populates the registry
import daq_3i_spark.plans.reference_ops  # noqa: F401,E402
import daq_3i_spark.plans.extension_ops  # noqa: F401,E402
import daq_3i_spark.plans.extension_ops2  # noqa: F401,E402
import daq_3i_spark.plans.sql_surface  # noqa: F401,E402
import daq_3i_spark.plans.sql_surface2  # noqa: F401,E402
import daq_3i_spark.plans.sql_surface3  # noqa: F401,E402
import daq_3i_spark.plans.streaming_ops  # noqa: F401,E402
import daq_3i_spark.plans.format_ops  # noqa: F401,E402
import daq_3i_spark.plans.corpus_ops  # noqa: F401,E402
import daq_3i_spark.plans.analytics_ops  # noqa: F401,E402

# The driver's correctness sweep checks the FIRST 50 queries() entries in
# dict order (CORRECTNESS_r01.json is exactly registry entries 0-49).  To get
# every registry entry oracle-verified across rounds, the checked window is
# rotated each round.  Round 7 window (VERDICT r6 "Next round" #1 — the
# canonical record lags the code for ops last checked in r1/r3/r4):
# (1) ops new or semantically touched this round — the bucketed anomaly
# twin, and the two sink services rewritten onto the versioned-manifest
# protocol; (2) the three leads the verdict names: op_text_repetition
# (rewritten r6, last checked r4) and decode/convert (r4); (3) all 24 ops
# whose latest check is round 1; (4) all 17 ops whose latest check is
# round 3; (5) three more r4-checked ops.  Still r4-checked after this
# round (rotate in r8): op_sink_partitioned_scan, op_multimodal_frames,
# op_text_langid_ngram, op_sim_kmeans_assign, op_sim_ivf_trained_topk,
# op_sql_q4_priority, op_sql_unpivot, op_stream_dedup_keys; also rotate
# in the never-driver-checked r7 additions op_dedup_incremental,
# op_dedup_minhash_incremental, op_stream_dedup_ingest, op_sink_zorder,
# op_source_orc_roundtrip, op_quality_constraints,
# op_source_schema_evolution, op_sink_merge_upsert, op_events_funnel,
# op_events_cohort_retention, op_join_scd2, op_corpus_split,
# op_sink_change_feed; and the 23 analytics-batch additions (also never
# driver-checked): op_events_ohlc, op_events_topk_paths,
# op_events_attribution, op_graph_pagerank, op_corpus_domain_mix,
# op_stream_ohlc, op_timeseries_ema, op_sim_knn_graph,
# op_join_bloom_prefilter, op_sample_weighted, op_timeseries_rate,
# op_timeseries_outlier_mad, op_events_concurrency,
# op_text_tfidf_topterms, op_multimodal_phash, op_events_ab_lift,
# op_timeseries_seasonal, op_stream_late_drop, op_events_burst,
# op_text_langid_confusion, op_events_rfm, op_corpus_minhash_eval, op_events_streaks,
# op_embed_centroids, op_events_dau_wau, op_orders_market_basket.
# Every registry entry is oracled (tools/check_counts.py pins the doc
# counts) and passes the exact-compare local gate (tools/verify_contract.py)
# before this ordering.
_CHECK_PRIORITY = [
    # -- (1) new or touched this round ---------------------------------------
    "op_anomaly_rank_bucketed", "op_sink_compaction", "op_sink_retention_time",
    "op_sink_time_travel",
    # -- (2) verdict leads: code moved after their last driver check ---------
    "op_text_repetition", "op_decode_registers", "op_convert_expr",
    # -- (3) latest check is round 1 -----------------------------------------
    "op_sink_truncate_status", "op_filter_dirty", "op_project_columns",
    "op_filter_status_key", "op_join_enrich_stream", "op_sign_extend",
    "op_sched_tick", "op_heartbeat", "op_status_per_channel",
    "op_error_handling", "op_join_salted", "op_dedup_simhash",
    "op_dedup_ngram_jaccard", "op_dedup_embedding", "op_sim_topk",
    "op_sim_lsh_topk", "op_text_stats", "op_text_tokens", "op_text_langid",
    "op_text_quality", "op_multimodal_pack", "op_asof_join", "op_range_join",
    "op_text_chunk",
    # -- (4) latest check is round 3 -----------------------------------------
    "op_text_fingerprint", "op_sql_semi_anti", "op_sql_setops",
    "op_sql_window_rank", "op_sql_pivot", "op_sql_distinct_agg",
    "op_sql_q13_distribution", "op_sql_exists", "op_sql_notin_countdistinct",
    "op_text_vocab", "op_sample_stratified", "op_embed_quantize",
    "op_text_bigrams", "op_sim_ivf_topk", "op_sql_quantiles",
    "op_source_csv_roundtrip", "op_source_json_roundtrip",
    # -- (5) round-4 cohort (continued in r8) --------------------------------
    "op_sim_range_search", "op_stream_stream_join",
]


def _rotate_check_window() -> None:
    unknown = [n for n in _CHECK_PRIORITY if n not in QUERIES]
    if unknown:
        # a real raise, not an assert: `python -O` strips asserts, which
        # would silently restore the typo-shrinks-the-window failure mode
        # this guard exists to prevent
        raise RuntimeError(
            f"_CHECK_PRIORITY names not in the registry: {unknown} — a typo "
            "here silently shrinks the driver-checked window"
        )
    ordered = {n: QUERIES[n] for n in _CHECK_PRIORITY}
    for name, q in QUERIES.items():
        if name not in ordered:
            ordered[name] = q
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_check_window()
