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
# rotated each round.  Round 8 window (VERDICT r7 "Next round" #1): after r7,
# 39 registry ops had never been inside the driver's window (every one of
# them passes the identical local DuckDB hash gate — tools/verify_contract.py
# and tests/test_oracle_parity.py).  The r8 window is (1) those 39, leading
# with the most intricate (stream_ohlc, phash, pagerank, late_drop,
# concurrency, bloom); (2) the 8-op cohort whose latest check is round 4
# (op_sink_partitioned_scan, op_multimodal_frames, op_text_langid_ngram,
# op_sim_kmeans_assign, op_sim_ivf_trained_topk, op_sql_q4_priority,
# op_sql_unpivot, op_stream_dedup_keys); (3) three ops semantically touched
# this round — op_corpus_budget_sample and op_corpus_dedup_sample (LCG key
# pre-reduction, ADVICE r7) and op_sink_compaction (manifest-based partition
# sizing, ADVICE r7).  39 + 8 + 3 = 50.
#
# r9 rotation plan (staleness-ordered, so the canonical record converges to
# <=2-round staleness): after this window lands, the oldest cohort is the 45
# ops whose latest check is round 5 — lead r9 with any op touched in r8,
# then: op_stream_due_filter, op_source_modbus_sim, op_dedup_ngram_capped,
# op_corpus_budget_sample*, op_sim_pq_topk, op_sim_ivfpq_topk,
# op_text_lm_score, op_text_bm25, op_window_agg_events, op_stream_window_agg,
# op_window_sliding, op_stream_window_sliding, op_stream_session_window,
# op_rollup_hourly, op_anomaly_rank, op_sql_window_suite,
# op_rollup_incremental, op_stream_rollup_refresh, op_sql_cm_sketch,
# op_sql_q1, op_sql_q3_topk, op_sql_q5_region, op_sql_rollup, op_sql_cube,
# op_sql_running_sum, op_sql_scalar_subquery, op_sql_json,
# op_sql_having_bigorders, op_sql_grouping_sets, op_sql_q7_volume,
# op_sql_q8_market_share, op_sql_q9_profit, op_sql_q10_returned,
# op_sql_q11_topvalue, op_sql_q14_promo, op_sql_q15_topsupplier,
# op_sql_q19_disjunction, op_sql_q22_idle_rich, op_sql_q6_forecast,
# op_sql_q2_mincost, op_sql_q12_lateships, op_sql_q21_waiting
# (* = re-checked in r8, drops out), then round-6-checked ops as slots allow.
_CHECK_PRIORITY = [
    # -- (1a) never driver-checked, most intricate first ----------------------
    "op_stream_ohlc", "op_multimodal_phash", "op_graph_pagerank",
    "op_stream_late_drop", "op_events_concurrency", "op_join_bloom_prefilter",
    # -- (1b) never driver-checked: incremental/streaming dedup + sink/source
    "op_dedup_incremental", "op_dedup_minhash_incremental",
    "op_stream_dedup_ingest", "op_sink_zorder", "op_sink_merge_upsert",
    "op_sink_change_feed", "op_source_orc_roundtrip",
    "op_source_schema_evolution", "op_quality_constraints", "op_join_scd2",
    "op_corpus_split",
    # -- (1c) never driver-checked: the r7 analytics wave ----------------------
    "op_events_funnel", "op_events_cohort_retention", "op_events_ohlc",
    "op_events_topk_paths", "op_events_attribution", "op_corpus_domain_mix",
    "op_timeseries_ema", "op_sim_knn_graph", "op_sample_weighted",
    "op_timeseries_rate", "op_timeseries_outlier_mad",
    "op_text_tfidf_topterms", "op_events_ab_lift", "op_timeseries_seasonal",
    "op_events_burst", "op_text_langid_confusion", "op_events_rfm",
    "op_corpus_minhash_eval", "op_events_streaks", "op_embed_centroids",
    "op_events_dau_wau", "op_orders_market_basket",
    # -- (2) latest check is round 4 ------------------------------------------
    "op_sink_partitioned_scan", "op_multimodal_frames", "op_text_langid_ngram",
    "op_sim_kmeans_assign", "op_sim_ivf_trained_topk", "op_sql_q4_priority",
    "op_sql_unpivot", "op_stream_dedup_keys",
    # -- (3) semantically touched this round ----------------------------------
    "op_corpus_budget_sample", "op_corpus_dedup_sample", "op_sink_compaction",
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
