"""sf0.1 -> sf1 scaling pass (VERDICT r5 #6): run the scaled-table headline
ops at both scales, print per-query ratios, flag super-linear ones.

Data grows 10x; a healthy plan's runtime ratio is well under 10 (fixed
job-startup overhead dominates small queries).  Anything ABOVE the data
ratio means super-linear work (quadratic pair generation, per-row driver
work, broadcast flipping to shuffle) and is flagged.

    python tools/make_sf1.py && python tools/scaling_pass.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".tmp", "sf1")

# headline ops over the SCALED tables only (TPC-H + events/channel_data);
# corpus-table ops are excluded — see tools/make_sf1.py docstring
OPS = [
    "flagship_pipeline",
    "op_sink_append_channel_data",
    "op_latest_per_channel",
    "op_retention_topk",
    "op_decode_registers",
    "op_sql_q1",
    "op_sql_q3_topk",
    "op_sql_q5_region",
    "op_sql_window_rank",
    "op_window_agg_events",
    "op_session_window_batch",
    "op_stream_pipeline",
    "op_sql_q9_profit",
    "op_sql_quantiles",
    "op_stream_session_window",
    "op_sql_kmv_sketch",
    "op_sql_histogram_quantile",
    "op_rollup_incremental",
    "op_sql_q2_mincost",
    "op_sql_q21_waiting",
    "op_stream_rollup_refresh",
    "op_sql_q12_lateships",
    "op_sql_q20_dominant",
    "op_sql_window_suite",
    "op_timeseries_interpolate",
    "op_timeseries_interpolate_bucketed",
    "op_timeseries_locf",
    "op_timeseries_locf_bucketed",
    "op_anomaly_rank",
    "op_anomaly_rank_bucketed",
    "op_sink_retention_time",
    "op_sink_time_travel",
    "op_sink_zorder",
    "op_quality_constraints",
    "op_sink_merge_upsert",
    "op_events_funnel",
    "op_events_cohort_retention",
    "op_join_scd2",
    "op_sink_change_feed",
    "op_stream_stale_monitor",
    "op_stream_late_drop",
    "op_events_ohlc",
    "op_stream_ohlc",
    "op_timeseries_ema",
    "op_events_topk_paths",
    "op_events_attribution",
    "op_events_concurrency",
    "op_events_ab_lift",
    "op_events_burst",
    "op_events_rfm",
    "op_events_streaks",
    "op_events_dau_wau",
    "op_orders_market_basket",
    "op_timeseries_seasonal",
    "op_graph_pagerank",
    "op_join_bloom_prefilter",
    "op_timeseries_rate",
    "op_timeseries_outlier_mad",
    "op_timeseries_downsample",
    "op_timeseries_trend",
    "op_timeseries_seasonal_outlier",
    "op_timeseries_autocorr",
    "op_stream_trend",
    # r10 additions over the scaled channel_data/events/lineitem tables
    "op_sql_window_range",
    "op_events_markov",
    "op_orders_abc_analysis",
    "op_quality_drift",
    "op_timeseries_changepoint",
    "op_timeseries_gap_census",
    "op_events_srm",
    "op_events_ab_ci",
    "op_join_interval_overlap",
    "op_sql_setops_all",
    "op_graph_triangles",
    "op_events_funnel_time",
    "op_sim_centroid_drift",
    "op_events_forecast_naive",
    "op_stream_forecast_monitor",
    "op_quality_profile",
    # documents-driven families (documents scale 10x via the per-copy token
    # suffix — linear candidate growth; see tools/make_sf1.py)
    "op_dedup_threshold_sweep",
    "op_text_bpe_tokens",
    "op_pack_sequences_bpe",
    "op_dedup_exact",
    "op_dedup_minhash",
    "op_dedup_minhash_capped",
    "op_dedup_incremental",
    "op_dedup_minhash_incremental",
    "op_stream_dedup_ingest",
    "op_dedup_simhash",
    "op_dedup_ngram_jaccard",
    "op_dedup_ngram_capped",
    "op_dedup_containment",
    "op_dedup_substring",
    "op_dedup_components",
    "op_dedup_cluster_keep",
    "op_corpus_split_safe",
    "op_corpus_softdedup_weights",
    "op_text_code_detect",
    "op_corpus_curriculum",
    "op_text_stats",
    "op_text_quality",
    "op_text_scrub",
    "op_text_lm_score",
    "op_text_bm25",
    "op_text_repetition",
    "op_pack_sequences",
    "op_contamination_check",
    "op_corpus_training_shards",
    "op_corpus_budget_sample",
    "op_corpus_dedup_sample",
    "op_corpus_clean_pipeline",
    "op_corpus_domain_mix",
    "op_corpus_dsir_weights",
    "op_corpus_dsir_select",
    "op_sample_weighted",
    "op_text_tfidf_topterms",
    "op_multimodal_phash",
    "op_text_langid_confusion",
    "op_corpus_minhash_eval",
    # r9 additions: the remaining BENCH_FULL top-30 + sink/format services
    # over the scaled channel_data/events tables
    "op_sink_compaction",
    "op_sink_partitioned_scan",
    "op_stream_anomaly_sketch",
    "op_timeseries_interpolate_multiday",
    "op_timeseries_locf_multiday",
    "op_source_csv_roundtrip",
    "op_source_json_roundtrip",
    "op_source_orc_roundtrip",
    "op_source_schema_evolution",
    # embeddings-driven families — scalable since make_sf1 replicates
    # vectors with per-copy dimension ROTATION (cells spread like a real
    # 10x corpus; an unrotated copy stacked identical populations and
    # measured the replication artifact instead of the plan)
    "op_sim_topk",
    "op_embed_outliers",
    "op_sim_ivf_recall_eval",
    "op_sim_range_search",
    "op_sim_lsh_topk",
    "op_sim_ivf_topk",
    "op_sim_ivf_trained_topk",
    "op_sim_kmeans_assign",
    "op_sim_pq_topk",
    "op_sim_ivfpq_topk",
    "op_sim_pq_rerank_topk",
    "op_sim_knn_graph",
    "op_dedup_embedding",
    "op_dedup_semantic",
    "op_embed_centroids",
    "op_embed_quantize",
    # r9 completion sweep: every remaining registry op — mostly sub-second
    # scans/filters/joins and SQL aggregates (ratios dominated by fixed job
    # startup), plus the streaming replays (constant per-batch machinery)
    "op_stream_window_agg",
    "op_stream_window_sliding",
    "op_stream_due_filter",
    "op_source_modbus_sim",
    "op_multimodal_decode",
    "op_multimodal_features",
    "op_window_sliding",
    "op_rollup_hourly",
    "op_sql_cm_sketch",
    "op_sql_rollup",
    "op_sql_cube",
    "op_sql_running_sum",
    "op_sql_scalar_subquery",
    "op_sql_json",
    "op_sql_having_bigorders",
    "op_sql_grouping_sets",
    "op_sql_q7_volume",
    "op_sql_q8_market_share",
    "op_sql_q10_returned",
    "op_sql_q11_topvalue",
    "op_sql_q19_disjunction",
    "op_sql_q22_idle_rich",
    "op_sql_q6_forecast",
    "op_sql_q14_promo",
    "op_sql_q15_topsupplier",
    "op_scan_config_buses",
    "op_scan_config_channels",
    "op_source_modbus_poll",
    "op_scan_channel_data",
    "op_sink_upsert_status",
    "op_sink_truncate_status",
    "op_sink_delete_retention",
    "op_filter_enabled",
    "op_filter_due",
    "op_filter_dirty",
    "op_project_columns",
    "op_filter_status_key",
    "op_join_channels_buses",
    "op_join_channels_conversions",
    "op_join_data_channels",
    "op_join_enrich_stream",
    "op_count_per_channel",
    "op_oldest_n_per_channel",
    "op_convert_expr",
    "op_sign_extend",
    "op_sched_tick",
    "op_heartbeat",
    "op_status_per_channel",
    "op_error_handling",
    "op_join_salted",
    "op_text_tokens",
    "op_text_langid",
    "op_text_fingerprint",
    "op_multimodal_pack",
    "op_asof_join",
    "op_range_join",
    "op_text_chunk",
    "op_text_vocab",
    "op_sample_stratified",
    "op_text_bigrams",
    "op_multimodal_resize",
    "op_multimodal_frames",
    "op_text_langid_ngram",
    "op_sql_semi_anti",
    "op_sql_setops",
    "op_sql_pivot",
    "op_sql_distinct_agg",
    "op_sql_q13_distribution",
    "op_sql_exists",
    "op_sql_notin_countdistinct",
    "op_sql_q17_smallqty",
    "op_sql_approx_sketches",
    "op_sql_q4_priority",
    "op_sql_unpivot",
    "op_stream_latest_per_channel",
    "op_stream_stream_join",
    "op_stream_dedup_keys",
    "op_graceful_stop",
    "op_stream_corpus_ingest",
    "op_corpus_split",
]


def main() -> None:
    from daq_3i_spark.session import get_spark
    from daq_3i_spark.plans import QUERIES

    spark = get_spark("scaling_pass", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    from daq_3i_spark.cache import release_shared

    def run(name: str, sf_dir: str) -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_shared()  # drop tracked shared() caches; keep runs cold + memory flat
        return dt

    only = set(sys.argv[1:])
    results = {}
    for name in OPS:
        if name not in QUERIES or (only and name not in only):
            continue
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            run(name, sf_dir)  # warm
            row[label] = round(min(run(name, sf_dir) for _ in range(2)), 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        flag = "  <-- SUPER-LINEAR" if row["ratio"] > 10 else ""
        print(f"{name:38s} {row['sf0.1']:7.3f}s {row['sf1']:8.3f}s  x{row['ratio']:<6}{flag}", flush=True)
        _flush(only, dict(results))

    results = _flush(only, results)
    if results:
        print(json.dumps({"n": len(results), "worst": max(r["ratio"] for r in results.values())}))
    else:
        print(json.dumps({"n": 0, "error": "no ops matched the filter"}))
    spark.stop()


def _flush(only: set, results: dict) -> dict:
    """Write the sweep record, merging targeted runs into the existing file.

    Called after EVERY op (not just at exit) so a hung op or a killed run
    loses one measurement, not the whole sweep.  A FILTERED run must not
    shrink the recorded sweep (tools/scaling_guard fails on measurements
    that disappear): merge targeted results into the existing record; full
    runs replace it."""
    out = os.path.join(ROOT, ".tmp", "scaling_pass.json")
    if only and os.path.exists(out):
        with open(out) as fh:
            merged = json.load(fh)
        merged.update(results)
        results = merged
    tmp = out + ".new"
    with open(tmp, "w") as fh:
        json.dump(results, fh, indent=1)
    os.replace(tmp, out)
    return results


if __name__ == "__main__":
    main()
