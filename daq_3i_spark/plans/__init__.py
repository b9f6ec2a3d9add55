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
# rotated each round: lead with the cohort hitting the 4-round staleness
# horizon (tools/check_counts.py --census is authoritative), then ops whose
# EXECUTION changed this round so rewrites get fresh canonical rows, then
# the stalest of the next cohort.
#
# Round 14 window: the whole r9 cohort (37 ops) hits the staleness horizon
# and leads — driver rows are the only staleness cure, so it takes 37 slots
# unconditionally (census source: tools/check_counts.py --census at r13
# close).  Next, per the r12/r13 precedent, one representative per code path
# whose EXECUTION or ORACLE changed in r14 (displacing r10 fillers, never r9
# leads): op_dedup_simhash (62-bit simhash + 4x16-bit bands — semantics AND
# oracle changed), op_stream_pipeline (hash-bucketed status upsert + version
# GC + crash-safe compaction swap), op_dedup_semantic (null-safe salt-grid
# sizes join — covers op_dedup_embedding/op_sim_knn_graph — plus the IVF
# oracle validity guard), op_sim_ivf_topk (the guard on the ivf/kmeans/pq
# family's oracles, inherited by op_sim_ivf_recall_eval).  The remaining 9
# slots pre-drain the r10 cohort (44 ops, hits the horizon at r15):
# stateful/banded ops first (streaming monitors, the MinHash-LSH family,
# zorder, phash) since a driver row is worth most where local and driver
# environments can diverge.  37 + 4 + 9 = 50; 35 r10 ops remain for r15
# (fits its 50 slots with room for r15's own changed-op reps).
_CHECK_PRIORITY = [
    # -- (1) the r9 cohort: hits the 4-round horizon, all 37 ---------------
    "op_rollup_incremental", "op_stream_rollup_refresh",
    "op_source_modbus_sim", "op_sink_compaction", "op_stream_due_filter",
    "op_stream_session_window", "op_stream_window_agg",
    "op_stream_window_sliding",
    "op_multimodal_decode", "op_multimodal_features",
    "op_events_rfm", "op_orders_market_basket", "op_sample_weighted",
    "op_anomaly_rank", "op_rollup_hourly", "op_corpus_domain_mix",
    "op_text_bm25", "op_text_lm_score", "op_text_vocab",
    "op_timeseries_downsample", "op_window_agg_events", "op_window_sliding",
    "op_sql_q1", "op_sql_q3_topk", "op_sql_q5_region", "op_sql_q7_volume",
    "op_sql_q8_market_share", "op_sql_q10_returned", "op_sql_q11_topvalue",
    "op_sql_q22_idle_rich", "op_sql_cube", "op_sql_rollup",
    "op_sql_grouping_sets", "op_sql_having_bigorders", "op_sql_json",
    "op_sql_scalar_subquery", "op_sql_window_suite",
    # -- (2) r14 changed-path representatives --------------------------------
    "op_dedup_simhash", "op_stream_pipeline", "op_dedup_semantic",
    "op_sim_ivf_topk",
    # -- (3) r10 pre-drain: 9 stalest-next, stateful/banded first ------------
    "op_stream_forecast_monitor", "op_stream_trend", "op_sink_zorder",
    "op_multimodal_phash", "op_dedup_minhash",
    "op_dedup_minhash_incremental", "op_dedup_ngram_jaccard",
    "op_dedup_containment", "op_dedup_cluster_keep",
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
