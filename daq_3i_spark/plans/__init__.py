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
# Round 15 window: the 35 remaining r10-cohort ops hit the 4-round
# staleness horizon and lead unconditionally (census source:
# tools/check_counts.py --census at r14 close — the r14 window pre-drained
# only 9 of the planned 13, so r15 has zero slack; VERDICT r14 #1).  Next,
# one representative per code path whose EXECUTION or ORACLE changed in
# r15: the seven IVF-floor ops whose ORACLE text gained the shadow-CTE
# validity guard (op_sim_ivf_topk, op_sim_kmeans_assign,
# op_sim_ivf_trained_topk, op_sim_ivfpq_topk, op_dedup_semantic,
# op_sim_knn_graph, op_sim_ivf_recall_eval — every wrapped oracle, not one
# rep, since the guard rewrites each oracle's SQL), plus the two ops that
# EXECUTE the rewritten status-snapshot path (replay-safe GC + flat-init
# fallback, streaming/pipeline.py): op_stream_pipeline and op_graceful_stop
# (the latter doubling as an r11 pre-drain).  The remaining 6 slots
# pre-drain the r11 cohort (44 ops, horizon at r16) with the timeseries
# fill family — a coherent block whose local/driver divergence risk is
# shared machinery.  35 + 7 + 2 + 6 = 50; r11 leaves 44-7=37 for r16
# (13 slots of slack for r16 reps and r12/r14 pre-drain, per the
# amortization plan in BENCH_NOTES.md r15).
_CHECK_PRIORITY = [
    # -- (1) the r10 cohort: hits the 4-round horizon, all 35 ---------------
    "op_corpus_curriculum", "op_corpus_dsir_select", "op_corpus_dsir_weights",
    "op_corpus_softdedup_weights", "op_corpus_split_safe",
    "op_corpus_training_shards", "op_dedup_minhash_capped",
    "op_dedup_ngram_capped", "op_embed_outliers", "op_events_ab_ci",
    "op_events_concurrency", "op_events_forecast_naive",
    "op_events_funnel_time", "op_events_markov", "op_events_srm",
    "op_orders_abc_analysis", "op_quality_drift", "op_quality_profile",
    "op_sim_centroid_drift", "op_sql_q12_lateships", "op_sql_q14_promo",
    "op_sql_q15_topsupplier", "op_sql_q19_disjunction", "op_sql_q21_waiting",
    "op_sql_q2_mincost", "op_sql_q6_forecast", "op_sql_setops_all",
    "op_sql_window_range", "op_text_code_detect", "op_timeseries_autocorr",
    "op_timeseries_changepoint", "op_timeseries_gap_census",
    "op_timeseries_outlier_mad", "op_timeseries_seasonal_outlier",
    "op_timeseries_trend",
    # -- (2) r15 changed-path representatives -------------------------------
    "op_sim_ivf_topk", "op_sim_kmeans_assign", "op_sim_ivf_trained_topk",
    "op_sim_ivfpq_topk", "op_dedup_semantic", "op_sim_knn_graph",
    "op_sim_ivf_recall_eval",
    "op_stream_pipeline", "op_graceful_stop",
    # -- (3) r11 pre-drain: the timeseries fill family (6) -------------------
    "op_timeseries_interpolate", "op_timeseries_interpolate_bucketed",
    "op_timeseries_interpolate_multiday", "op_timeseries_locf",
    "op_timeseries_locf_bucketed", "op_timeseries_locf_multiday",
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
