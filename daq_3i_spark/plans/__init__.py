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
# Round 16 window: the 37 remaining r11-cohort ops hit the 4-round
# staleness horizon and lead unconditionally (census source:
# tools/check_counts.py --census at r15 close; VERDICT r15 #1).  Next,
# one representative per code path whose EXECUTION changed in r16: the
# two ops that EXECUTE the rewritten status-snapshot machinery (the
# _FULL_SNAPSHOT flat-migration fix, streaming/pipeline.py):
# op_stream_pipeline and op_graceful_stop; plus op_sim_ivf_topk as
# insurance for the IVF oracle-guard splice rewrite (the rendered oracle
# SQL is byte-identical — every call site starts exactly "WITH <name>",
# so the regex consumes the same 5-char prefix the old slice did — but
# the splice code itself changed, so one wrapped oracle re-verifies).
# op_orders_market_basket's EXECUTION changed late in r16 (grouped-array
# pair generation); it is r14-cohort, so it takes one of the r14
# pre-drain slots — changed-path rep and cohort drain in one entry.
# The remaining 10 slots pre-drain per the amortization ledger
# (BENCH_NOTES.md r15): 4 from the r14 cohort (one more than the
# ledgered minimum of 3, easing r17/r18) and 6 from the r12 cohort.
# 37 + 3 + 4 + 6 = 50; r12 leaves 47-6=41 for r17 and r14 leaves
# 47-4=43 for the r17/r18 pre-drain plan.
_CHECK_PRIORITY = [
    # -- (1) the r11 cohort: hits the 4-round horizon, all 37 ---------------
    "op_contamination_check", "op_corpus_clean_pipeline",
    "op_count_per_channel", "op_dedup_exact", "op_dedup_substring",
    "op_dedup_threshold_sweep", "op_filter_enabled", "op_graph_triangles",
    "op_join_channels_buses", "op_join_channels_conversions",
    "op_join_data_channels", "op_join_interval_overlap",
    "op_multimodal_resize", "op_oldest_n_per_channel", "op_pack_sequences",
    "op_pack_sequences_bpe", "op_retention_topk", "op_scan_channel_data",
    "op_scan_config_buses", "op_scan_config_channels",
    "op_session_window_batch", "op_sim_pq_rerank_topk",
    "op_sink_append_channel_data", "op_sink_delete_retention",
    "op_sink_merge_upsert", "op_sink_upsert_status", "op_source_modbus_poll",
    "op_sql_approx_sketches", "op_sql_histogram_quantile",
    "op_sql_q17_smallqty", "op_sql_q20_dominant", "op_stream_anomaly_sketch",
    "op_stream_corpus_ingest", "op_stream_latest_per_channel",
    "op_stream_stale_monitor", "op_text_bpe_tokens", "op_text_scrub",
    # -- (2) r16 changed-path representatives -------------------------------
    "op_stream_pipeline", "op_graceful_stop", "op_sim_ivf_topk",
    # -- (3) r14 pre-drain (4: ledgered minimum 3 + 1; market basket is
    #        also the r16 changed-execution rep for its rewrite) -----------
    "op_orders_market_basket", "op_corpus_domain_mix",
    "op_dedup_cluster_keep", "op_dedup_containment",
    # -- (4) r12 pre-drain (6) ----------------------------------------------
    "op_anomaly_rank_bucketed", "op_asof_join", "op_convert_expr",
    "op_corpus_budget_sample", "op_corpus_dedup_sample",
    "op_corpus_minhash_eval",
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
