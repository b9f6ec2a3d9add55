"""Benchmark runner — the driver's per-round BENCH_r{N}.json feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints exactly ONE JSON line on stdout:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect skew); a warmup pass runs first so JVM/codegen warmup
doesn't land on the first timed query.  All Spark chatter stays on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# The headline set: the flagship DAQ pipeline, the scan/join/agg-heavy SQL
# surface, and one of each extension-op family (dedup / similarity / text).
HEADLINE = [
    "flagship_pipeline",
    "op_sink_append_channel_data",
    "op_latest_per_channel",
    "op_retention_topk",
    "op_decode_registers",
    "op_sql_q1",
    "op_sql_q3_topk",
    "op_sql_q5_region",
    "op_sql_window_rank",
    "op_dedup_exact",
    "op_dedup_minhash",
    "op_dedup_ngram_jaccard",
    "op_dedup_embedding",
    "op_sim_topk",
    "op_sim_lsh_topk",
    "op_text_stats",
    "op_text_quality",
    "op_window_agg_events",
    "op_session_window_batch",
    "op_stream_pipeline",
    "op_sql_q9_profit",
    "op_sql_quantiles",
    "op_sim_ivf_topk",
    "op_text_bm25",
    "op_dedup_components",
    "op_sim_kmeans_assign",
    "op_sim_ivf_trained_topk",
    "op_stream_session_window",
    "op_pack_sequences",
    "op_contamination_check",
    "op_text_repetition",
    "op_corpus_training_shards",
    "op_dedup_minhash_capped",
    "op_sql_kmv_sketch",
    "op_sql_histogram_quantile",
    "op_text_scrub",
    "op_dedup_ngram_capped",
    "op_dedup_substring",
    "op_corpus_budget_sample",
    "op_rollup_incremental",
    "op_sql_q2_mincost",
    "op_sql_q21_waiting",
    "op_text_lm_score",
    "op_stream_rollup_refresh",
    "op_sim_ivfpq_topk",
    "op_sim_pq_topk",
    "op_sql_q12_lateships",
    "op_sql_q20_dominant",
    "op_sql_window_suite",
    "op_timeseries_interpolate",
    "op_timeseries_locf",
    "op_sql_cm_sketch",
    "op_corpus_dedup_sample",
    "op_anomaly_rank",
    "op_sql_approx_sketches",
    "op_sim_pq_rerank_topk",
    "op_sink_retention_time",
    "op_timeseries_interpolate_bucketed",
    "op_timeseries_locf_bucketed",
    "op_dedup_semantic",
    "op_stream_stale_monitor",
    "op_timeseries_interpolate_multiday",
    "op_stream_anomaly_sketch",
    "op_sink_compaction",
    "op_anomaly_rank_bucketed",
    "op_sink_time_travel",
    "op_dedup_incremental",
    "op_dedup_minhash_incremental",
    "op_stream_dedup_ingest",
    "op_sink_zorder",
    "op_quality_constraints",
    "op_source_orc_roundtrip",
    "op_source_schema_evolution",
    "op_sink_merge_upsert",
    "op_events_funnel",
    "op_events_cohort_retention",
    "op_join_scd2",
    "op_corpus_split",
    "op_corpus_dsir_weights",
    "op_corpus_dsir_select",
    "op_sink_change_feed",
    "op_events_ohlc",
    "op_events_topk_paths",
    "op_events_attribution",
    "op_graph_pagerank",
    "op_corpus_domain_mix",
    "op_stream_ohlc",
    "op_timeseries_ema",
    "op_sim_knn_graph",
    "op_join_bloom_prefilter",
    "op_sample_weighted",
    "op_timeseries_rate",
    "op_timeseries_outlier_mad",
    "op_timeseries_downsample",
    "op_events_concurrency",
    "op_text_tfidf_topterms",
    "op_multimodal_phash",
    "op_events_ab_lift",
    "op_timeseries_seasonal",
    "op_stream_late_drop",
    "op_events_burst",
    "op_text_langid_confusion",
    "op_events_rfm",
    "op_corpus_minhash_eval",
    "op_events_streaks",
    "op_embed_centroids",
    "op_events_dau_wau",
    "op_orders_market_basket",
    "op_dedup_containment",
    "op_dedup_cluster_keep",
    "op_timeseries_trend",
    "op_timeseries_seasonal_outlier",
    "op_timeseries_autocorr",
    "op_stream_trend",
    "op_corpus_split_safe",
    "op_sql_window_range",
    "op_events_markov",
    "op_orders_abc_analysis",
    "op_quality_drift",
    "op_corpus_softdedup_weights",
    "op_timeseries_changepoint",
    "op_events_forecast_naive",
    "op_embed_outliers",
    "op_stream_forecast_monitor",
    "op_quality_profile",
    "op_text_code_detect",
    "op_sim_ivf_recall_eval",
    "op_events_srm",
    "op_timeseries_gap_census",
    "op_graph_triangles",
    "op_events_funnel_time",
    "op_sim_centroid_drift",
    "op_corpus_curriculum",
    "op_events_ab_ci",
    "op_join_interval_overlap",
    "op_sql_setops_all",
    "op_dedup_threshold_sweep",
    "op_text_bpe_tokens",
    "op_pack_sequences_bpe",
]


def main() -> None:
    from pyspark.sql import functions as F

    from daq_3i_spark.session import get_spark
    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.cache import release_shared

    spark = get_spark("daq_3i_bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    def run(name: str) -> float:
        # JVM GC between timed queries: a 20-query session accumulates
        # broadcast/codegen garbage, and a collection landing inside a timed
        # query shows up as a 3-4x outlier (observed on the embedding ops)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # multi-consumer sub-plans are tracked lazy caches (cache.shared);
        # dropping them between queries keeps the session's memory flat and
        # every timed run cold (a warm cache would hide the derivation cost)
        release_shared()
        return dt

    def run_calibration() -> float:
        # fixed-cost synthetic probe, independent of SF_DIR and of any
        # operator: hash + sum over a generated range saturates all cores
        # exactly like the real queries do.  Its round-over-round ratio IS
        # the shared-microVM host-window factor (BENCH_NOTES r9: byte-
        # identical plans moved 117 -> 198 s within one session) —
        # tools/bench_guard.py divides per-query ratios by it so the guard
        # flags operator slides, not host weather.
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        (
            # ~1 s of saturated hashing at local[32] — long enough that the
            # measured ratio reflects sustained host speed, short enough to
            # add ~5 s to the whole bench (warmup + 4 bracketing runs)
            spark.range(0, 3_200_000_000, 1, int(CPUS))
            .select(F.xxhash64("id").alias("h"))
            # avg, not sum: 3.2G 64-bit hashes overflow a BIGINT sum under
            # ANSI mode; the double average does the same per-row work
            .agg(F.avg("h"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    # warmup pass over EVERY query: JVM JIT + codegen + parquet footer caches
    # land outside the timed pass (per-query variance otherwise dominates the
    # small queries)
    run_calibration()
    for name in names:
        run(name)

    # two interleaved timed passes, keep the per-query MIN: the host is a
    # shared microVM and CPU-steal bursts show up as 3-10x outliers on
    # arbitrary queries (observed: the same scan-agg at 2.6s and 10.4s in
    # back-to-back runs).  The min of independent passes estimates the
    # machine-unloaded cost; interleaving keeps one burst from hitting the
    # same query twice.  The calibration probe brackets each pass (start +
    # end) so the recorded host factor covers the same window as the minima.
    passes: dict[str, list[float]] = {n: [] for n in names}
    cal_times: list[float] = []
    for _ in range(2):
        cal_times.append(run_calibration())
        for name in names:
            passes[name].append(run(name))
        cal_times.append(run_calibration())
    timings = {n: round(min(ts), 4) for n, ts in passes.items()}
    calibration = round(min(cal_times), 4)
    # the driver keeps only a 2000-byte stdout tail (r5's record was lost to
    # it, and at 84 queries even a 2-decimal full dict is ~2.4 KB): the wire
    # carries the most expensive queries first and stops at a 1900-byte
    # budget, so the recorded line is always parseable; value stays the true
    # ALL-query total and BENCH_FULL.json (committed) always has every
    # query at full precision — BENCH_NOTES.md documents the convention
    # 1 decimal on the wire (r17 VERDICT #8): fits ~2x more queries in the
    # 1900-byte budget, so a query that merely got FASTER no longer falls
    # off the emitted set and reads as "dropped_from_bench" in PERF.
    # BENCH_FULL*.json keeps full precision for every query.
    wire = {n: round(v, 1) for n, v in timings.items()}
    by_cost = sorted(wire, key=lambda n: (-wire[n], n))
    while (
        len(json.dumps({"metric": "headline_queries_total", "value": 9999.99,
                        "unit": "sec", "queries": {n: wire[n] for n in by_cost},
                        "n_total": len(wire), "n_emitted": len(by_cost),
                        "calibration_sec": 9999.99,
                        "sf": 0.1}, separators=(",", ":"))) > 1900
        and by_cost
    ):
        by_cost.pop()
    n_emitted = len(by_cost)
    wire = {n: wire[n] for n in sorted(by_cost)}
    # worst/best ratio across passes — an honest noise indicator for the
    # recorded minima (>>1 means steal bursts hit that query)
    spread = {n: round(max(ts) / min(ts), 2) for n, ts in passes.items()}

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # n_total/n_emitted make the wire self-describing: the recorded tail
    # says how many per-query times were cut by the 1900-byte budget
    # (BENCH_FULL.json always has all of them at full precision)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": wire,
        "n_total": len(timings),
        "n_emitted": n_emitted,
        # NOT part of value: the fixed-cost host-speed probe for
        # tools/bench_guard.py's cross-round normalization
        "calibration_sec": calibration,
        "sf": sf_val,
    }
    # The driver records only a bounded tail of stdout; at 54 queries the
    # r5 line (queries + pass_spread) outgrew it and BENCH_r05.json ended up
    # "parsed": null.  Keep the stdout line compact (no spread, no spaces,
    # ~1.9 KB) and write the full record — including the noise indicator —
    # to BENCH_FULL.json beside the repo for the judge.
    full = dict(out, queries=timings, pass_spread=spread)
    # cpu-suffixed record for non-default core counts (r17 VERDICT #6): the
    # driver's 8-core scaling run was silently clobbering the committed
    # 32-core round record.  BENCH_FULL.json stays the 32-core convention.
    full_name = "BENCH_FULL.json" if CPUS == "32" else f"BENCH_FULL_c{CPUS}.json"
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), full_name)
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
