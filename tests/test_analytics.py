"""Semantic invariants for the analytics batch (plans/analytics_ops.py).

Oracle parity (test_oracle_parity) already proves Spark == DuckDB for these
ops; the tests here pin properties parity can't see — invariants of the
ALGORITHM (rank-mass conservation, bar ordering, lookback bounds) that a
plausible-but-wrong rewrite of BOTH sides could still break together.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from daq_3i_spark.plans import QUERIES
from daq_3i_spark.plans.analytics_ops import _PR_SCALE


def test_ohlc_bar_invariants(spark, sf_dir):
    rows = QUERIES["op_events_ohlc"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
        # a single-event bar collapses to one price
        if r.n_events == 1:
            assert r.open == r.close == r.high == r.low
        # bucket boundary sits on the 15-minute grid
        assert r.bucket_us % (15 * 60 * 1_000_000) == 0


def test_topk_paths_shape(spark, sf_dir):
    rows = QUERIES["op_events_topk_paths"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    # ordered by users desc with path tie-break, each path <= 3 steps
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True)
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3


def test_attribution_totals(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_events

    out = QUERIES["op_events_attribution"].spark(spark, sf_dir).collect()
    n_purchases = (
        load_events(spark, sf_dir).filter(F.col("event_type") == "purchase").count()
    )
    # every purchase lands in exactly one attribution bucket
    assert sum(r.n_conversions for r in out) == n_purchases
    # purchases never self-attribute
    assert all(r.touch_type != "purchase" for r in out)


def test_pagerank_mass_and_determinism(spark, sf_dir):
    df = QUERIES["op_graph_pagerank"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 100 and rows
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # floored integer arithmetic only LOSES mass: total stays within
    # (1 - ~floor losses) .. 1.0 of the scaled unit mass even though the
    # top-100 cut means we can't see the whole distribution at large sf;
    # at test sf the node count is < 100 so the cut is total
    if len(rows) < 100:
        total = sum(ranks)
        assert total <= _PR_SCALE
        assert total >= int(_PR_SCALE * 0.98)
    # bit-stable across a rebuild (exact integer path, no float sums)
    again = QUERIES["op_graph_pagerank"].spark(spark, sf_dir).collect()
    assert rows == again


def test_domain_mix_rebalances(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    before = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    out = QUERIES["op_corpus_domain_mix"].spark(spark, sf_dir)
    after = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    mn = min(before.values())
    for lang, n_before in before.items():
        n_after = after.get(lang, 0)
        # never upsamples, and the minority language is kept ~whole while
        # majority languages land near the minority count (hash threshold
        # is approximate: allow a generous band around mn)
        assert n_after <= n_before
        assert n_after <= mn * 1.5 + 10
        assert n_after >= mn * 0.5 - 10
    # deterministic manifest: same selection on a rebuild
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in QUERIES["op_corpus_domain_mix"].spark(spark, sf_dir).collect()
    )
    assert ids1 == ids2


def test_stream_ohlc_matches_batch(spark, sf_dir):
    batch = {
        (r.event_type, r.bucket_us): r
        for r in QUERIES["op_events_ohlc"].spark(spark, sf_dir).collect()
    }
    stream = QUERIES["op_stream_ohlc"].spark(spark, sf_dir).collect()
    assert len(stream) == len(batch)
    for r in stream:
        b = batch[(r.event_type, r.bucket_us)]
        assert (r.open, r.close, r.high, r.low, r.n_events, r.volume) == (
            b.open,
            b.close,
            b.high,
            b.low,
            b.n_events,
            b.volume,
        )


def test_ema_head_and_bounds(spark, sf_dir):
    rows = QUERIES["op_timeseries_ema"].spark(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_ch = defaultdict(list)
    for r in rows:
        by_ch[r.channel_id].append(r)
    from daq_3i_spark.sources.daq_dims import channel_data_df

    vals = {
        (r.channel_id, r.id): r.value
        for r in channel_data_df(spark, sf_dir).collect()
    }
    for ch, rs in by_ch.items():
        rs.sort(key=lambda r: (r.ts_us, r.id))
        # first sample: EMA == the sample itself (renormalized head window)
        first_v = vals[(ch, rs[0].id)]
        assert abs(rs[0].ema - first_v) < 1e-6
        lo, hi = min(vals[(ch, r.id)] for r in rs), max(vals[(ch, r.id)] for r in rs)
        # a convex combination never leaves the value envelope
        for r in rs:
            assert lo - 1e-9 <= r.ema <= hi + 1e-9


def test_knn_graph_shape(spark, sf_dir):
    from daq_3i_spark.plans.analytics_ops import _KNN_K

    rows = QUERIES["op_sim_knn_graph"].spark(spark, sf_dir).collect()
    assert rows
    seen = {}
    for r in rows:
        assert r.vec_id != r.nbr_id
        assert 1 <= r.rank <= _KNN_K
        assert -1.000001 <= r.cos_sim <= 1.000001
        seen.setdefault(r.vec_id, []).append((r.rank, r.cos_sim))
    for _, nb in seen.items():
        nb.sort()
        ranks = [x[0] for x in nb]
        assert ranks == list(range(1, len(nb) + 1))
        sims = [x[1] for x in nb]
        # rank order is similarity order (desc)
        assert sims == sorted(sims, reverse=True)


def test_bloom_prefilter_selectivity(spark, sf_dir):
    """The bloom stage itself (before the exact refine) must pass every true
    match and reject the bulk of non-matches — the property the oracle hash
    (result == plain semi join) cannot see."""
    from daq_3i_spark.plans.analytics_ops import (
        _BLOOM_K,
        _BLOOM_M,
        _BLOOM_PRICE,
    )
    from daq_3i_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    true_keys = {
        r.o_orderkey
        for r in orders.filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_orderkey")
        .collect()
    }
    # recompute the bloom decision in python with the same xxhash positions
    probe = li.select("l_orderkey").distinct()
    bits = set()
    kdf = spark.createDataFrame([(k,) for k in sorted(true_keys)], "k long")
    pos_rows = kdf.select(
        *[
            (F.pmod(F.xxhash64(F.lit(j), F.col("k")), F.lit(_BLOOM_M)) + j * _BLOOM_M).alias(f"p{j}")
            for j in range(_BLOOM_K)
        ]
    ).collect()
    for r in pos_rows:
        for j in range(_BLOOM_K):
            bits.add(r[f"p{j}"])
    probe_rows = probe.select(
        "l_orderkey",
        *[
            (F.pmod(F.xxhash64(F.lit(j), F.col("l_orderkey")), F.lit(_BLOOM_M)) + j * _BLOOM_M).alias(f"p{j}")
            for j in range(_BLOOM_K)
        ]
    ).collect()
    passed = {
        r.l_orderkey
        for r in probe_rows
        if all(r[f"p{j}"] in bits for j in range(_BLOOM_K))
    }
    probe_keys = {r.l_orderkey for r in probe_rows}
    # no false negatives
    assert true_keys & probe_keys <= passed
    # real pruning: false-positive rate under 20% of the non-matching keys
    non_match = probe_keys - true_keys
    fp = len(passed - true_keys)
    assert fp <= max(5, 0.2 * len(non_match))


def test_weighted_sample_bias(spark, sf_dir):
    sel = QUERIES["op_sample_weighted"].spark(spark, sf_dir).collect()
    assert sel
    from daq_3i_spark.sources.tables import load_table

    all_rows = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
        )
        .collect()
    )
    mx = max(r.n_tokens for r in all_rows)
    # max-length docs are kept with probability 1
    sel_ids = {r.doc_id for r in sel}
    for r in all_rows:
        if r.n_tokens == mx:
            assert r.doc_id in sel_ids
    # the sample is token-biased: mean tokens of kept > mean of all
    mean_all = sum(r.n_tokens for r in all_rows) / len(all_rows)
    mean_sel = sum(r.n_tokens for r in sel) / len(sel)
    assert mean_sel > mean_all


def test_rate_against_naive(spark, sf_dir):
    from daq_3i_spark.sources.daq_dims import channel_data_df

    rows = QUERIES["op_timeseries_rate"].spark(spark, sf_dir).collect()
    assert rows
    raw = sorted(
        channel_data_df(spark, sf_dir).collect(),
        key=lambda r: (r.channel_id, r.ts, r.id),
    )
    naive = {}
    prev = {}
    for r in raw:
        p = prev.get(r.channel_id)
        ts_us = int(r.ts.timestamp() * 1_000_000)
        if p is not None and ts_us > p[0]:
            naive[(r.channel_id, r.id)] = (r.value - p[1]) * 1e6 / (ts_us - p[0])
        prev[r.channel_id] = (ts_us, r.value)
    assert len(rows) == len(naive)
    for r in rows:
        assert abs(r.rate_per_s - naive[(r.channel_id, r.id)]) < 1e-9


def test_mad_outliers_on_spiked_fixture(spark):
    """A constant series with one spike: MAD must flag exactly the spike
    (stddev-based z-scores famously fail this — the spike inflates sigma)."""
    import dataclasses

    from daq_3i_spark.plans.analytics_ops import op_timeseries_outlier_mad

    rows = [(i, 1, f"2024-01-10 00:{i:02d}:00", 10.0 + (0.001 * (i % 3))) for i in range(30)]
    rows.append((99, 1, "2024-01-10 01:00:00", 500.0))
    df = spark.createDataFrame(rows, "id long, channel_id int, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    import daq_3i_spark.sources.daq_dims as dims

    orig = dims.channel_data_df
    try:
        dims.channel_data_df = lambda s, sf: df
        out = {r.channel_id: r for r in op_timeseries_outlier_mad(spark, "unused").collect()}
    finally:
        dims.channel_data_df = orig
    r = out[1]
    assert r.n_samples == 31
    assert r.n_outliers == 1
    assert abs(r.median - 10.001) < 0.01


def test_concurrency_sweep_invariants(spark, sf_dir):
    rows = sorted(
        QUERIES["op_events_concurrency"].spark(spark, sf_dir).collect(),
        key=lambda r: r.ts_us,
    )
    assert rows
    # concurrency is always >= 1 at a boundary instant (the boundary's own
    # session contains it) and the curve ends by closing every session
    assert all(r.concurrent >= 1 for r in rows)
    from daq_3i_spark.sources.tables import load_events

    # peak concurrency can never exceed the number of distinct users
    n_users = load_events(spark, sf_dir).select("user_id").distinct().count()
    assert max(r.concurrent for r in rows) <= n_users


def test_tfidf_prefers_rare_terms(spark, sf_dir):
    rows = QUERIES["op_text_tfidf_topterms"].spark(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # score formula holds: tf * ((N * 1e6) DIV df)
    n = _n_docs_cached(spark, sf_dir)
    assert max(r.df for r in rows) <= n
    for r in rows:
        assert r.score == r.tf * ((n * 1_000_000) // r.df)


def _n_docs_cached(spark, sf_dir, _c={}):
    if sf_dir not in _c:
        from daq_3i_spark.sources.tables import load_table

        _c[sf_dir] = load_table(spark, sf_dir, "documents").count()
    return _c[sf_dir]


def test_phash_duplicate_detection(spark, sf_dir):
    """Exact-duplicate texts share identical byte images, so hamming 0 —
    every such pair must be linked; and the keeper is always the min id."""
    from daq_3i_spark.sources.tables import load_table

    out = {r.doc_id: r for r in QUERIES["op_multimodal_phash"].spark(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    by_prefix = {}
    for d in docs:
        by_prefix.setdefault(d.text.encode()[:64], []).append(d.doc_id)
    for _, ids in by_prefix.items():
        if len(ids) > 1:
            keep = min(ids)
            for i in ids:
                if i != keep:
                    assert out[i].dup_of is not None and out[i].dup_of <= keep
    for r in out.values():
        assert r.is_kept == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.doc_id


def test_ab_lift_consistency(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_events

    row = QUERIES["op_events_ab_lift"].spark(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = load_events(spark, sf_dir)
    n_users = ev.select("user_id").distinct().count()
    assert r.users_a + r.users_b == n_users
    assert 0 <= r.conv_a <= r.users_a and 0 <= r.conv_b <= r.users_b
    assert r.rate_a_ppm == r.conv_a * 1_000_000 // r.users_a
    # the split is roughly balanced (md5 bucket, not id parity)
    assert abs(r.users_a - r.users_b) < 0.3 * n_users + 10


def test_seasonal_profile_envelope(spark, sf_dir):
    rows = QUERIES["op_timeseries_seasonal"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.minute_of_day < 1440
        assert r.min_value <= r.avg_value <= r.max_value
        assert r.n_samples >= 1


def test_burst_gate_is_exact(spark, sf_dir):
    rows = QUERIES["op_events_burst"].spark(spark, sf_dir).collect()
    for r in rows:
        assert r.trailing_hours >= 12
        # the integer cross-multiplied gate: n/nb-average exceeded 2x
        assert r.n * r.trailing_hours > 2 * r.trailing_total


def test_rfm_census_totals(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_events

    rows = QUERIES["op_events_rfm"].spark(spark, sf_dir).collect()
    n_buyers = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.users for r in rows) == n_buyers
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_minhash_eval_recall_floor(spark, sf_dir):
    """Banding recall on true near-dups must be high: at tau=0.4 the 4x4
    banding catches a >=0.4-Jaccard pair unless all four bands miss —
    on this corpus the duplicates are near-identical, so pin >= 0.9."""
    r = QUERIES["op_corpus_minhash_eval"].spark(spark, sf_dir).collect()[0]
    assert r.n_hits + r.n_missed == r.n_true
    if r.n_true:
        assert r.n_hits / r.n_true >= 0.9


def test_streaks_are_maximal_and_consecutive(spark, sf_dir):
    rows = QUERIES["op_events_streaks"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        span = (r.run_end - r.run_start).days + 1
        assert span == r.run_days >= 3


def test_centroid_shape_and_counts(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_table

    rows = QUERIES["op_embed_centroids"].spark(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_by_label = {r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    dims = len(emb.select("embedding").first()[0])
    by_label = {}
    for r in rows:
        assert r.n == n_by_label[r.label]
        by_label.setdefault(r.label, set()).add(r.dim)
    for label, ds in by_label.items():
        assert ds == set(range(1, dims + 1))


def test_dau_wau_bounds(spark, sf_dir):
    rows = QUERIES["op_events_dau_wau"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau
        assert 0 < r.stickiness_ppm <= 1_000_000
        assert r.stickiness_ppm == r.dau * 1_000_000 // r.wau


def test_market_basket_pairs_sane(spark, sf_dir):
    rows = QUERIES["op_orders_market_basket"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    supports = [r.n_ab for r in rows]
    assert supports == sorted(supports, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= 2
        assert r.lift_ppm > 0


def test_downsample_envelope_invariants(spark, sf_dir):
    """Per (channel, bucket): exactly one 'min' and one 'max' row, min value
    <= max value, both are REAL samples from the feed, and the envelope
    compresses (row count << input count at sf0.001's 15-min buckets)."""
    import pyspark.sql.functions as F

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.sources.daq_dims import channel_data_df

    df = QUERIES["op_timeseries_downsample"].spark(spark, sf_dir)
    rows = df.collect()
    per_key: dict[tuple, dict] = {}
    for r in rows:
        per_key.setdefault((r["channel_id"], r["bucket_start_s"]), {})[r["kind"]] = r
    for key, kinds in per_key.items():
        assert set(kinds) == {"min", "max"}, f"{key}: {set(kinds)}"
        assert kinds["min"]["value"] <= kinds["max"]["value"]
        assert kinds["min"]["n_pts"] == kinds["max"]["n_pts"]
    assert len(rows) == 2 * len(per_key), "exactly min+max per occupied bucket"
    # output is bounded by buckets, not samples: at sf0.001 the feed is too
    # sparse to compress (1 pt/bucket), but the 2-per-bucket bound is the
    # scale contract — a day of 1 Hz data (86 400 pts) renders as 192 rows
    cd = channel_data_df(spark, sf_dir)
    # extremes are genuine samples: set-subtract back to the feed is empty
    # (a 1-point bucket legitimately emits the same sample as min AND max,
    # so this is a set check, not a multiset one)
    feed = cd.select("channel_id", "ts", "value")
    missing = df.select("channel_id", "ts", "value").subtract(feed)
    assert missing.count() == 0


def test_markov_transitions_constructed(spark):
    """op_events_markov on a constructed stream: counts match the hand
    transitions, rows are conditioned on from_type (probs per from_type sum
    to 1 as exact small-integer ratios), and cross-user boundaries never
    produce a transition."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_events_markov

    rows = [
        # user 1: A -> B -> A -> C
        (1, "2024-01-01 10:00:00", 1, "A"),
        (2, "2024-01-01 10:01:00", 1, "B"),
        (3, "2024-01-01 10:02:00", 1, "A"),
        (4, "2024-01-01 10:03:00", 1, "C"),
        # user 2: B -> A  (no cross-user C->B edge from user 1's tail)
        (5, "2024-01-01 09:00:00", 2, "B"),
        (6, "2024-01-01 09:30:00", 2, "A"),
        # user 3: single event, no transitions
        (7, "2024-01-01 08:00:00", 3, "C"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_events", lambda s, d: ev
    ):
        out = {
            (r["from_type"], r["to_type"]): r
            for r in op_events_markov(spark, "unused").collect()
        }
    assert {k: v["n_trans"] for k, v in out.items()} == {
        ("A", "B"): 1, ("B", "A"): 2, ("A", "C"): 1,
    }
    assert out[("A", "B")]["prob"] == 0.5 and out[("A", "C")]["prob"] == 0.5
    assert out[("B", "A")]["prob"] == 1.0


def test_abc_classes_partition_by_cumulative_share(spark, sf_dir):
    """op_orders_abc_analysis invariants: every part classified exactly once,
    classes are contiguous in cum_share (max A < min B < min C), boundaries
    honor the 80/95 cuts, and cum_share is monotone ending at exactly 1.0."""
    from daq_3i_spark.plans import QUERIES

    rows = QUERIES["op_orders_abc_analysis"].spark(spark, sf_dir).collect()
    by_cls: dict[str, list] = {}
    for r in rows:
        by_cls.setdefault(r["abc_class"], []).append(r["cum_share"])
    assert set(by_cls) <= {"A", "B", "C"} and "A" in by_cls
    if "B" in by_cls:
        assert max(by_cls["A"]) <= 0.8 < min(by_cls["B"])
    if "C" in by_cls:
        assert max(by_cls.get("B", by_cls["A"])) <= 0.95 < min(by_cls["C"])
    assert max(r["cum_share"] for r in rows) == 1.0
    assert len({r["p_partkey"] for r in rows}) == len(rows)


def test_quality_drift_extremes(spark):
    """op_quality_drift on constructed channels: disjoint half-histograms
    give exactly 2.0, identical halves exactly 0.0, and a constant channel
    (degenerate [min,max]) lands in one bucket with drift 0."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_quality_drift

    rows = []
    # channel 1: first half near 0.0, second half near 100.0 -> disjoint
    for i in range(10):
        rows.append((i, 1, f"2024-01-01 00:00:{i:02d}", 0.1 * i))
        rows.append((100 + i, 1, f"2024-01-02 00:00:{i:02d}", 100.0 - 0.1 * i))
    # channel 2: the same 10 values in each half -> identical histograms
    for i in range(10):
        rows.append((200 + i, 2, f"2024-01-01 00:00:{i:02d}", float(i)))
        rows.append((300 + i, 2, f"2024-01-02 00:00:{i:02d}", float(i)))
    # channel 3: constant value
    for i in range(10):
        rows.append((400 + i, 3, f"2024-01-0{1 + i % 2} 00:00:{i:02d}", 7.0))
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {r["channel_id"]: r for r in op_quality_drift(spark, "unused").collect()}
    assert out[1]["drift_l1"] == 2.0
    assert out[2]["drift_l1"] == 0.0
    assert out[3]["drift_l1"] == 0.0
    assert out[1]["n_first"] == 10 and out[1]["n_second"] == 10


def test_forecast_naive_exact_errors(spark):
    """op_events_forecast_naive on constructed hours: known day-over-day
    deltas give exact MAE/bias; hours without a same-hour-yesterday base
    are excluded from evaluation."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_events_forecast_naive

    rows = []
    eid = 0
    # type A: day-1 hourly counts [2, 4]; day-2 same hours [5, 1]
    # -> errors +3, -3: mae 3.0, bias 0.0, n_eval 2
    for h, n in ((0, 2), (1, 4), (24, 5), (25, 1)):
        for _ in range(n):
            rows.append((eid, f"2024-01-01 {h % 24:02d}:30:00" if h < 24
                         else f"2024-01-02 {h - 24:02d}:30:00", 1, "A", 1.0, ""))
            eid += 1
    # type B: only day-1 -> no evaluable hour, absent from output
    rows.append((eid, "2024-01-01 03:30:00", 2, "B", 1.0, ""))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_events", lambda s, d: ev
    ):
        out = {
            r["event_type"]: r
            for r in op_events_forecast_naive(spark, "unused").collect()
        }
    assert set(out) == {"A"}
    assert out["A"]["n_eval"] == 2
    assert out["A"]["mae"] == 3.0 and out["A"]["bias"] == 0.0


def test_embed_outliers_planted(spark):
    """op_embed_outliers on a constructed label population: a planted
    far-from-centroid vector is flagged; the tight cluster around the
    centroid is not; a 2-vector degenerate label yields no flags (each
    member is exactly 1sigma from the midpoint, under the 2sigma gate)."""
    from unittest import mock

    import pyspark.sql.functions as F  # noqa: F401

    from daq_3i_spark.plans.analytics_ops import op_embed_outliers

    dim = 64
    rows = []
    # label 1: 20 vectors jittered +-0.01 around a base point, one planted
    # at +1.0 on every axis
    for j in range(20):
        base = [0.1 + (0.01 if j % 2 else -0.01)] * dim
        rows.append((j, base, 1))
    rows.append((99, [1.1] * dim, 1))
    # label 2: two mirrored vectors — dev = 1sigma each, never 2sigma
    rows.append((200, [0.0] * dim, 2))
    rows.append((201, [0.5] * dim, 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_table",
        lambda s, d, t: emb,
    ):
        out = op_embed_outliers(spark, "unused").collect()
    assert {r["vec_id"] for r in out} == {99}
    assert out[0]["label"] == 1 and out[0]["dist2"] > 50.0


def test_quality_profile_constructed(spark):
    """op_quality_profile on a constructed feed: exact null counts, exact
    distinct counts (nulls excluded from DISTINCT per SQL), one row per
    column, shared n_rows."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_quality_profile

    rows = [
        (1, "2024-01-01 00:00:00", 10, "A", 1.0, "x"),
        (2, "2024-01-01 00:00:00", 10, "B", None, None),
        (3, "2024-01-02 00:00:00", None, "A", 2.0, "x"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_events", lambda s, d: ev
    ):
        out = {r["column_name"]: r for r in op_quality_profile(spark, "unused").collect()}
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["user_id"]["n_null"] == 1 and out["user_id"]["n_distinct"] == 1
    assert out["value"]["n_null"] == 1 and out["value"]["n_distinct"] == 2
    assert out["ts"]["n_null"] == 0 and out["ts"]["n_distinct"] == 2
    assert out["props"]["n_distinct"] == 1


def test_triangles_constructed_graph(spark):
    """op_graph_triangles on a hand-built graph: K4 in one basket gives
    every member C(3,2)=3 triangles; a path (no closure) gives none; a
    triangle spread across TWO baskets still closes (edges dedup across
    baskets)."""
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_graph_triangles

    rows = []
    # basket 1: parts 1,2,3,4 (K4 -> 4 triangles, each node in 3)
    for p in (1, 2, 3, 4):
        rows.append((100, p))
    # baskets 2+3: edges (10,11),(11,12) then (10,12) -> one triangle
    for o, pair in ((200, (10, 11)), (201, (11, 12)), (202, (10, 12))):
        rows.append((o, pair[0]))
        rows.append((o, pair[1]))
    # basket 4: a path 20-21, 21-22 only -> no triangle
    rows.append((300, 20))
    rows.append((300, 21))
    rows.append((301, 21))
    rows.append((301, 22))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_table", lambda s, d, t: li
    ):
        out = {r["p_partkey"]: r["n_triangles"] for r in op_graph_triangles(spark, "unused").collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}


def test_triangles_viral_hub_wedge_bound(spark):
    """Degree orientation keeps the wedge join near-linear on a viral hub.

    Fixture: one hub part (id 500, mid-range) co-purchased with 120 leaves
    — 60 lower ids, 60 higher — plus one genuine triangle on fresh ids.
    Under id orientation the hub has 60 in-edges and 60 out-edges, so the
    e1⋈e2 wedge join fans out 60·60 = 3600 rows at that single key (the
    d²/4 skew killer).  Under degree orientation every hub edge points
    INTO the hub (leaves have degree 1), out(hub) = 0, and the whole
    graph's wedge count is the triangle's single wedge.  Pins both: the
    shipped plan's wedge count stays ≤ |E|, and the fixture really is
    adversarial (id orientation measured ≥ 3600)."""
    from unittest import mock

    from daq_3i_spark.cache import release_shared
    from daq_3i_spark.plans.analytics_ops import op_graph_triangles, oriented_edges

    rows = []
    leaves = list(range(1, 61)) + list(range(900, 960))
    for i, leaf in enumerate(leaves):
        rows.append((1000 + i, 500))
        rows.append((1000 + i, leaf))
    for p in (2001, 2002, 2003):  # one real triangle, ids disjoint from star
        rows.append((5000, p))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    def wedge_count(e):
        e1 = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        e2 = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
        return e1.join(e2, "y").count()

    try:
        e = oriented_edges(li)
        n_edges = e.count()
        assert n_edges == 123  # 120 star + 3 triangle edges
        assert wedge_count(e) <= n_edges  # arboricity-bounded: here exactly 1
        # contrast: the id orientation this plan replaced goes quadratic
        id_e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        assert wedge_count(id_e) >= 3600
        with mock.patch(
            "daq_3i_spark.plans.analytics_ops.load_table", lambda s, d, t: li
        ):
            out = {
                r["p_partkey"]: r["n_triangles"]
                for r in op_graph_triangles(spark, "unused").collect()
            }
        assert out == {2001: 1, 2002: 1, 2003: 1}
    finally:
        release_shared()


def test_funnel_time_constructed(spark):
    """op_events_funnel_time on constructed journeys: latency measured
    from the FIRST signup to the first purchase at/after it;
    pre-signup purchases don't count; never-converting signups appear in
    n_signups only; exact interpolated quartiles over the two latencies."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_events_funnel_time

    rows = [
        # user 1: signup 10:00, purchases 11:00 (+3600s) and 12:00 (first wins)
        (1, "2024-01-01 10:00:00", 1, "signup"),
        (2, "2024-01-01 11:00:00", 1, "purchase"),
        (3, "2024-01-01 12:00:00", 1, "purchase"),
        # user 2: purchase BEFORE signup (ignored), then +7200s after
        (4, "2024-01-01 08:00:00", 2, "purchase"),
        (5, "2024-01-01 09:00:00", 2, "signup"),
        (6, "2024-01-01 11:00:00", 2, "purchase"),
        # user 3: signup only — counted in n_signups, no latency row
        (7, "2024-01-01 07:00:00", 3, "signup"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit(""))

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_events", lambda s, d: ev
    ):
        out = op_events_funnel_time(spark, "unused").collect()[0]
    assert out["n_signups"] == 3 and out["n_converted"] == 2
    # latencies: [3600e6, 7200e6] -> p25/p50/p75 by linear interpolation
    assert out["p50_us"] == 5400e6
    assert out["p25_us"] == 4500e6 and out["p75_us"] == 6300e6


def test_centroid_drift_constructed(spark):
    """op_sim_centroid_drift on constructed halves: identical half
    populations drift exactly 0; a planted unit offset on one axis drifts
    exactly 1; labels missing a half are absent (inner join)."""
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_sim_centroid_drift

    dim = 64
    rows = []
    # label 1: even and odd halves identical -> drift2 == 0
    for i in range(8):
        rows.append((i, [0.25] * dim, 1))
    # label 2: odd half shifted +1.0 on axis 0 only -> drift2 == 1.0
    for i in range(100, 108):
        v = [0.5] * dim
        if i % 2 == 1:
            v = [1.5] + [0.5] * (dim - 1)
        rows.append((i, v, 2))
    # label 3: only even vec_ids -> no odd half, absent
    rows.append((200, [0.1] * dim, 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_table", lambda s, d, t: emb
    ):
        out = {r["label"]: r for r in op_sim_centroid_drift(spark, "unused").collect()}
    assert set(out) == {1, 2}
    assert out[1]["drift2"] == 0.0
    assert out[2]["drift2"] == 1.0
    assert out[2]["n_even"] == 4 and out[2]["n_odd"] == 4


def test_ab_ci_constructed(spark):
    """op_events_ab_ci on constructed variants: a huge real effect is
    significant with the exact Wald bounds; identical rates are not."""
    import math
    from unittest import mock

    import pyspark.sql.functions as F

    from daq_3i_spark.plans.analytics_ops import op_events_ab_ci

    # md5-bucket parity of user ids is fixed; discover each id's variant by
    # replicating the assignment, then plant conversion rates 0.2 vs 0.8
    rows, eid = [], 0
    import hashlib

    def variant(uid: int) -> str:
        return "A" if int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2 == 0 else "B"

    a_ids = [u for u in range(1000) if variant(u) == "A"][:100]
    b_ids = [u for u in range(1000) if variant(u) == "B"][:100]
    for i, u in enumerate(a_ids):
        rows.append((eid, "2024-01-01 10:00:00", u, "view")); eid += 1
        if i < 20:  # 20% convert
            rows.append((eid, "2024-01-01 11:00:00", u, "purchase")); eid += 1
    for i, u in enumerate(b_ids):
        rows.append((eid, "2024-01-01 10:00:00", u, "view")); eid += 1
        if i < 80:  # 80% convert
            rows.append((eid, "2024-01-01 11:00:00", u, "purchase")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit(""))

    with mock.patch(
        "daq_3i_spark.plans.analytics_ops.load_events", lambda s, d: ev
    ):
        out = op_events_ab_ci(spark, "unused").collect()[0]
    assert (out["users_a"], out["conv_a"]) == (100, 20)
    assert (out["users_b"], out["conv_b"]) == (100, 80)
    diff = 0.8 - 0.2  # IEEE: 0.6000000000000001, matching the engine's tree
    assert out["diff"] == diff
    margin = 1.96 * math.sqrt(0.2 * (1.0 - 0.2) / 100.0 + 0.8 * (1.0 - 0.8) / 100.0)
    assert out["ci_lo"] == diff - margin and out["ci_hi"] == diff + margin
    assert out["significant"]


def test_interval_overlap_geometries(spark):
    """op_join_interval_overlap on planted geometries: partial overlap,
    containment (both directions), touching endpoints EXCLUDED (strict
    predicate), disjoint excluded, wrong channel excluded — and overlap
    widths exact."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_join_interval_overlap

    # channel for user u is u % 40 + 1; user 0 -> channel 1, user 1 -> 2
    def T(m):  # minutes after 10:00 on a fixed day
        return f"2024-01-01 {10 + m // 60:02d}:{m % 60:02d}:00"

    ev_rows = [
        # user 0 session A: [10:00, 10:20] (events 0,20 within 10-min gaps)
        (1, T(0), 0, "view"), (2, T(10), 0, "view"), (3, T(20), 0, "view"),
        # user 0 session B after >10-min gap: [11:00, 11:00] zero-length
        (4, T(60), 0, "view"),
        # user 1 (channel 2) session: [10:00, 10:20]
        (5, T(0), 1, "view"), (6, T(10), 1, "view"), (7, T(20), 1, "view"),
    ]
    ev = spark.createDataFrame(
        ev_rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit(""))
    # channel 1 samples: gap [10:10, 12:10] (2h > 1h threshold) overlaps
    # session A by 10 min and CONTAINS zero-length session B;
    # channel 2 samples: gap ends exactly at 10:00 -> touches session start,
    # strict predicate excludes it
    cd_rows = [
        (1, 1, "2024-01-01 10:10:00", 1.0), (2, 1, "2024-01-01 12:10:00", 1.0),
        (3, 2, "2024-01-01 07:00:00", 1.0), (4, 2, "2024-01-01 10:00:00", 1.0),
    ]
    cd = spark.createDataFrame(
        cd_rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.plans.extension_ops.load_events", lambda s, d: ev
    ), mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: cd
    ):
        out = {
            (r["user_id"], r["session_id"]): r
            for r in op_join_interval_overlap(spark, "unused").collect()
        }
    # session A overlaps the channel-1 outage by [10:10, 10:20] = 600s
    assert out[(0, 1)]["overlap_us"] == 600_000_000
    # zero-length session B inside the outage: overlap 0 but matched
    assert out[(0, 2)]["overlap_us"] == 0
    # user 1's session only TOUCHES its channel's gap end -> excluded
    assert (1, 1) not in out and len(out) == 2


def test_setops_all_multiset_semantics(spark, sf_dir):
    """op_sql_setops_all: bag algebra recomputed in python — per part,
    common = min(count_B, count_M) and surplus = max(0, count_B − count_M);
    parts only in MACHINERY never appear."""
    from collections import Counter

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("l_partkey", "c_mktsegment")
        .collect()
    )
    cb = Counter(r["l_partkey"] for r in joined if r["c_mktsegment"] == "BUILDING")
    cm = Counter(r["l_partkey"] for r in joined if r["c_mktsegment"] == "MACHINERY")
    want_common = {k: min(v, cm[k]) for k, v in cb.items() if min(v, cm[k]) > 0}
    want_surplus = {k: v - cm[k] for k, v in cb.items() if v - cm[k] > 0}

    out = QUERIES["op_sql_setops_all"].spark(spark, sf_dir).collect()
    got_common = {r["p_partkey"]: r["n"] for r in out if r["kind"] == "common"}
    got_surplus = {
        r["p_partkey"]: r["n"] for r in out if r["kind"] == "building_only"
    }
    assert got_common == want_common
    assert got_surplus == want_surplus
