"""Property-based checks of the analytics batch (plans/analytics_ops.py)
against brute-force python references — random graphs/series/key sets
including the collision and boundary cases fixed fixtures miss.

Each test monkeypatches the op's table loader with a generated frame, so the
REGISTERED plan (the exact code the driver runs) is exercised, not a copy of
its logic.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

import daq_3i_spark.plans.analytics_ops as ana
import daq_3i_spark.sources.daq_dims as dims

_EPOCH = dt.datetime(2024, 1, 10)


def _ts(seconds: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=seconds)


# --- PageRank: brute-force integer iteration on random bipartite graphs -----

_edges = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 4)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_pagerank_matches_bruteforce(spark, edges):
    rows = [(p, s) for p, s in edges]
    li = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    orig = ana.load_table
    try:
        ana.load_table = lambda sp, sf, name: li
        got = {r.node: r.rank for r in ana.op_graph_pagerank(spark, "x").collect()}
    finally:
        ana.load_table = orig

    # python reference: same scaled-integer iteration
    eset = {(f"p{p}", f"s{s}") for p, s in edges}
    adj: dict[str, list[str]] = {}
    for a, b in eset:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    rank = {v: ana._PR_SCALE // n for v in adj}
    tp = (15 * ana._PR_SCALE) // (100 * n)
    for _ in range(ana._PR_ITERS):
        nxt = {v: tp for v in adj}
        for src, outs in adj.items():
            c = (rank[src] * 85) // (100 * len(outs))
            for d in outs:
                nxt[d] += c
        rank = nxt
    want = dict(
        sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    assert got == want


# --- bloom prefilter: result == brute-force semi join ------------------------

_orders = st.lists(
    st.tuples(st.integers(1, 40), st.floats(1000, 500_000, allow_nan=False)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)
_items = st.lists(st.integers(1, 40), min_size=1, max_size=40)


@settings(max_examples=10, deadline=None)
@given(_orders, _items)
def test_bloom_join_matches_bruteforce(spark, orders, items):
    odf = spark.createDataFrame(orders, "o_orderkey long, o_totalprice double")
    ldf = spark.createDataFrame(
        [(k, "R", 100.0 + k) for k in items],
        "l_orderkey long, l_returnflag string, l_extendedprice double",
    )
    orig = ana.load_table
    try:
        ana.load_table = lambda sp, sf, name: odf if name == "orders" else ldf
        got = {
            (r.l_returnflag, r.n_items, r.revenue)
            for r in ana.op_join_bloom_prefilter(spark, "x").collect()
        }
    finally:
        ana.load_table = orig
    hot = {k for k, p in orders if p > ana._BLOOM_PRICE}
    match = [k for k in items if k in hot]
    if not match:
        assert got == set()
    else:
        n = len(match)
        rev = sum(int((100.0 + k) * 1e6 + 0.5) for k in match) / 1e6
        assert got == {("R", n, rev)}


# --- EMA: exact rational reference -------------------------------------------

_series = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
    min_size=1,
    max_size=24,
)


@settings(max_examples=10, deadline=None)
@given(_series)
def test_ema_matches_exact_reference(spark, series):
    import math

    rows = [
        (i, 1, _ts(60 * i), float(v)) for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts timestamp, value double"
    )
    orig = dims.channel_data_df
    try:
        dims.channel_data_df = lambda sp, sf: df
        got = {
            r.id: r.ema for r in ana.op_timeseries_ema(spark, "x").collect()
        }
    finally:
        dims.channel_data_df = orig
    K = ana._EMA_K
    fx = [math.floor(float(v) * 1e6 + 0.5) for v in series]
    for t in range(len(series)):
        arr = fx[max(0, t - K + 1) : t + 1]
        s = len(arr)
        num = sum(
            x * 7 ** (s - j) * 8 ** (K - 1 - (s - j))
            for j, x in enumerate(arr, start=1)
        )
        norm = 8 ** (K - s) * (8**s - 7**s)
        # bit-exact: the op's arithmetic is the same int64 fold + one
        # correctly-rounded division
        want = float(num) / float(norm * 1_000_000)
        assert got[t] == want


# --- concurrency: brute-force interval stabbing ------------------------------

_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 4000)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(_events)
def test_concurrency_matches_bruteforce(spark, events):
    rows = [
        (i, _ts(sec), u, "view", 1.0, "{}")
        for i, (u, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = ana.load_events
    try:
        ana.load_events = lambda sp, sf: df
        got = {
            r.ts_us: r.concurrent
            for r in ana.op_events_concurrency(spark, "x").collect()
        }
    finally:
        ana.load_events = orig

    # reference: sessionize per user with the 10-min gap, then stab
    gap_us = ana._CONC_GAP_S * 1_000_000
    per_user: dict[int, list[int]] = {}
    for i, (u, sec) in enumerate(events):
        per_user.setdefault(u, []).append(
            int(_ts(sec).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        )
    sessions = []
    for u, tss in per_user.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if t - prev > gap_us:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    bounds = sorted({t for s, e in sessions for t in (s, e)})
    want = {
        t: sum(1 for s, e in sessions if s <= t <= e) for t in bounds
    }
    assert got == want
