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
