"""Targeted physical-plan quality gates.

The registry-wide sweeps (no cartesian products, driver-hashable schemas)
live in the slice modules test_plan_quality_s{0..2}.py — split so
tools/run_tests_sharded.py can spread them across shards; shared defs and
check bodies are in tests/plan_quality_common.py.  This module keeps the
single-plan gates and pins the invariants that make the split safe.
Planning only (executedPlan is built, nothing runs).
"""

from __future__ import annotations

import pytest

from daq_3i_spark.plans import QUERIES
from tests.plan_quality_common import N_SLICES, _PLANNABLE, _plan, plannable_slice


def test_slices_cover_every_plannable_entry_exactly_once():
    """The three LIVE slice modules must partition _PLANNABLE — introspected
    by IMPORTING each module and reading the NAMES list its parametrize
    actually uses, so a deleted slice file or a copy-pasted wrong index
    fails HERE (checking only the slice function would miss both)."""
    import importlib

    seen: list[str] = []
    for k in range(N_SLICES):
        mod = importlib.import_module(f"tests.test_plan_quality_s{k}")
        assert mod.NAMES == plannable_slice(k), f"slice module s{k} uses a wrong index"
        seen.extend(mod.NAMES)
    assert sorted(seen) == _PLANNABLE
    assert len(seen) == len(_PLANNABLE)


def test_config_dims_broadcast(spark, sf_dir):
    """Every join against the tiny config dims must be a broadcast hash join,
    never a shuffle join."""
    for name in ("op_join_channels_buses", "op_join_data_channels",
                 "op_join_enrich_stream", "flagship_pipeline"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Point/range filters must reach the parquet scan as PushedFilters."""
    plan = _plan(spark, sf_dir, "op_sql_q1")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    plan = _plan(spark, sf_dir, "op_sql_q3_topk")
    assert "PushedFilters" in plan
    # round-2 queries: the selective predicates must reach their scans too
    plan = _plan(spark, sf_dir, "op_sql_q10_returned")
    assert "EqualTo(l_returnflag,R)" in plan, "returnflag filter not pushed"
    assert "GreaterThanOrEqual(o_orderdate" in plan, "orderdate range not pushed"
    plan = _plan(spark, sf_dir, "op_sql_q7_volume")
    assert "GreaterThanOrEqual(l_shipdate" in plan, "shipdate range not pushed"
    plan = _plan(spark, sf_dir, "op_sql_q9_profit")
    assert "EqualTo(p_type,STANDARD)" in plan, "p_type filter not pushed"


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The corpus side must stream through a broadcast hash join against the
    (tiny) eval-set shingle table — shuffling the corpus to decontaminate it
    would be the 100 TB anti-plan."""
    plan = _plan(spark, sf_dir, "op_contamination_check")
    assert "BroadcastHashJoin" in plan, "eval shingles not broadcast"
    assert "SortMergeJoin" not in plan, "contamination join degraded to SMJ"


def test_registry_wrapper_self_releases_shared_cache(spark, sf_dir):
    """The pinned registry wrapper releases the PREVIOUS op's shared()
    frames before building the next one (VERDICT r10 'What's missing #2'):
    a harness that runs many queries() entries in one session — the
    driver's 50-query sweep — must get the bounded-cache lifetime without
    knowing the release_shared() convention.  Runs two shared()-using ops
    back-to-back through the WRAPPER and pins that (a) the second build
    drops the first op's frames, (b) one explicit release leaves Spark's
    CacheManager completely empty."""
    from daq_3i_spark import cache
    from daq_3i_spark.plans import spark_queries

    qs = spark_queries()
    cache.release_shared()
    spark.catalog.clearCache()

    df1 = qs["op_events_funnel_time"](spark, sf_dir)  # shares 1 frame
    n_op1 = len(cache._LIVE)
    assert n_op1 >= 1
    df1.count()
    df2 = qs["op_graph_triangles"](spark, sf_dir)  # shares 3 frames
    # (bp + und inside oriented_edges — the edge list lost its cache in r18
    # when the enumeration started regenerating edges from the census — +
    # the r13 successor-table cache); op1's frames are gone; only op2's
    assert len(cache._LIVE) == 3
    df2.count()
    assert cache.release_shared() == 3
    assert not cache._LIVE
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize(
    "name",
    ["op_graph_pagerank", "op_orders_market_basket", "op_text_tfidf_topterms"],
)
def test_plan_construction_fires_no_jobs(spark, sf_dir, name):
    """VERDICT r8 'What's wrong #4': building these plans used to fire an
    eager .count() — and PageRank's checkpoint ran every upstream shuffle
    stage under AQE — a full extra pass over the projection at 100 TB
    before the returned DataFrame was ever executed.  Scalars now ride as
    one-row broadcast aggregates and the iteration frame is a lazy
    persist().  The only jobs plan construction may fire are load_table's
    single-stage parquet footer probes (schema normalization); any
    MULTI-stage job at construction means shuffle work ran eagerly."""
    from tests.plan_quality_common import check_lazy_construction

    # one shared body with the registry-wide sweep (test_plan_quality_s*),
    # so the stage rule and the _BUILD_EXECUTES exemptions cannot drift
    # between two copies; these three ops stay PINNED by name here because
    # they are the r8 regression cases the rule was written for
    check_lazy_construction(spark, sf_dir, name)


def test_band_eval_no_corpus_sized_broadcast_hint(spark, sf_dir):
    """VERDICT r11 'What's wrong #1', inverted pin: the shared band-eval
    derivation (_band_exact_frames) must carry NO forced broadcast of any
    doc-dimension frame (doc->lang maps, per-doc shingle sizes — all grow
    linearly with the corpus; a hard hint there is a forced OOM at the
    100 TB design point).  Hint census over the ANALYZED plan (hints are
    eliminated before optimizedPlan): the threshold sweep carries zero
    broadcast hints; the recall eval's only hints are its two ONE-ROW
    count aggregates (nt/nh); same-lang restriction now rides the band
    self-join key instead of being joined back on."""
    from daq_3i_spark.cache import release_shared

    try:
        an = (
            QUERIES["op_dedup_threshold_sweep"]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert an.count("ResolvedHint") == 0, "forced broadcast crept back in"
        an = (
            QUERIES["op_corpus_minhash_eval"]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert an.count("ResolvedHint") == 2, (
            "expected exactly the two one-row count-aggregate hints"
        )
    finally:
        release_shared()


@pytest.mark.parametrize(
    "name", ["op_dedup_ngram_jaccard", "op_dedup_containment"]
)
def test_posting_family_keeps_self_join_shape(spark, sf_dir, name):
    """VERDICT r16 'What's wrong #2' pin: the posting-family pair
    generation stays the shared()-cached posting SELF-JOIN.  The r16
    curve adjudication REJECTED the grouped-array generator here (the
    market-basket winner): sf0.1 wash, ×0.58 at 10 lineitem copies but
    ×1.15 WORSE at 50 with an increasing slope — collect_set over the
    (lang, shingle) key space degrades at high group cardinality
    (posting vocabularies are unbounded, unlike order keys).  Until now
    that rejection lived only in SCALE.md prose and op comments; this
    pins it: no collect_set pair expansion, and the posting cache read
    by both self-join sides."""
    plan = _plan(spark, sf_dir, name)
    assert "collect_set" not in plan, (
        "rejected grouped-array pair generator crept back in"
    )
    assert plan.count("InMemoryTableScan") >= 2, (
        "posting cache not read by both self-join sides"
    )


def test_kmv_distinct_hash_frame_is_cached(spark, sf_dir):
    """r17 rewrite pin: the KMV sketch's distinct-hash frame ``h`` feeds
    BOTH the two-phase bottom-k chain and the exact-count aggregate —
    uncached, the lineitem scan + (flag, suppkey) distinct + md5 chain ran
    once per consumer (plans/r17/op_sql_kmv_sketch_{before,after}.txt; A/B
    wash at sf0.1, x0.72 at sf1 — the double scan is the scale-dependent
    term).  Both consumers must read the InMemoryRelation."""
    from daq_3i_spark.cache import release_shared

    try:
        plan = _plan(spark, sf_dir, "op_sql_kmv_sketch")
        assert plan.count("InMemoryTableScan") >= 2, (
            "h cache not read by both consumers"
        )
    finally:
        release_shared()


def test_sweep_postings_prefiltered_eval_postings_full(spark, sf_dir):
    """r17 rewrite pin (guide §3.2): the threshold sweep consumes the
    exact-Jaccard frame only INNER-joined with the band candidates, so its
    posting table is semi-join-prefiltered to candidate docs before the
    posting self-join (plans/r17/op_dedup_threshold_sweep_{before,after}
    .txt; A/B x0.94 sf0.1 / x0.57 sf1 medians — the posting join is the
    op's superlinear term and candidates grow slower than docs).  The
    recall eval must keep the FULL posting frame: its ground truth counts
    the near-dup pairs the bands MISSED, exactly the set the prefilter
    would drop — a LeftSemi appearing there silently zeroes n_missed."""
    from daq_3i_spark.cache import release_shared

    try:
        sweep = _plan(spark, sf_dir, "op_dedup_threshold_sweep")
        assert "LeftSemi" in sweep, "candidate-doc posting prefilter missing"
        ev = _plan(spark, sf_dir, "op_corpus_minhash_eval")
        assert "LeftSemi" not in ev, (
            "recall eval's ground-truth postings must not be prefiltered"
        )
    finally:
        release_shared()


def test_triangles_no_forced_broadcast_shuffled_hash_enumeration(spark, sf_dir):
    """VERDICT r11 'What's wrong #3': the successor table's payload is
    edge-sized (sum of array lengths = |E|), so broadcasting it must never
    be FORCED.  Since r18 the enumeration join is pinned to SHUFFLED-HASH
    instead (the only hint in the plan): the build side is one partition's
    slice of succ — nothing driver-collected — and the wedge-payload stream
    side is never sorted; an AQE broadcast promotion of succ was measured
    to OOM a default-memory session at sf0.1 (succ squeaks under the 10 MB
    threshold there while the heap also carries the wedge-payload shuffle).
    Pins: no broadcast hint anywhere, exactly the one shuffle_hash hint,
    and the final adaptive plan executes the enumeration as
    ShuffledHashJoin, not Broadcast."""
    from daq_3i_spark.cache import release_shared

    try:
        df = QUERIES["op_graph_triangles"].spark(spark, sf_dir)
        qe = df._jdf.queryExecution()
        analyzed = qe.analyzed().toString()
        assert "broadcast" not in analyzed.lower() or "Broadcast" not in [
            h for h in analyzed.splitlines() if "ResolvedHint" in h
        ], "broadcast hint sneaked in"
        hint_lines = [ln for ln in analyzed.splitlines() if "ResolvedHint" in ln]
        assert len(hint_lines) == 1 and "shuffle_hash" in hint_lines[0].lower(), (
            f"expected exactly the shuffle_hash hint, got: {hint_lines}"
        )
        df.collect()  # execute THIS dataset so its adaptive plan finalizes
        final = qe.executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "ShuffledHashJoin" in final, (
            "enumeration join no longer shuffled-hash at test scale"
        )
    finally:
        release_shared()


@pytest.mark.parametrize(
    "name",
    [
        "op_pack_sequences",
        "op_pack_sequences_bpe",
        "op_corpus_budget_sample",
        "op_corpus_dedup_sample",
    ],
)
def test_packing_running_sum_not_single_task_per_source(spark, sf_dir, name):
    """VERDICT r11 'What's wrong #2': the per-source running sums must run
    on the grouped_cumsum kernel — the data-sized exchange is a RANGE
    partitioning on (source, order) so a hot source spans many tasks, and
    every window that partitions by source orders by the partition stamp
    (the <= P-row offset rollup), never by a data column (the
    single-task-per-source form)."""
    import re

    plan = _plan(spark, sf_dir, name)
    assert "rangepartitioning(source" in plan, "data shuffle not range-keyed"
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    bad = [s for s in specs if "source" in s and "__rank_pid" not in s]
    assert not bad, f"single-task-per-source window in plan: {bad}"


def test_bloom_refine_join_not_force_broadcast(spark, sf_dir):
    """op_join_bloom_prefilter's exact-refine side is FACT-derived (every
    order key passing the price filter — grows with the table), so the
    only forced broadcast in the plan must be the geometry-bounded bloom
    bitmap (6 KB however many keys): one hint, and AQE still promotes the
    refine semi join at test scale."""
    from daq_3i_spark.cache import release_shared

    try:
        df = QUERIES["op_join_bloom_prefilter"].spark(spark, sf_dir)
        qe = df._jdf.queryExecution()
        assert qe.analyzed().toString().count("ResolvedHint") == 1
        df.collect()  # execute THIS dataset so its adaptive plan finalizes
        final = qe.executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final
    finally:
        release_shared()


def test_bloom_bitmap_fold_is_distributed(spark, sf_dir):
    """op_join_bloom_prefilter's bitmap build must stay the r17 shape — a
    map-side-combined per-word bit_or aggregate whose single-row step sees
    only word-cardinality rows — never the rejected collect_list-of-every-
    position single-task fold (O(positions x nlongs) per-task work, and a
    positions-sized one-task array at 100 TB)."""
    from daq_3i_spark.cache import release_shared

    try:
        df = QUERIES["op_join_bloom_prefilter"].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bit_or" in plan, "distributed per-word bit_or fold missing"
        assert "collect_list(p" not in plan, (
            "positions-sized single-task collect_list fold regressed in"
        )
    finally:
        release_shared()


# SF-scaled TPC-H dims (customer / supplier / part — they GROW with scale
# factor, ~2e10 part rows at the 100 TB SF) must never carry a forced
# broadcast hint: r13 dropped them (the market-basket / bloom-refine
# precedent), keeping hints only on fixed-cardinality frames (nation 25,
# region 5, one-row aggregates).  Pins, per op: the exact surviving hint
# count, that size-based planning still broadcasts every dim at test scale,
# and the exact SortMergeJoin count (q21's lineitem self-join and q20's
# fact-derived dominant-supplier semi join are CORRECTLY shuffle joins).
_SQL_HINT_PINS = {
    "op_sql_q3_topk": (0, 0),
    "op_sql_q5_region": (2, 0),   # nation, region
    "op_sql_setops_all": (0, 0),
    "op_sql_q7_volume": (2, 0),   # nation x2
    "op_sql_q8_market_share": (3, 0),  # nation x2, region
    "op_sql_q9_profit": (1, 0),   # nation
    "op_sql_q14_promo": (0, 0),
    "op_sql_q15_topsupplier": (1, 0),  # one-row max-revenue crossJoin
    "op_sql_q17_smallqty": (0, 0),
    "op_sql_q19_disjunction": (0, 0),
    "op_sql_q2_mincost": (1, 0),  # nation
    "op_sql_q20_dominant": (1, 1),  # nation; dom semi join correctly SMJ
    "op_sql_q21_waiting": (0, 1),   # lineitem self-join correctly SMJ
}


@pytest.mark.parametrize("name", sorted(_SQL_HINT_PINS))
def test_sql_dims_not_force_broadcast(spark, sf_dir, name):
    from daq_3i_spark.cache import release_shared

    want_hints, want_smj = _SQL_HINT_PINS[name]
    try:
        df = QUERIES[name].spark(spark, sf_dir)
        qe = df._jdf.queryExecution()
        hints = qe.analyzed().toString().count("ResolvedHint")
        assert hints == want_hints, (
            f"{name}: {hints} forced hints (want {want_hints}) — an SF-scaled "
            "dim regained a hint, or a fixed-cardinality hint was dropped"
        )
        df.collect()
        final = qe.executedPlan().toString()
        assert final.count("SortMergeJoin") == want_smj
        assert "BroadcastHashJoin" in final, (
            f"{name}: size-based planning no longer broadcasts the dims"
        )
    finally:
        release_shared()


def test_filter_due_lag_is_day_bucketed(spark, sf_dir):
    """op_filter_due's lag must run inside (channel, day) buckets — every
    windowspec carries the day column — with the prior-history carry coming
    from the calendar-bounded rollup, never a per-channel window over the
    whole fact (40 config channels => one task per channel's full history)."""
    import re

    plan = _plan(spark, sf_dir, "op_filter_due")
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected the bucketed lag + rollup windows"
    bad = [s for s in specs if "channel_id" in s and "__d" not in s and "__dmax" not in s]
    assert not bad, f"per-channel window without the day bucket: {bad}"


def test_running_sum_on_grouped_cumsum_kernel(spark, sf_dir):
    """op_sql_running_sum must run on the grouped_cumsum kernel: the
    data-sized exchange is a RANGE partitioning on (supplier, order key)
    and every supplier-partitioned window orders by the partition stamp
    (the <= P-row offset rollup), never by a data column — the
    single-task-per-supplier form (the packing-family pin, applied to the
    SQL surface)."""
    import re

    plan = _plan(spark, sf_dir, "op_sql_running_sum")
    assert "rangepartitioning(l_suppkey" in plan, "data shuffle not range-keyed"
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "offset rollup window missing"
    bad = [s for s in specs if "l_suppkey" in s and "__rank_pid" not in s]
    assert not bad, f"single-task-per-supplier window in plan: {bad}"


def test_market_basket_pairs_are_generated_not_self_joined(spark, sf_dir):
    """r16 rewrite pin: market-basket pair generation is the grouped-array
    expansion — ONE l_orderkey exchange feeding posexplode/slice
    generators — not a basket self-join (which paid a second data-sized
    exchange + SortMergeJoin; A/B x0.80 at sf0.1, curve-checked flat to
    50x lineitem, SCALE.md r16).  Pin both halves: at least two Generate
    nodes (the i<j expansion) and ZERO SortMergeJoin anywhere at test
    scale (the part-frequency dims stay broadcast; a SMJ reappearing
    means either the generator regressed to a join or a dim lost its
    broadcast)."""
    from daq_3i_spark.plans import QUERIES

    df = QUERIES["op_orders_market_basket"].spark(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan.count("Generate") >= 2, "grouped-array pair expansion missing"
    assert "SortMergeJoin" not in plan


def test_change_feed_diffs_versions_once(spark, sf_dir):
    """r17 rewrite pin: the CDC diff is a SINGLE pass over the full-outer
    version join — each joined row emits its 0-2 change rows through one
    conditional-array explode (Generate) — not the pre-r17 union of four
    projections, which re-executed the join subtree per branch (4
    SortMergeJoins / 12 Exchanges at sf0.1; A/B x0.83, plans/r17/
    op_sink_change_feed_{before,after}.txt).  A Union or a second join
    reappearing means the branch-per-change-type shape regressed."""
    from tests.plan_quality_common import _plan

    plan = _plan(spark, sf_dir, "op_sink_change_feed")
    assert plan.count("SortMergeJoin") == 1, "version diff must join exactly once"
    assert "Union" not in plan, "per-change-type union branches regressed"
    assert "Generate" in plan, "conditional-array explode missing"


def test_pagerank_edges_are_exploded_not_unioned(spark, sf_dir):
    """r17 rewrite pin: both pagerank edge directions come from ONE explode
    (Generate) over the pair-distinct — not the pre-r17 union of two
    projections, whose per-branch isnotnull pushdown defeated ReuseExchange
    so the ed cache build scanned lineitem 4x and ran the distinct 4x
    (plans/r17/op_graph_pagerank_{before,after}.txt; A/B x0.70 sf0.1 /
    x0.78 sf1 medians, 6 alternating reps).  A Union reappearing means the
    doubled-subtree shape regressed."""
    from tests.plan_quality_common import _plan

    plan = _plan(spark, sf_dir, "op_graph_pagerank")
    assert "Generate" in plan, "exploded edge generation missing"
    assert "Union" not in plan, "per-direction union branches regressed"


def test_pagerank_iterations_are_shuffled_hash(spark, sf_dir):
    """r18 rewrite pin: each of the 3 iteration joins is SHUFFLED-HASH with
    the NODE-sized rank frame as build side — a sort-merge plan sorted the
    edge-sized ed cache once per iteration (3 edge-wide sorts per query),
    and broadcasting ranks would grow with the node dimension.  The ed
    cache is also repartition("src")-ed at build so AQE sizes its
    partitions from the materialized edge bytes.  (Deleting the iteration
    exchanges outright via the cache's partitioning was measured and is
    unavailable: canChangeCachedPlanOutputPartitioning=true — mandatory,
    9x — makes the cached partitioning indeterminate to consumers.)
    Alternating A/B medians ×0.82–0.87 at sf1 in two windows."""
    from daq_3i_spark.cache import release_shared

    try:
        df = QUERIES["op_graph_pagerank"].spark(spark, sf_dir)
        qe = df._jdf.queryExecution()
        analyzed = qe.analyzed().toString()
        hint_lines = [ln for ln in analyzed.splitlines() if "ResolvedHint" in ln]
        kinds = sorted(
            "shuffle_hash" if "shuffle_hash" in ln else "broadcast"
            for ln in hint_lines
        )
        # 3 iteration shuffle_hash hints + the ONE-ROW node-count broadcast
        assert kinds == ["broadcast"] + ["shuffle_hash"] * 3, (
            f"unexpected hint census: {hint_lines}"
        )
        df.collect()
        final = qe.executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert final.count("ShuffledHashJoin [src") >= 3, (
            "iteration joins no longer shuffled-hash"
        )
        assert "SortMergeJoin [src" not in final, (
            "an iteration join regressed to sort-merge (edge-wide sort)"
        )
    finally:
        release_shared()


def test_triangles_basket_pairs_read_cached_bp(spark, sf_dir):
    """r17 rewrite pin: the basket-pair frame ``bp`` feeding the pair
    self-join in oriented_edges is shared() — AQE promotes that self-join
    to broadcast, and a broadcast build side is planned as its own subtree,
    so an uncached bp ran the full lineitem scan + distinct ONCE PER JOIN
    SIDE (plans/r17/op_graph_triangles_{before,after}.txt; A/B x0.88 sf0.1
    / x0.73 sf1 medians).  With the cache, the und build plan reads the bp
    InMemoryRelation on both sides: its executed plan carries >= 3
    InMemoryTableScan nodes (its own + 2 bp reads); an uncached bp shows
    exactly 1."""
    from daq_3i_spark import cache
    from daq_3i_spark.plans.analytics_ops import oriented_edges
    from daq_3i_spark.sources.tables import load_table

    cache.release_shared()
    try:
        li = load_table(spark, sf_dir, "lineitem")
        oriented_edges(li)
        assert len(cache._LIVE) == 2  # bp, und — in shared() call order
        und_plan = (
            cache._LIVE[1]._jdf.queryExecution().executedPlan().toString()
        )
        assert und_plan.count("InMemoryTableScan") >= 3, (
            "bp cache not read by both pair self-join sides"
        )
    finally:
        cache.release_shared()


def test_triangles_enumeration_joins_succ_once(spark, sf_dir):
    """r18 rewrite pin: the triangle enumeration regenerates its edge list
    by EXPLODING the successor-census arrays (nbrs is the list of all
    successors per src over the distinct oriented edges, so explode(nbrs)
    is exactly the edge list with nx attached) and joins the census ONCE,
    for ny.  The r17 shape joined the edge list back to succ on x just to
    fetch nx — a whole extra equi-join per query (alternating A/B ×0.88
    sf0.1 / ×0.77 sf1 medians, checksum-identical).  Also pins the census
    staying UNSORTED: array_intersect hash-probes one side, and every
    consumer is multiset-invariant, so a sort_array here is dead work."""
    from daq_3i_spark.cache import release_shared

    try:
        df = QUERIES["op_graph_triangles"].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # everything below the succ InMemoryRelation prints as the cached
        # PHYSICAL plan (SortMergeJoin/…HashJoin); the op's own logical
        # joins print bare "Join Inner, (".  Exactly ONE must remain — the
        # shuffle_hash ny join — where the r17 shape had a second (nx on x).
        logical_joins = [
            ln
            for ln in plan.splitlines()
            if "Join Inner, (" in ln and "HashJoin" not in ln and "SortMergeJoin" not in ln
        ]
        assert len(logical_joins) == 1, f"expected 1 logical join:\n{plan}"
        assert "shuffle_hash" in logical_joins[0], logical_joins[0]
        assert "explode(nbrs" in plan, "census-explode edge regeneration gone"
        assert "sort_array" not in plan, "census sort is dead work (r18)"
    finally:
        release_shared()
