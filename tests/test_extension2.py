"""Semantic tests for the round-2 extension ops (plans/extension_ops2.py) —
properties the oracle hash can't express: cluster consistency, ANN recall,
stream/batch session agreement."""

from __future__ import annotations

import pytest

from daq_3i_spark.plans import QUERIES


@pytest.fixture(scope="module")
def components(spark, sf_dir):
    return {
        r["doc_id"]: (r["component"], r["comp_size"])
        for r in QUERIES["op_dedup_components"].spark(spark, sf_dir).collect()
    }


def test_components_cover_pairs(spark, sf_dir, components):
    """Every near-dup pair must land in the same component."""
    pairs = QUERIES["op_dedup_minhash"].spark(spark, sf_dir).collect()
    assert pairs, "fixture should produce at least one near-dup pair"
    for p in pairs:
        assert components[p["doc_a"]][0] == components[p["doc_b"]][0], (
            f"pair ({p['doc_a']}, {p['doc_b']}) split across components"
        )


def test_star_components_deep_chain(spark):
    """A depth-400 chain converges in O(log^2) star rounds, not O(depth) —
    the property min-label propagation lacked (VERDICT r4 item 6)."""
    import daq_3i_spark.operators.graph as graph

    n = 400
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    rounds = 0
    orig_small = graph._small_star

    def counting_small(e):
        nonlocal rounds
        rounds += 1
        return orig_small(e)

    graph._small_star = counting_small
    try:
        labels = {
            r["doc_id"]: r["component"]
            for r in graph.star_components(spark, pairs).collect()
        }
    finally:
        graph._small_star = orig_small
    assert len(labels) == n + 1
    assert set(labels.values()) == {0}  # one component, min-label root
    assert rounds <= 12, f"chain of {n} took {rounds} star rounds"


def test_star_components_nonconvergence_raises(spark, monkeypatch):
    """Exhausting _MAX_ROUNDS without set-convergence must raise, never
    emit the partially-contracted edge list: a partial contraction labels
    members of ONE component with different (non-minimal) roots — wrong
    results with no other symptom (the loud-failure convention)."""
    import daq_3i_spark.operators.graph as graph

    monkeypatch.setattr(graph, "_MAX_ROUNDS", 1)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.star_components(spark, pairs).collect()


def test_is_star_forest_classifier(spark):
    """The r17 convergence check: _is_star_forest must accept exactly the
    min-rooted star forests (the contraction's terminal state) and reject
    every non-terminal canonical edge set — a false positive here would end
    the loop early with WRONG component labels."""
    from daq_3i_spark.operators.graph import _is_star_forest

    def ef(rows):
        return spark.createDataFrame(rows, "u long, v long")

    # terminal states: stars centered at the component min (+ empty set)
    assert _is_star_forest(ef([]).filter("u > 0"))
    assert _is_star_forest(ef([(1, 2), (1, 3), (7, 9)]))
    # chain: 2 is both a leaf (of 1) and a center (of 3)
    assert not _is_star_forest(ef([(1, 2), (2, 3)]))
    # shared leaf: 3 is a leaf of two centers (non-star wedge 1-3-2)
    assert not _is_star_forest(ef([(1, 3), (2, 3)]))


def test_star_loop_output_is_star_forest(spark):
    """A converged run's labels equal the star-forest edge set directly —
    the equivalence the one-aggregate check relies on (old set-equality
    check and new star-forest check must terminate on the same edge set)."""
    import daq_3i_spark.operators.graph as graph

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101), (103, 101)],
        "doc_a long, doc_b long",
    )
    labels = {
        r["doc_id"]: r["component"]
        for r in graph.star_components(spark, pairs).collect()
    }
    assert {labels[i] for i in range(41)} == {0}
    assert labels[100] == labels[101] == labels[103] == 100


def test_star_components_forest(spark):
    """Multiple components + isolated-node contract (absent from output)."""
    from daq_3i_spark.operators.graph import star_components

    edges = [(5, 3), (3, 9), (20, 21), (30, 30)]  # self-loop dropped
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in star_components(spark, pairs).collect()
    }
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_components_min_label_and_sizes(components):
    """The component id is the min member id; sizes count members."""
    by_comp: dict[int, list[int]] = {}
    for doc, (comp, _size) in components.items():
        by_comp.setdefault(comp, []).append(doc)
    for comp, members in by_comp.items():
        assert comp == min(members)
        for m in members:
            assert components[m][1] == len(members)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4 of 16 cells must keep reasonable recall@10 against
    the exact scan (the corpus is clustered by label, so the coarse cells
    capture real structure; an implementation bug — wrong cell assignment,
    wrong probe ordering — collapses recall toward nprobe/C ~ 0.25)."""
    brute = QUERIES["op_sim_topk"].spark(spark, sf_dir).collect()
    ivf = QUERIES["op_sim_ivf_topk"].spark(spark, sf_dir).collect()
    b = {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["vec_id"])
    v = {}
    for r in ivf:
        v.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(b) == set(v), "every query must produce IVF results"
    hits = sum(len(b[q] & v[q]) for q in b)
    total = sum(len(b[q]) for q in b)
    assert hits / total >= 0.5, f"IVF recall@10 collapsed: {hits}/{total}"


def test_ivf_scores_subset_of_brute(spark, sf_dir):
    """Every IVF (query, vec) score must equal the brute-force score for the
    same pair — IVF prunes candidates, it must not change the metric."""
    brute = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in QUERIES["op_sim_topk"].spark(spark, sf_dir).collect()
    }
    for r in QUERIES["op_sim_ivf_topk"].spark(spark, sf_dir).collect():
        key = (r["query_id"], r["vec_id"])
        if key in brute:  # brute keeps only its own top-k
            assert r["cos_sim"] == brute[key], f"score drift at {key}"


def test_stream_sessions_match_batch_up_to_boundary(spark, sf_dir):
    """The native streaming session_window and the batch lag-formulation may
    only disagree on events at EXACTLY the gap boundary (documented in
    DIVERGENCES.md); on the jittered fixture they should coincide."""
    batch = QUERIES["op_session_window_batch"].spark(spark, sf_dir).collect()
    stream = QUERIES["op_stream_session_window"].spark(spark, sf_dir).collect()
    batch_keys = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch}
    stream_keys = {
        (r["user_id"], r["session_start_us"], r["n_events"]) for r in stream
    }
    assert len(stream_keys) == len(stream)
    # compare on (user, start-us, n): convert batch timestamps to micros
    batch_us = {
        (u, int(ts.timestamp() * 1_000_000) if hasattr(ts, "timestamp") else ts, n)
        for u, ts, n in batch_keys
    }
    only_stream = stream_keys - batch_us
    only_batch = batch_us - stream_keys
    # identical unless a gap-boundary tie exists in the fixture
    assert not only_stream and not only_batch, (
        f"session drift beyond the documented boundary: +{len(only_stream)} "
        f"-{len(only_batch)}"
    )


def test_bm25_orders_by_term_frequency(spark, sf_dir):
    """Documents with more query-term hits must not score below term-free
    documents; zero-hit documents score exactly 0."""
    rows = QUERIES["op_text_bm25"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        hits = r["tf_spark"] + r["tf_join"] + r["tf_window"]
        if hits == 0:
            assert r["bm25"] == 0.0
        else:
            assert r["bm25"] > 0.0


def test_approx_sketches_bound_error(spark, sf_dir):
    """HLL++ distinct estimates within 5% of exact; t-digest median within
    one quantity step of the exact median (integers, default accuracy).
    The op now returns the bound checks as boolean columns (the oracled
    surface); all must hold."""
    rows = QUERIES["op_sql_approx_sketches"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["nd_within_bound"] is True, r
        assert r["p50_within_bound"] is True, r
        assert r["exact_nd_supp"] > 0 and r["n"] > 0, r


def test_pq_rerank_recall_floor(spark, sf_dir):
    """The ADC-shortlist + exact-rerank op must clear a pinned recall floor
    against the brute-force scan — the production-grade guarantee plain PQ
    (recall ~0.39 on this near-uniform corpus) can't give.  Brute force
    excludes self while PQ ranks it first (distance 0), so at most 9 of the
    rerank top-10 can hit brute's 10 — the 0.7 floor is against that 0.9
    ceiling (measured ~0.93 self-inclusive at the 500-vector corpus)."""
    brute = {}
    for r in QUERIES["op_sim_topk"].spark(spark, sf_dir).collect():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])
    rr = {}
    for r in QUERIES["op_sim_pq_rerank_topk"].spark(spark, sf_dir).collect():
        rr.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(brute) == set(rr)
    hits = sum(len((rr[q] - {q}) & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    assert hits / total >= 0.7, f"PQ-rerank recall collapsed: {hits}/{total}"


def test_trained_ivf_recall_not_worse(spark, sf_dir):
    """Training the coarse quantizer must not hurt recall vs the untrained
    first-K index at the same nprobe (trained cells track the label-clustered
    corpus structure)."""
    brute = {}
    for r in QUERIES["op_sim_topk"].spark(spark, sf_dir).collect():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(name: str) -> float:
        got: dict[int, set[int]] = {}
        for r in QUERIES[name].spark(spark, sf_dir).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(brute[q] & got.get(q, set())) for q in brute)
        return hits / sum(len(brute[q]) for q in brute)

    r_plain = recall("op_sim_ivf_topk")
    r_trained = recall("op_sim_ivf_trained_topk")
    assert r_trained >= r_plain - 0.10, (r_trained, r_plain)
    assert r_trained >= 0.5, r_trained


def test_minhash_recall_against_exact_jaccard(spark, sf_dir):
    """LSH quality harness: every TRUE near-dup pair (exact 3-shingle
    Jaccard >= 0.5, from the exact verifier twin) must appear in the
    MinHash candidate set — banding with b=4, r=4 makes missing a
    0.5-similar pair very unlikely, so recall < 0.9 indicates a broken
    signature/banding.  Candidate-set precision is deliberately lower (the
    16-perm estimate is coarse); the candidate count must still stay within
    a small multiple of the truth set, not explode toward all-pairs."""
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["op_dedup_minhash"].spark(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["op_dedup_ngram_jaccard"].spark(spark, sf_dir).collect()
    }
    truth = {p for p, j in exact.items() if j >= 0.5}
    assert truth, "fixture must contain true near-dups"
    recall = len(truth & mh) / len(truth)
    assert recall >= 0.9, f"LSH recall collapsed: {recall}"
    assert len(mh) <= 20 * len(truth) + 5, (
        f"candidate set exploding: {len(mh)} candidates for {len(truth)} true pairs"
    )


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """4-byte PQ codes must stay far above chance against exact L2 top-10:
    random top-10 from a 2000-vector corpus recalls ~0.005; the seeded
    codebooks measure ~0.39 mean at sf0.01.  Floor set loosely so testdata
    regeneration doesn't flap the suite."""
    import numpy as np

    from daq_3i_spark.plans import QUERIES

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    got = {}
    for r in QUERIES["op_sim_pq_topk"].spark(spark, sf_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for q in sorted(got):
        dq = ((E - E[ids == q][0]) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, dq))][:10].tolist())
        recalls.append(len(exact & got[q]) / 10)
    assert len(recalls) == 8
    assert sum(recalls) / len(recalls) >= 0.15
    assert all(r >= 0.0 for r in recalls)


def test_ivfpq_candidates_respect_probed_cells(spark, sf_dir):
    """Every IVF-PQ result must come from one of its query's probed cells
    (recomputed in numpy with the same L2 + tie-break rules), never be the
    query itself, and rank monotonically by ADC distance."""
    import numpy as np

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.plans.extension_ops2 import _IVF_C, _IVF_NPROBE

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    C = E[ids < _IVF_C]
    d = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cell = {int(v): int(np.argmin(d[i])) for i, v in enumerate(ids)}
    probes = {
        int(v): set(np.argsort(d[i], kind="stable")[:_IVF_NPROBE].tolist())
        for i, v in enumerate(ids)
        if v < 8
    }
    out = QUERIES["op_sim_ivfpq_topk"].spark(spark, sf_dir).collect()
    assert out
    by_q = {}
    for r in out:
        assert r["vec_id"] != r["query_id"]
        assert cell[r["vec_id"]] in probes[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["adc_dist"]))
    for q, lst in by_q.items():
        lst.sort()
        dists = [t[1] for t in lst]
        assert dists == sorted(dists)


def test_anomaly_rank_bucketed_hot_channel_skew(spark):
    """The 100 TB skew proof for op_anomaly_rank_bucketed: on a fixture where
    ONE channel holds ~50% of all rows, the bucketed twin must (a) match the
    global percent_rank window row-for-row including the pr doubles, and
    (b) keep every window-partition (channel, value-bucket) bounded far
    below the hot channel's row count — the structural property that turns
    the one-task-per-channel straggler into uniform bucket-sized tasks."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from daq_3i_spark.plans.reference_ops import _ANOMB_W, anomaly_rank_bucketed

    base = datetime.datetime(2024, 1, 1)
    rows = []
    rid = 0
    for ch, n in [(1, 20000)] + [(c, 500) for c in range(2, 10)]:
        for i in range(n):
            rows.append(
                (rid, ch, base + datetime.timedelta(seconds=rid), (rid * 37 % 5600) / 10.0)
            )
            rid += 1
    cd = spark.createDataFrame(
        rows, "id long, channel_id int, ts timestamp, value double"
    ).repartition(8)
    total = len(rows)
    hot = 20000

    got = sorted(
        (r["id"], r["pr"]) for r in anomaly_rank_bucketed(cd).collect()
    )
    w = Window.partitionBy("channel_id").orderBy("value", "id")
    want = sorted(
        (r["id"], r["pr"])
        for r in cd.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.99)
        .collect()
    )
    assert got == want and len(got) > 0

    # structural boundedness: the largest (channel, bucket) window partition
    # is a tiny fraction of the hot channel
    bucket = F.floor(F.col("value") / F.lit(_ANOMB_W)).cast("long")
    max_bucket = (
        cd.groupBy("channel_id", bucket.alias("b")).count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket * 20 < hot, f"bucket partitions not bounded: {max_bucket}"

    # the integer prefilter actually prunes: ~1% of rows reach the window
    flagged_superset_frac = len(got) / total
    assert flagged_superset_frac < 0.05


def test_containment_catches_subset_jaccard_misses(spark):
    """The lens distinction that justifies op_dedup_containment existing
    beside the Jaccard family: a short passage quoted verbatim inside a much
    longer page has containment 1.0 (every passage shingle appears in the
    page) but Jaccard far below the 0.2 family threshold (diluted by the
    page's extra shingles)."""
    from daq_3i_spark.plans.extension_ops import containment_pairs, ngram_capped_pairs

    quote = " ".join(f"tok{i}" for i in range(10))
    page = quote + " " + " ".join(f"filler{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, "en", page), (2, "en", quote), (3, "en", "unrelated words entirely here")],
        "doc_id long, lang string, text string",
    )
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(docs, tau=0.6).collect()}
    assert cont.get((1, 2)) == 1.0  # every quote shingle is in the page
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_capped_pairs(docs, cap=10**6).collect()}
    assert (1, 2) not in jac  # Jaccard 8/206 ~= 0.04 — below the 0.2 gate
    assert all(p == (1, 2) for p in cont), f"false positives: {cont}"


def test_cluster_keep_survivor_is_longest(spark, sf_dir):
    """op_dedup_cluster_keep contract on the live corpus: exactly one keep
    per component; the keep is the component's longest doc (doc_id
    tiebreak); every drop points at its own component's keep; membership
    equals op_dedup_components'."""
    import pyspark.sql.functions as F

    from daq_3i_spark.sources.tables import load_table

    rows = QUERIES["op_dedup_cluster_keep"].spark(spark, sf_dir).collect()
    comp = {r["doc_id"]: r["component"]
            for r in QUERIES["op_dedup_components"].spark(spark, sf_dir).collect()}
    assert {r["doc_id"]: r["component"] for r in rows} == comp
    lens = {r["doc_id"]: r["qlen"] for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", F.length("text").alias("qlen")).collect()}
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for c, members in by_comp.items():
        keeps = [r for r in members if r["action"] == "keep"]
        assert len(keeps) == 1, f"component {c}: {len(keeps)} keeps"
        keep = keeps[0]
        assert keep["doc_id"] == keep["keep_doc"]
        best = min(members, key=lambda r: (-lens[r["doc_id"]], r["doc_id"]))
        assert keep["doc_id"] == best["doc_id"], f"component {c} kept a shorter doc"
        assert all(r["keep_doc"] == keep["doc_id"] for r in members)


def test_split_safe_keeps_clusters_together(spark, sf_dir):
    """op_corpus_split_safe's leakage guard: every member of a near-dup
    cluster (shared split_key) lands in the SAME split; singletons key on
    their own doc_id; and the guard actually differs from the doc-keyed
    op_corpus_split for at least one clustered doc on the live corpus
    (otherwise the op would be a no-op rename)."""
    from collections import defaultdict

    rows = QUERIES["op_corpus_split_safe"].spark(spark, sf_dir).collect()
    by_key = defaultdict(set)
    for r in rows:
        by_key[r["split_key"]].add(r["split"])
    assert all(len(v) == 1 for v in by_key.values()), "cluster straddles splits"

    clustered = [r for r in rows if r["split_key"] != r["doc_id"]]
    assert clustered, "live corpus has near-dup clusters; none got cluster keys"
    naive = {r["doc_id"]: r["split"]
             for r in QUERIES["op_corpus_split"].spark(spark, sf_dir).collect()}
    moved = [r for r in clustered if naive[r["doc_id"]] != r["split"]]
    assert moved, "cluster keying never changed any doc's split — guard inert"


def test_softdedup_weights_conserve_cluster_mass(spark, sf_dir):
    """op_corpus_softdedup_weights: every doc appears exactly once; each
    near-dup cluster's total weight is exactly 1 (sum of 1/n over n
    members); singletons weigh exactly 1.0; total mass = #content units."""
    from daq_3i_spark.plans import QUERIES

    rows = QUERIES["op_corpus_softdedup_weights"].spark(spark, sf_dir).collect()
    comp_rows = QUERIES["op_dedup_components"].spark(spark, sf_dir).collect()
    in_cluster = {r["doc_id"]: r["comp_size"] for r in comp_rows}

    assert len({r["doc_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["comp_size"] == in_cluster.get(r["doc_id"], 1)
        assert r["weight"] == 1.0 / r["comp_size"]
    n_docs = len(rows)
    n_clustered = len(in_cluster)
    n_units = (n_docs - n_clustered) + len({
        r["component"] for r in comp_rows
    })
    total = sum(r["weight"] for r in rows)
    assert abs(total - n_units) < 1e-9


def test_ivf_recall_eval_invariants(spark, sf_dir):
    """op_sim_ivf_recall_eval: one row per query vector, hits bounded by k,
    recall is exactly n_hits/k, and the probe-everything degenerate bound
    holds (recall cannot exceed 1)."""
    from daq_3i_spark.plans import QUERIES

    rows = QUERIES["op_sim_ivf_recall_eval"].spark(spark, sf_dir).collect()
    assert len(rows) == 8 and len({r["query_id"] for r in rows}) == 8
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"] == 10
        assert r["recall_at_k"] == r["n_hits"] / 10


def test_ivf_cells_scale_with_corpus(spark, sf_dir, tmp_path):
    """The coarse quantizer scales with the corpus: cell count is exactly the
    _IVF_C floor at every oracled scale (so the static oracle SQL stays
    bit-valid), and grows as n // _IVF_TARGET once the corpus outgrows
    floor * target — cell POPULATIONS stay bounded instead of inflating
    with data size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from daq_3i_spark.plans.extension_ops2 import _IVF_C, _IVF_TARGET, _ivf_cells

    # every shipped test scale sits under the floor
    assert _ivf_cells(sf_dir) == _IVF_C
    assert _ivf_cells("/root/testdata/sf0.1") == _IVF_C

    # a corpus past floor * target grows the quantizer proportionally
    n = _IVF_C * _IVF_TARGET * 2 + 123
    d = tmp_path / "big_sf"
    d.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n), pa.int64())}),
        str(d / "embeddings.parquet"),
    )
    assert _ivf_cells(str(d)) == n // _IVF_TARGET == 2 * _IVF_C

    # past _IVF_TARGET^2 vectors the isqrt cap binds: C = sqrt(n), the
    # exact-blocking optimum (assignment n*C balances in-cell pair work
    # n^2/C at n^1.5 — the r14 fix for the quadratic assignment term the
    # 50x curve probe measured under the pure population rule)
    import math

    n2 = _IVF_TARGET * _IVF_TARGET * 4  # 4M vectors (vec_id-only: ~32 MB)
    d2 = tmp_path / "huge_sf"
    d2.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n2), pa.int64())}),
        str(d2 / "embeddings.parquet"),
    )
    assert _ivf_cells(str(d2)) == math.isqrt(n2) == 2048 < n2 // _IVF_TARGET


def test_ivf_oracle_guard_raises_past_validity_bound():
    """Every IVF-family oracle bakes the _IVF_C-cell floor; past
    IVF_ORACLE_MAX_ROWS the Spark plan grows the quantizer (_ivf_cells) and
    the static SQL would compute a DIFFERENT query.  The _ivf_oracle_bound
    wrapper makes that divergence a loud DuckDB error() instead of a silent
    wrong-semantics comparison (r13 ADVICE)."""
    import duckdb
    import pytest

    from daq_3i_spark.plans.extension_ops2 import (
        IVF_ORACLE_MAX_ROWS,
        _ivf_oracle_bound,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id "
        f"FROM range({IVF_ORACLE_MAX_ROWS - 1})"
    )
    inner = "WITH en AS (SELECT 1 AS x) SELECT * FROM en"
    assert con.execute(_ivf_oracle_bound(inner)).fetchall() == [(1,)]

    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id "
        f"FROM range({IVF_ORACLE_MAX_ROWS})"
    )
    with pytest.raises(Exception, match="IVF oracle out of validity bound"):
        con2.execute(_ivf_oracle_bound(inner)).fetchall()


def test_ivf_oracle_guard_fires_on_empty_result_too():
    """ADVICE r14 (low): the cross-join guard alone is prunable when the
    wrapped query yields zero rows — an out-of-bound corpus whose stale
    16-cell oracle happens to produce nothing would degrade to a silently
    green empty-vs-empty comparison.  The shadow-CTE guard closes the hole:
    it rides the embeddings SCAN, which an out-of-bound corpus (>= bound
    rows, by definition non-empty) must execute even when the query result
    is empty."""
    import duckdb
    import pytest

    from daq_3i_spark.plans.extension_ops2 import (
        IVF_ORACLE_MAX_ROWS,
        _ivf_oracle_bound,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id "
        f"FROM range({IVF_ORACLE_MAX_ROWS})"
    )
    # data-dependent empty result over an out-of-bound corpus
    empty = (
        "WITH en AS (SELECT vec_id FROM embeddings) "
        "SELECT * FROM en WHERE vec_id < 0"
    )
    with pytest.raises(Exception, match="IVF oracle out of validity bound"):
        con.execute(_ivf_oracle_bound(empty)).fetchall()

    # same query under the bound: empty result, NO error
    con3 = duckdb.connect()
    con3.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id "
        f"FROM range({IVF_ORACLE_MAX_ROWS - 1})"
    )
    assert con3.execute(_ivf_oracle_bound(empty)).fetchall() == []


def test_ivf_oracle_guard_rejects_unspliceable_prefixes():
    """ADVICE r15 (low): the WITH-prefix precondition is a real ValueError,
    not an ``assert`` — under ``python -O`` an assert is stripped and a
    non-WITH oracle would be silently spliced into malformed SQL.  WITH
    RECURSIVE is rejected explicitly (splicing the shadow CTE ahead of it
    would strand the RECURSIVE keyword mid-list), and prefix matching
    tolerates case and internal whitespace rather than requiring the exact
    bytes ``"WITH "``."""
    import duckdb
    import pytest

    from daq_3i_spark.plans.extension_ops2 import (
        IVF_ORACLE_MAX_ROWS,
        _ivf_oracle_bound,
    )

    with pytest.raises(ValueError, match="starting with WITH"):
        _ivf_oracle_bound("SELECT 1 AS x")
    with pytest.raises(ValueError, match="starting with WITH"):
        _ivf_oracle_bound("WITHOUT en AS (SELECT 1) SELECT * FROM en")
    with pytest.raises(ValueError, match="RECURSIVE"):
        _ivf_oracle_bound(
            "WITH RECURSIVE t AS (SELECT 1 AS x) SELECT * FROM t"
        )
    # case/whitespace-tolerant prefixes still splice into runnable SQL
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id "
        f"FROM range({IVF_ORACLE_MAX_ROWS - 1})"
    )
    for inner in (
        "with en AS (SELECT 1 AS x) SELECT * FROM en",
        "WITH\n  en AS (SELECT 1 AS x) SELECT * FROM en",
    ):
        assert con.execute(_ivf_oracle_bound(inner)).fetchall() == [(1,)]


def test_every_ivf_floor_oracle_carries_the_guard():
    """Each registered oracle whose Spark plan calls _ivf_cells must carry
    the validity guard — including op_sim_ivf_recall_eval, which inherits it
    by composing op_sim_ivf_topk's registered oracle verbatim."""
    from daq_3i_spark.plans.registry import QUERIES

    affected = [
        "op_sim_ivf_topk",
        "op_sim_kmeans_assign",
        "op_sim_ivf_trained_topk",
        "op_sim_ivfpq_topk",
        "op_dedup_semantic",
        "op_sim_knn_graph",
        "op_sim_ivf_recall_eval",
    ]
    for name in affected:
        assert "__ivf_guard" in QUERIES[name].oracle, name


def test_table_rows_matches_engine_counts(spark, sf_dir):
    """Footer statistics agree with the engine row count (the number every
    size-derived parameter is planned from)."""
    from daq_3i_spark.sources.tables import load_table, table_rows

    for t in ("embeddings", "documents"):
        assert table_rows(sf_dir, t) == load_table(spark, sf_dir, t).count()
