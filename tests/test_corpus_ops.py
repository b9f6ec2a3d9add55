"""Edge-case oracle parity for the training-corpus prep ops
(plans/corpus_ops.py) on a hand-built documents table: packing budget
boundaries (doc ending exactly on a cut, doc spanning several sequences),
single-token documents (the dup_bigram guard), fully-repeated text, and a
contamination hit/miss pair.  The sf0.01 sweep covers the bulk statistics;
these pin the branches the synthetic corpus may not hit."""

from __future__ import annotations

import os
import shutil

import pytest

from daq_3i_spark.plans import QUERIES
from oracle_check import compare, run_oracle

BUDGET = 256


def _mkdocs(spark, tmp_path, rows):
    """Write a custom documents.parquet + the other tables from sf0.001 so
    run_oracle can register every view."""
    d = str(tmp_path / "sf_edge")
    os.makedirs(d, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{name}.parquet",
                    os.path.join(d, f"{name}.parquet"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    # one plain FILE (not a Spark directory): both engines read it identically
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def _rows():
    exact = " ".join(["tok"] * BUDGET)          # ends exactly on a cut
    spanning = " ".join(["w"] * (3 * BUDGET + 7))  # spans 4 sequences
    return [
        (1, "solo", "en", "web", 4),                      # 1 token: bigram guard
        (2, "a b a b a b", "en", "web", 11),              # fully repeated bigrams
        (3, exact, "en", "web", len(exact)),
        (4, spanning, "en", "web", len(spanning)),
        (5, "the quick brown fox jumps over the lazy dog", "en", "books", 44),
        (10, "shared shingle text here", "en", "web", 24),    # train, contaminated
        (11, "totally different words entirely", "en", "web", 32),  # train, clean
        (0, "shared shingle text here", "en", "eval", 24),         # eval doc (0 % 97 == 0)
        (97, "held out benchmark prompt", "en", "eval", 25),       # eval doc, no twin
    ]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    return _mkdocs(spark, tmp_path_factory.mktemp("corpus_edge"), _rows())


@pytest.mark.parametrize(
    "op",
    [
        "op_pack_sequences",
        "op_contamination_check",
        "op_text_repetition",
        # edge corpus also exercises op_dedup_substring's n_kept=0 branch:
        # docs 0 and 10 share their single sub-16-token chunk, so doc 10
        # rebuilds to the empty string (md5('') must agree cross-engine)
        "op_dedup_substring",
    ],
)
def test_edge_corpus_matches_oracle(spark, edge_dir, op):
    q = QUERIES[op]
    problems = compare(q.spark(spark, edge_dir), run_oracle(q.oracle, edge_dir))
    assert not problems, problems


def test_packing_boundaries(spark, edge_dir):
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["op_pack_sequences"].spark(spark, edge_dir).collect()
    }
    # doc 3 fills sequence 0 of 'web' exactly... but packing order within the
    # source shard is doc_id order: docs 1 (1 tok) and 2 (6 toks) come first.
    web_prefix = 1 + 6
    d3 = got[3]
    assert d3["start_seq"] == web_prefix // BUDGET == 0
    assert d3["seq_offset"] == web_prefix
    assert d3["end_seq"] == (web_prefix + BUDGET - 1) // BUDGET == 1
    # doc 4 starts right where doc 3 ended and spans 4 budget windows
    d4 = got[4]
    assert d4["seq_offset"] == (web_prefix + BUDGET) % BUDGET == web_prefix
    assert d4["n_seqs"] == 4
    # 'books' shard packs independently of 'web'
    d5 = got[5]
    assert d5["start_seq"] == 0 and d5["seq_offset"] == 0


def test_repetition_guards(spark, edge_dir):
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["op_text_repetition"].spark(spark, edge_dir).collect()
    }
    assert got[1]["dup_bigram_frac"] == 0.0          # single token: guard branch
    assert got[1]["top_unigram_frac"] == 1.0
    # "a b a b a b": 5 bigrams, 2 distinct -> 3/5 duplicated
    assert got[2]["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert got[3]["top_unigram_frac"] == 1.0         # all-same token


def test_contamination_flags_only_real_overlap(spark, edge_dir):
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["op_contamination_check"].spark(spark, edge_dir).collect()
    }
    assert 10 in got, "doc sharing eval shingles must be flagged"
    assert got[10]["n_eval_docs"] == 1
    assert 11 not in got, "clean doc must not be flagged"
    assert 0 not in got and 97 not in got, "eval docs are not training docs"


def test_substring_dedup_first_occurrence(spark, tmp_path_factory):
    """Passage-level semantics: a chunk repeated verbatim in a later document
    is dropped there (first occurrence = smallest (doc_id, chunk_id)); a
    fully-duplicated document rebuilds to the empty string."""
    import hashlib

    a = " ".join(f"a{i}" for i in range(32))                   # 2 chunks
    chunk2 = " ".join(f"a{i}" for i in range(16, 32))
    b = chunk2 + " " + " ".join(f"b{i}" for i in range(16))    # chunk1 == a.chunk2
    rows = [
        (1, a, "en", "web", len(a)),
        (2, b, "en", "web", len(b)),
        (3, a, "en", "web", len(a)),                            # full duplicate
    ]
    d = _mkdocs(spark, tmp_path_factory.mktemp("substr"), rows)
    q = QUERIES["op_dedup_substring"]
    got = {r["doc_id"]: r for r in q.spark(spark, d).collect()}
    assert (got[1]["n_chunks"], got[1]["n_kept"]) == (2, 2)
    assert (got[2]["n_chunks"], got[2]["n_kept"]) == (2, 1)
    b_kept = " ".join(f"b{i}" for i in range(16))
    assert got[2]["clean_md5"] == hashlib.md5(b_kept.encode()).hexdigest()
    assert (got[3]["n_chunks"], got[3]["n_kept"]) == (2, 0)
    assert got[3]["clean_md5"] == hashlib.md5(b"").hexdigest()
    problems = compare(q.spark(spark, d), run_oracle(q.oracle, d))
    assert not problems, problems


def test_budget_sample_fills_each_source(spark, sf_dir):
    """Greedy-fill invariants per source: every selected doc starts under the
    budget, dropping the last selected doc leaves the budget unfilled (or the
    source is exhausted), and the selection is deterministic across runs."""
    from daq_3i_spark.plans.corpus_ops import _MIX_BUDGET

    q = QUERIES["op_corpus_budget_sample"]
    rows = q.spark(spark, sf_dir).collect()
    from pyspark.sql import functions as F

    n_docs = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, sel in by_src.items():
        sel.sort(key=lambda r: r["sample_rank"])
        ranks = [r["sample_rank"] for r in sel]
        assert ranks == list(range(1, len(sel) + 1)), "selection is a hash-order prefix"
        for r in sel:
            assert r["cum_tokens"] - r["n_tokens"] < _MIX_BUDGET
        # either the budget is filled or the source is exhausted
        assert sel[-1]["cum_tokens"] >= _MIX_BUDGET or len(sel) == n_docs[src]
    again = {(r["doc_id"], r["cum_tokens"]) for r in q.spark(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["cum_tokens"]) for r in rows}


def test_lm_score_separates_boilerplate_from_soup(spark, tmp_path_factory):
    """A corpus where one bigram dominates: documents made of the dominant
    pair score near 1, a document of singleton bigrams scores 0 (support <5
    pairs fall out of the LM)."""
    boiler = " ".join(["click here"] * 10)         # "click here" df 10+, "here click" df 9
    soup = " ".join(f"u{i}" for i in range(20))    # every bigram unique
    rows = [(i, boiler, "en", "web", len(boiler)) for i in range(3)]
    rows.append((9, soup, "en", "web", len(soup)))
    d = _mkdocs(spark, tmp_path_factory.mktemp("lm"), rows)
    q = QUERIES["op_text_lm_score"]
    got = {r["doc_id"]: r for r in q.spark(spark, d).collect()}
    assert got[9]["lm_score"] == 0.0
    for i in range(3):
        # 19 bigrams per boiler doc: 10x "click here" (P=1) + 9x "here click"
        # (P=1) -> every bigram fully predictable, score 1
        assert got[i]["lm_score"] == pytest.approx(1.0)
    problems = compare(q.spark(spark, d), run_oracle(q.oracle, d))
    assert not problems, problems


def test_substring_dedup_random_corpora_cross_engine(spark, tmp_path_factory):
    """Seeded random corpora with forced chunk collisions: Spark and DuckDB
    must agree exactly, and the global invariant holds — across all docs,
    every distinct chunk text survives exactly once."""
    import random

    rng = random.Random(0xC0FFEE)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> frequent collisions
    for trial in range(3):
        rows = []
        for doc_id in range(rng.randint(3, 9)):
            n = rng.randint(1, 40)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append((doc_id, text, "en", "web", len(text)))
        d = _mkdocs(spark, tmp_path_factory.mktemp(f"fz{trial}"), rows)
        q = QUERIES["op_dedup_substring"]
        problems = compare(q.spark(spark, d), run_oracle(q.oracle, d))
        assert not problems, f"trial {trial}: {problems}"
        # global uniqueness: recompute kept chunks in python
        seen, kept_counts = set(), {}
        for doc_id, text, *_ in sorted(rows):
            toks = text.lower().split(" ")
            kept = 0
            for c in range(0, len(toks), 16):
                chunk = " ".join(toks[c : c + 16])
                if chunk not in seen:
                    seen.add(chunk)
                    kept += 1
            kept_counts[doc_id] = kept
        got = {r["doc_id"]: r["n_kept"] for r in q.spark(spark, d).collect()}
        assert got == kept_counts, f"trial {trial}"


def test_dedup_sample_composite_counts_postdedup_tokens(spark, tmp_path_factory):
    """The budget must fill over POST-dedup token counts: a fully-duplicated
    document contributes nothing and is never sampled; a partially-duplicated
    document is charged only for its surviving chunks."""
    a = " ".join(f"a{i}" for i in range(32))                  # 2 chunks, 32 toks
    b = " ".join(f"a{i}" for i in range(16)) + " " + " ".join(
        f"b{i}" for i in range(8)
    )                                                          # chunk1 dup of a's
    rows = [
        (1, a, "en", "web", len(a)),
        (2, b, "en", "web", len(b)),
        (3, a, "en", "web", len(a)),                           # full duplicate
    ]
    d = _mkdocs(spark, tmp_path_factory.mktemp("ds"), rows)
    q = QUERIES["op_corpus_dedup_sample"]
    got = {r["doc_id"]: r for r in q.spark(spark, d).collect()}
    assert 3 not in got, "fully-duplicated doc must not be sampled"
    assert got[1]["n_tokens"] == 32
    assert got[2]["n_tokens"] == 8, "only the surviving 8-token chunk counts"
    problems = compare(q.spark(spark, d), run_oracle(q.oracle, d))
    assert not problems, problems


def test_dsir_weights_target_separation(spark, tmp_path_factory):
    rows = [
        # target corpus ('src0'): formal phrasing with shared bigrams
        (1, "the model learns the data distribution", "en", "src0", 38),
        (2, "the data distribution shapes the model", "en", "src0", 38),
        (3, "the model fits the data", "en", "src0", 23),
        # in-distribution raw doc: shares the target's bigrams
        (10, "the model learns the data", "en", "web", 25),
        # off-distribution raw doc: disjoint vocabulary
        (11, "zebra quantum pickle vortex banana", "en", "web", 34),
        # single-token doc: no bigrams -> excluded from the output
        (12, "solo", "en", "web", 4),
    ]
    d = _mkdocs(spark, tmp_path_factory.mktemp("dsir"), rows)
    q = QUERIES["op_corpus_dsir_weights"]
    df = q.spark(spark, d)
    assert compare(df, run_oracle(q.oracle, d)) == []
    got = {r["doc_id"]: r for r in df.collect()}
    assert 12 not in got, "a 1-token doc has no bigram features"
    assert got[10]["n_feats"] == 4, "5 tokens -> 4 bigram features"
    # importance ranking: in-distribution raw doc > off-distribution raw doc,
    # and every target doc also outscores the off-distribution doc
    assert got[10]["dsir_score"] > got[11]["dsir_score"]
    assert min(got[i]["dsir_score"] for i in (1, 2, 3)) > got[11]["dsir_score"]


def test_dsir_scaled_term_clips(spark):
    """The per-feature fixed-point term must clip at _DSIR_CLIP (both a
    DSIR weight-clipping convention and the int64-sum headroom bound), and
    the clip applies pre-cast so extreme bucket skew can never overflow the
    BIGINT conversion."""
    import pyspark.sql.functions as F

    from daq_3i_spark.plans.corpus_ops import _DSIR_CLIP, _DSIR_SCALED

    row = spark.createDataFrame(
        [(10**9, 2, 10**9 + 256, 10**13)],
        "p_cnt long, q_cnt long, p_tot long, q_tot long",
    )
    got = row.select(F.expr(_DSIR_SCALED).alias("s")).collect()[0]["s"]
    assert got == _DSIR_CLIP


def test_dsir_select_is_weight_proportional_subset(spark, sf_dir):
    """The resampling op must (a) hash-match its oracle, (b) select a strict
    weight-biased subset of the scored corpus, and (c) always keep the
    top-scored document (its threshold is exactly 1e6, above any coin)."""
    wq = QUERIES["op_corpus_dsir_weights"]
    sq = QUERIES["op_corpus_dsir_select"]
    assert compare(sq.spark(spark, sf_dir), run_oracle(sq.oracle, sf_dir)) == []
    scored = {r["doc_id"]: r["dsir_score"] for r in wq.spark(spark, sf_dir).collect()}
    kept = {r["doc_id"]: r["dsir_score"] for r in sq.spark(spark, sf_dir).collect()}
    assert kept and set(kept) < set(scored), "selection must be a proper subset"
    assert all(kept[d] == scored[d] for d in kept), "scores must pass through"
    top = max(scored, key=lambda d: (scored[d], d))
    assert top in kept, "the max-weight doc is kept with probability 1"
    # weight bias: the kept set's mean score exceeds the dropped set's
    dropped = [scored[d] for d in scored if d not in kept]
    assert sum(kept.values()) / len(kept) > sum(dropped) / len(dropped)


def test_code_detect_constructed(spark):
    """op_text_code_detect on constructed docs: a code snippet (braces,
    semicolons, indentation) fires the gate, prose does not, and the
    marker counts are exact."""
    from unittest import mock

    from daq_3i_spark.plans.extension_ops import op_text_code_detect

    code = "int main() {\n    int x = 1;\n    if (x == 1) {\n    }\n}"
    prose = "The quick brown fox jumps over the lazy dog. " * 4
    docs = spark.createDataFrame(
        [(1, code, "en", "web", len(code)), (2, prose, "en", "web", len(prose))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch(
        "daq_3i_spark.plans.extension_ops.load_spread", lambda s, d, t: docs
    ):
        out = {r["doc_id"]: r for r in op_text_code_detect(spark, "unused").collect()}
    c = out[1]
    assert c["n_braces"] == 4 and c["n_semicolons"] == 1
    assert c["n_indents"] == 3 and c["n_eqeq"] == 1
    assert c["is_code"] and not out[2]["is_code"]
    assert out[2]["n_braces"] == 0 and out[2]["code_density"] == 0.0


def test_curriculum_stages_are_length_ordered(spark, sf_dir):
    """op_corpus_curriculum invariants: every doc staged exactly once,
    stages 1..4 with exact-ntile sizes (first N%4 stages get the extra
    doc), and stage boundaries are length-monotone (max length of stage k
    <= min length of stage k+1 up to the doc_id tie-break)."""
    from daq_3i_spark.plans import QUERIES

    rows = QUERIES["op_corpus_curriculum"].spark(spark, sf_dir).collect()
    n = len(rows)
    assert len({r["doc_id"] for r in rows}) == n
    sizes = {}
    bounds = {}
    for r in rows:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
        lo, hi = bounds.get(r["stage"], (None, None))
        key = (r["n_chars"], r["doc_id"])
        bounds[r["stage"]] = (
            key if lo is None or key < lo else lo,
            key if hi is None or key > hi else hi,
        )
    q, rem = divmod(n, 4)
    assert sizes == {k: q + (1 if k <= rem else 0) for k in (1, 2, 3, 4)}
    for k in (1, 2, 3):
        assert bounds[k][1] < bounds[k + 1][0]


@pytest.mark.parametrize(
    "op",
    [
        "op_text_bpe_tokens",
        "op_pack_sequences_bpe",
        # the edge corpus contains one exact near-dup pair (docs 0 and 10),
        # so the sweep's tau=0.7 level is non-empty here — the branch the
        # synthetic corpus exercises only at bulk scale
        "op_dedup_threshold_sweep",
    ],
)
def test_bpe_ops_edge_corpus_match_oracle(spark, edge_dir, op):
    q = QUERIES[op]
    problems = compare(q.spark(spark, edge_dir), run_oracle(q.oracle, edge_dir))
    assert not problems, problems


def test_bpe_counts_bound_whitespace_counts(spark, sf_dir):
    """Toy-BPE pieces per word lie in [1, word_length], so the doc total is
    bounded below by the whitespace count and above by the character count —
    pinned on the real corpus so a broken merge chain (0 pieces, runaway
    pieces) can't pass silently."""
    from pyspark.sql import functions as F

    bad = (
        QUERIES["op_text_bpe_tokens"].spark(spark, sf_dir)
        .filter(
            (F.col("n_bpe_tokens") < F.col("n_ws_tokens"))
            | (F.col("n_bpe_tokens") <= 0)
            | (F.col("chars_per_token") <= 0.0)
        )
        .count()
    )
    assert bad == 0


def test_threshold_sweep_curve_is_monotone(spark, sf_dir):
    """Raising tau can only shrink the qualifying pair set, so both curve
    columns must be non-increasing in tau, and every tau level must be a
    subset of the banded candidates (n_pairs <= the 0.4-level count, which
    itself is bounded by the verified-pair frame)."""
    rows = sorted(
        QUERIES["op_dedup_threshold_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r["tau"],
    )
    assert rows, "sweep returned no thresholds at all"
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_pairs"] >= hi["n_pairs"]
        assert lo["n_docs"] >= hi["n_docs"]
    for r in rows:
        # a pair touches exactly 2 docs; n_docs can't exceed 2*n_pairs
        assert r["n_docs"] <= 2 * r["n_pairs"]
