"""Adversarial documents-corpus parity: shapes the shipped corpus doesn't
contain but a testdata regeneration legally could — an over-long document
(2000 tokens, past the 1600-token ceiling the old hard-coded oracle chunk
cap silently imposed), empty text, a single token, a viral one-token
repeat, and exact duplicates.  Every documents-driven op below must stay
hash-identical to its DuckDB oracle on this corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from daq_3i_spark.plans import QUERIES
from daq_3i_spark.schemas import ALL_TABLES
from oracle_check import compare, run_oracle

OPS = [
    "op_dedup_exact",
    "op_dedup_substring",
    "op_corpus_budget_sample",
    "op_corpus_dedup_sample",
    "op_text_stats",
    "op_text_tokens",
    "op_text_chunk",
    "op_text_fingerprint",
    "op_dedup_minhash",
    "op_dedup_ngram_jaccard",
    "op_dedup_containment",
    "op_dedup_cluster_keep",
    "op_pack_sequences",
    "op_text_repetition",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adversarial") / "sf")
    os.makedirs(d)
    for t in ALL_TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    long_doc = " ".join(f"tok{i % 37}" for i in range(2000))  # > 1600 tokens
    docs = [
        (0, long_doc, "en", "srcA"),
        (1, "", "en", "srcA"),  # empty text
        (2, "solo", "en", "srcA"),  # single token
        (3, " ".join(["viral"] * 64), "en", "srcB"),  # one-token repeat
        (4, "alpha beta gamma delta epsilon zeta", "en", "srcB"),
        (5, "alpha beta gamma delta epsilon zeta", "en", "srcB"),  # exact dup
        (6, "alpha beta gamma delta epsilon eta", "en", "srcB"),  # near dup
        (7, "the quick brown fox jumps over the lazy dog", "de", "srcC"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs]),
            "lang": pa.array([r[2] for r in docs]),
            "source": pa.array([r[3] for r in docs]),
            "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", OPS)
def test_adversarial_corpus_oracle_parity(spark, adversarial_dir, name):
    q = QUERIES[name]
    problems = compare(q.spark(spark, adversarial_dir), run_oracle(q.oracle, adversarial_dir))
    assert not problems, f"{name} on adversarial corpus: {problems}"


def test_embeddings_norm_invariants(spark, sf_dir):
    """Pin the two embedding-corpus invariants the cosine/ANN families
    depend on, so a testdata regeneration that breaks them fails HERE with
    an explanation instead of as a mystery hash flap: (1) no zero-norm
    vectors — Spark computes 0/0 cosine as IEEE NaN while the DuckDB oracle
    yields NULL, which order differently under DESC ranking; (2) near-unit
    norms — op_sim_pq_rerank_topk's exact-L2 rerank reproduces cosine order
    only for unit vectors."""
    import math

    from daq_3i_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    assert rows
    for r in rows:
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert 0.99 <= n <= 1.01, (
            f"vec {r['vec_id']} has norm {n}: zero/non-unit norms break the "
            "NaN-vs-NULL cosine convention and the L2==cosine rerank ordering"
        )


@pytest.fixture(scope="module")
def viral_chunk_dir(spark, sf_dir, tmp_path_factory):
    """90% of documents share ONE identical 32-token chunk (the web-corpus
    boilerplate-paragraph shape): the md5 of that chunk is a viral key that
    would single-task a Window.partitionBy(md5(chunk)) plan."""
    d = str(tmp_path_factory.mktemp("viral_chunk") / "sf")
    os.makedirs(d)
    for t in ALL_TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    boiler = " ".join(f"b{i}" for i in range(32))  # one full shared chunk
    docs = []
    for i in range(200):
        if i % 10 == 9:  # 10%: unique text only
            body = " ".join(f"u{i}w{j}" for j in range(40))
        else:  # 90%: the shared chunk + a unique tail
            body = boiler + " " + " ".join(f"u{i}w{j}" for j in range(8))
        docs.append((i, body, "en", f"src{i % 3}"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs]),
            "lang": pa.array([r[2] for r in docs]),
            "source": pa.array([r[3] for r in docs]),
            "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", ["op_dedup_substring", "op_corpus_dedup_sample"])
def test_viral_chunk_corpus_oracle_parity(spark, viral_chunk_dir, name):
    """The substring-dedup kernels must stay hash-identical to the oracle on
    a corpus where one chunk dominates — and their plans carry NO window
    over the chunk hash (the r12 agg+join rewrite: a viral chunk is an
    AQE-splittable join partition, never one unsplittable window task)."""
    q = QUERIES[name]
    df = q.spark(spark, viral_chunk_dir)
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    bad = [s for s in specs if "__rank_pid" not in s]
    assert not bad, f"{name}: chunk-hash window back in the plan: {bad}"
    problems = compare(df, run_oracle(q.oracle, viral_chunk_dir))
    assert not problems, f"{name} on viral-chunk corpus: {problems}"
