"""Hot-cell sub-split contract of the all-pairs cosine kernel.

cos_block_pairs (functions/vectors.py) is the pair engine behind
op_dedup_embedding / op_dedup_semantic / op_sim_knn_graph.  Its scale hazard
was the one-task-per-block applyInPandas contract: with constant block
counts, a 100x corpus makes every block 100x bigger — 10,000x pair work on a
single core.  The salt-grid split (triangle partitioning) spreads an
oversized block across ~(n/cell_cap)^2/2 tasks with an IDENTICAL pair set
and bit-identical cos_sim values.  These tests pin both properties on a
90%-hot-label corpus (the viral_chunk_dir precedent shape).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daq_3i_spark.functions.vectors import _salted_blocks, cos_block_pairs

_DIM = 8


def _mk_emb(spark, n: int, hot: bool = True):
    """n unit-ish vectors; 90% in label 0 when hot (the skew shape)."""
    rows = []
    for i in range(n):
        label = 0 if (hot and i % 10 != 9) else (i % 10)
        # deterministic pseudo-random direction, no two collinear
        vec = [math.sin(0.7 * i + 1.3 * d) + 0.01 * d for d in range(_DIM)]
        nrm = math.sqrt(sum(x * x for x in vec))
        rows.append((i, label, [x / nrm for x in vec]))
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("label", T.IntegerType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )


def _collect_pairs(df) -> dict:
    return {
        (r["vec_a"], r["vec_b"]): (r["label"], r["cos_sim"]) for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [-2.0, 0.2])
def test_split_pair_set_bit_identical(spark, threshold):
    """cell_cap small enough to force the salt grid must produce EXACTLY the
    unsplit kernel's pairs — same set, same label, bitwise-equal cos_sim
    (dim-sequential accumulation + IEEE-commutative multiply make the value
    orientation-free, so cross-salt tasks can't drift by a ULP)."""
    emb = _mk_emb(spark, 240, hot=True)
    unsplit = _collect_pairs(cos_block_pairs(emb, threshold, cell_cap=1 << 30))
    split = _collect_pairs(cos_block_pairs(emb, threshold, cell_cap=24))
    assert split == unsplit  # exact float equality on every cos_sim
    # sanity: the hot label actually produced the quadratic bulk
    hot_pairs = sum(1 for v in unsplit.values() if v[0] == 0)
    assert hot_pairs > len(unsplit) * 0.8


def test_hot_cell_spans_many_tasks(spark):
    """The scale property itself: with 90% of rows in one label and the cap
    engaged, no single applyInPandas group (== one task) holds the hot
    block — group sizes stay ~2*cell_cap-bounded and the hot label spreads
    over many groups."""
    emb = _mk_emb(spark, 500, hot=True)
    cap = 32
    blocks = _salted_blocks(emb, cell_cap=cap)
    per_group = (
        blocks.groupBy("label", "_lo", "_hi").count().collect()
    )
    hot_groups = [r for r in per_group if r["label"] == 0]
    n_hot = 450
    s = math.ceil(n_hot / cap)  # expected salt count for the hot block
    assert len(hot_groups) == s * (s + 1) // 2, "triangle grid incomplete"
    # no group may approach the unsplit block: intra ~n/s, cross ~2n/s,
    # allow 2x slack for hash-salt imbalance
    assert max(r["count"] for r in hot_groups) <= 4 * n_hot / s
    assert all(r["count"] < n_hot for r in hot_groups)


def test_pair_coverage_exactly_once(spark):
    """Every unordered pair within a label lands in exactly one group:
    pair count at threshold -2 equals sum over labels of C(n_label, 2)."""
    emb = _mk_emb(spark, 200, hot=True)
    got = cos_block_pairs(emb, -2.0, cell_cap=16).count()
    sizes = [r["c"] for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()]
    want = sum(c * (c - 1) // 2 for c in sizes)
    assert got == want


def test_null_embeddings_dropped(spark):
    """NULL embeddings are excluded before sizing AND pairing (parity with
    the kernel's historical dropna behavior)."""
    emb = _mk_emb(spark, 60, hot=False)
    nulled = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(F.col("embedding")),
    )
    pairs = _collect_pairs(cos_block_pairs(nulled, -2.0, cell_cap=8))
    dropped = {i for i in range(60) if i % 7 == 0}
    assert pairs
    assert not any(a in dropped or b in dropped for a, b in pairs)


def test_null_label_rows_form_their_own_block(spark):
    """NULL labels pair WITHIN a null block, exactly like the plain
    groupBy('label') the salt grid replaced: the sizes join is null-safe,
    so nullable-label callers don't silently lose rows (r13 ADVICE).
    Split and unsplit kernels agree on the null block too."""
    rows = []
    for i in range(60):
        label = None if i % 3 == 0 else i % 2
        vec = [math.sin(0.7 * i + 1.3 * d) + 0.01 * d for d in range(_DIM)]
        nrm = math.sqrt(sum(x * x for x in vec))
        rows.append((i, label, [x / nrm for x in vec]))
    emb = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("label", T.IntegerType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    unsplit = _collect_pairs(cos_block_pairs(emb, -2.0, cell_cap=1 << 30))
    split = _collect_pairs(cos_block_pairs(emb, -2.0, cell_cap=8))
    assert split == unsplit
    n_null = 20
    null_pairs = [k for k, v in unsplit.items() if v[0] is None]
    assert len(null_pairs) == n_null * (n_null - 1) // 2  # all within-null pairs
