"""Vector math over ``array<float>`` embedding columns.

Two formulations, one semantics:

* :func:`dot_fold` — zero-shuffle sequential fold (``F.zip_with`` +
  ``F.aggregate``), pure Catalyst, the fast path for scoring.
* :func:`explode_dot` — posexplode + *exact decimal* sum.  Used in the
  oracle-checked plans: decimal addition is associative, so the result is
  independent of aggregation order and bit-identical to the DuckDB oracle
  (a double sum would depend on each engine's accumulation order).

Per-element products are cast DOUBLE before multiplying (the embeddings are
float32; float multiply would lose the cross-engine bit guarantee), then cast
DECIMAL(38,25) — a double product can never sit exactly on a 1e-25 rounding
boundary (no dyadic rational is a non-dyadic decimal multiple), so the cast
is unambiguous in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC_DOT = "decimal(38,25)"


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential double fold of the dot product (no shuffle; works for any
    dim).  NB: higher-order functions are interpreted, not codegen'd — for
    fixed-dim hot paths prefer :func:`dot_unrolled`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_fold(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / F.sqrt(dot_fold(a, a) * dot_fold(b, b))


DIM = 64  # the driver embeddings table's fixed dimension


def dot_unrolled(a: Column, b: Column, dim: int = DIM) -> Column:
    """The dot product as a flat arithmetic expression: 0.0 + p1 + ... + pN in
    element order — the *same* op sequence as the sequential fold (so the
    DuckDB fold oracle matches bit-for-bit), but whole-stage-codegen'd
    (higher-order functions fall back to interpreted eval; an unrolled tree
    does not).  ~10x faster per pair on the 64-dim corpus.

    Out-of-range access yields NULL (F.get), so a short vector nulls the
    score instead of erroring under ANSI mode.
    """
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def cosine_unrolled(a: Column, b: Column, dim: int = DIM) -> Column:
    """One-expression cosine.  NB: 3 unrolled dots in one projection can
    exceed the 64 KB codegen method limit — in hot paths pre-project each
    side's norm2 (:func:`dot_unrolled`(v, v)) *before* the pair join and use
    :func:`cosine_from_norms`; same arithmetic, one dot per pair."""
    return dot_unrolled(a, b, dim) / F.sqrt(
        dot_unrolled(a, a, dim) * dot_unrolled(b, b, dim)
    )


def cosine_from_norms(a: Column, b: Column, n2a: Column, n2b: Column, dim: int = DIM) -> Column:
    """Cosine with pre-projected squared norms (norm computed once per row,
    not once per pair; keeps each generated method under the codegen limit)."""
    return dot_unrolled(a, b, dim) / F.sqrt(n2a * n2b)


def duckdb_norm2_fold(a: str) -> str:
    return duckdb_dot_fold(a, a)


def explode_dot(df: DataFrame, a: str, b: str, keys: list[str], out: str = "dot") -> DataFrame:
    """Exact dot product per row-key via posexplode + decimal sum.

    Returns ``keys + [out]`` with ``out`` as DECIMAL(38,25); cast to double
    at the point of use.  Order-insensitive => safe under any partitioning.
    """
    prod = (F.col("__x").cast("double") * F.col("__y").cast("double")).cast(DEC_DOT)
    return (
        df.select(*keys, F.posexplode(F.zip_with(a, b, lambda x, y: F.struct(x.alias("x"), y.alias("y")))).alias("__i", "__p"))
        .select(*keys, F.col("__p.x").alias("__x"), F.col("__p.y").alias("__y"))
        .groupBy(*keys)
        .agg(F.sum(prod).cast(DEC_DOT).alias(out))
    )


def norm2_exact(df: DataFrame, vec: str, keys: list[str], out: str = "norm2") -> DataFrame:
    """Exact squared L2 norm per row-key (decimal sum of squared elements)."""
    sq = (F.col("__e").cast("double") * F.col("__e").cast("double")).cast(DEC_DOT)
    return (
        df.select(*keys, F.explode(vec).alias("__e"))
        .groupBy(*keys)
        .agg(F.sum(sq).cast(DEC_DOT).alias(out))
    )


# DuckDB oracle renderings of the same exact-decimal formulations.

def duckdb_dot(a: str, b: str, i: str = "i") -> str:
    """Per-pair dot product term list; embed inside
    ``SELECT keys, SUM({term}) FROM ..., unnest(generate_series(1, len)) t(i)``."""
    return (
        f"CAST(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE) AS DECIMAL(38,25))"
    )


def duckdb_norm2(a: str, i: str = "i") -> str:
    return duckdb_dot(a, a, i)


# Sequential-fold renderings (the FAST path): a left fold over the element
# order is deterministic and bit-identical across engines (doubles built only
# from correctly-rounded + and *, applied in the same order), so the fold
# needs no decimal detour and no explode/groupBy — pure codegen, zero shuffle.

def duckdb_dot_fold(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dot_fold` (same element order, same op order)."""
    prods = (
        f"list_transform(generate_series(1, len({a})), "
        f"__i -> CAST({a}[__i] AS DOUBLE) * CAST({b}[__i] AS DOUBLE))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {prods}), "
        f"(__acc, __v) -> __acc + __v)"
    )


def duckdb_cosine_fold(a: str, b: str) -> str:
    """DuckDB mirror of :func:`cosine_fold`."""
    return (
        f"({duckdb_dot_fold(a, b)}) / sqrt(({duckdb_dot_fold(a, a)})"
        f" * ({duckdb_dot_fold(b, b)}))"
    )


# --- Arrow/numpy kernels (the 100 TB hot path) --------------------------------
#
# Per-pair codegen'd fold arithmetic is correct but pays ~100ns/element for
# array access inside generated Java; at block sizes beyond a few hundred the
# vectorized formulation below wins by >10x.  The kernels accumulate
# DIM-SEQUENTIALLY (acc starts at 0.0 and adds one element product per step,
# in element order) — the exact op sequence of dot_unrolled / the DuckDB fold
# oracle, so results stay bit-identical while numpy does the batching.

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def dim_seq_scores(Q: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
    """(q x d) @ (n x d)^T as a (q x n) score matrix, accumulated
    dim-sequentially (NOT np.dot: BLAS reassociates the sum and breaks the
    bit guarantee)."""
    acc = np.zeros((Q.shape[0], B.shape[0]))
    for i in range(Q.shape[1]):
        acc += np.multiply.outer(Q[:, i], B[:, i])
    return acc


def dim_seq_norm2(A: "np.ndarray") -> "np.ndarray":
    acc = np.zeros(A.shape[0])
    for i in range(A.shape[1]):
        c = A[:, i]
        acc += c * c
    return acc


PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("vec_a", T.LongType()),
        T.StructField("vec_b", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


def cos_block_pairs(
    emb: DataFrame,
    threshold: float,
    tile: int = 2048,
) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine >= threshold within each label
    block: groupBy(label).applyInPandas — ONE shuffle on the block key, then
    a vectorized all-pairs kernel per block.

    Scale: the block is the IVF cell; pair work is sum over cells of
    |cell|^2, executed as numpy row-tiles of ``tile`` x |cell| so peak memory
    stays bounded (tile * |cell| * 8 bytes) no matter how large a cell gets.
    Skewed cells parallelize by splitting the tile loop across... a cell maps
    to one task (the applyInPandas contract); cap cell sizes upstream
    (sub-split the label) if a single cell outgrows one executor.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["embedding"])
        if len(pdf) < 2:
            return pd.DataFrame({c.name: [] for c in PAIRS_SCHEMA})
        A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        n2 = dim_seq_norm2(A)
        out = []
        for t0 in range(0, len(pdf), tile):
            t1 = min(t0 + tile, len(pdf))
            cos = dim_seq_scores(A[t0:t1], A) / np.sqrt(
                np.multiply.outer(n2[t0:t1], n2)
            )
            with np.errstate(invalid="ignore"):
                ia, ib = np.where(cos >= threshold)
            keep = ids[t0 + ia] < ids[ib]
            ia, ib = ia[keep], ib[keep]
            out.append(
                pd.DataFrame(
                    {
                        "vec_a": ids[t0 + ia],
                        "vec_b": ids[ib],
                        "label": pdf["label"].iloc[0],
                        "cos_sim": cos[ia, ib],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return emb.select("vec_id", "label", "embedding").groupBy("label").applyInPandas(
        run, PAIRS_SCHEMA
    )


SCORES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


def cos_scores_queries(
    corpus: DataFrame,
    query_ids: "np.ndarray",
    Q: "np.ndarray",
    q_buckets: "np.ndarray | None" = None,
    bucket_fn=None,
) -> DataFrame:
    """Score every corpus row against the (small, broadcast-by-closure) query
    matrix via mapInPandas: zero shuffle, one Arrow pass over the corpus,
    numpy dim-sequential dots.  Self-pairs (query_id == vec_id) are excluded.

    With ``q_buckets`` + ``bucket_fn`` set (ANN path), each corpus batch is
    bucketed by ``bucket_fn(B) -> int64[n]`` and a pair is scored only when
    the LSH buckets match; scores for other pairs are never materialized.
    """
    qn2 = dim_seq_norm2(Q)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            n2 = dim_seq_norm2(B)
            cos = dim_seq_scores(Q, B) / np.sqrt(np.multiply.outer(qn2, n2))
            mask = query_ids[:, None] != ids[None, :]
            if q_buckets is not None:
                mask &= q_buckets[:, None] == bucket_fn(B)[None, :]
            iq, ic = np.where(mask)
            yield pd.DataFrame(
                {
                    "query_id": query_ids[iq],
                    "vec_id": ids[ic],
                    "cos_sim": cos[iq, ic],
                }
            )

    return corpus.select("vec_id", "embedding").mapInPandas(run, SCORES_SCHEMA)


def sign_buckets_np(A: "np.ndarray", perms, modulus: int, n_planes: int) -> "np.ndarray":
    """The numpy twin of the SQL sign-projection bucket id (extension_ops
    _sign_bucket): plane p weight for 1-based dim d is
    2*((a_p*d + b_p) % P % 2) - 1; projection is the dim-sequential fold;
    bit p set iff projection > 0.  Same arithmetic, same bits."""
    n, d = A.shape
    dims = np.arange(1, d + 1, dtype=np.int64)
    bucket = np.zeros(n, dtype=np.int64)
    for p in range(n_planes):
        a, b = perms[p]
        w = (2 * ((a * dims + b) % modulus % 2) - 1).astype(np.float64)
        proj = np.zeros(n)
        for i in range(d):
            proj += w[i] * A[:, i]
        bucket += (proj > 0).astype(np.int64) << p
    return bucket


def l2_fold(a: Column, b: Column) -> Column:
    """Sequential double fold of the squared L2 distance: acc starts at 0.0
    and adds (a[i]-b[i])^2 in element order — subtraction, multiplication and
    addition of doubles are correctly rounded, so the result is bit-identical
    to :func:`duckdb_l2_fold` on the same operands."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def duckdb_l2_fold(a: str, b: str) -> str:
    """DuckDB mirror of :func:`l2_fold` (same element order, same op order)."""
    diffsq = (
        f"list_transform(generate_series(1, len({a})), "
        f"__i -> (CAST({a}[__i] AS DOUBLE) - CAST({b}[__i] AS DOUBLE))"
        f" * (CAST({a}[__i] AS DOUBLE) - CAST({b}[__i] AS DOUBLE)))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {diffsq}), "
        f"(__acc, __v) -> __acc + __v)"
    )


def sqdist_unrolled(a: Column, b: Column, dim: int = DIM) -> Column:
    """Squared L2 distance as a flat arithmetic expression: 0.0 + (a1-b1)^2
    + ... in element order — the same op sequence as a sequential fold over
    zip_with (so a DuckDB list_reduce oracle matches bit-for-bit), but
    whole-stage-codegen'd (see :func:`dot_unrolled`: higher-order functions
    are interpreted; measured ~5x on the 64-dim corpus for this kernel)."""
    acc = F.lit(0.0)
    for i in range(dim):
        d = F.get(a, i).cast("double") - F.get(b, i).cast("double")
        acc = acc + d * d
    return acc
