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


#: Max rows a single pair-kernel task may hold from one block.  Blocks larger
#: than this sub-split on a deterministic salt (triangle partitioning), so no
#: single task ever owns a hot cell — the same mitigation the capped-LSH star
#: pairs and the viral-chunk substring rewrite use.  At the test scales
#: (sf0.1 = 2,000 vectors over 10 labels / 16 cells) no block reaches the cap,
#: so plans and bench are unchanged; at sf1 (20,000) every block splits and
#: the quadratic pair work spreads across salt-shard tasks.
CELL_CAP = 512


def _salted_blocks(emb: DataFrame, cell_cap: int = CELL_CAP) -> DataFrame:
    """Explode each (vec_id, label, embedding) row into the triangle groups
    of its block's salt grid.

    A block of n rows gets ``s = ceil(n / cell_cap)`` salts; row r lands in
    salt ``xxhash64(vec_id) mod s`` and replicates into the s groups
    ``(min(salt, j), max(salt, j)) for j in 0..s-1`` — so every unordered row
    pair co-occurs in EXACTLY one group: (salt, salt) if the salts match,
    else (lo, hi).  Groups are ~cell_cap-sized (intra) or ~2*cell_cap
    (cross), each an independent task.  Replication is s copies per row —
    O(n * sqrt(n / cell_cap)) shuffle bytes against the O(n^2) pair work the
    split is spreading, the standard all-pairs triangle-partitioning trade.

    The per-block size aggregate is label-cardinality-sized; no broadcast
    hint — AQE picks the join strategy from runtime stats (the r12 rule:
    never force-broadcast a fact-derived frame).

    NULL labels form their own block, matching the plain ``groupBy("label")``
    the grid replaces: the sizes join is null-safe (``<=>``, still an
    equi-join key for hash/sort-merge strategies), so nullable-label callers
    keep the pre-split pair set (r13 ADVICE; current callers all derive
    non-null labels, pinned by tests/test_vectors_split.py).
    """
    src = emb.select("vec_id", "label", "embedding").filter(
        F.col("embedding").isNotNull()
    )
    sizes = src.groupBy("label").agg(
        F.greatest(
            F.lit(1), F.ceil(F.count("*") / F.lit(cell_cap)).cast("int")
        ).alias("_s")
    )
    return (
        src.join(
            sizes.withColumnRenamed("label", "_sz_label"),
            src["label"].eqNullSafe(F.col("_sz_label")),
        )
        .drop("_sz_label")
        .withColumn("_salt", F.pmod(F.xxhash64("vec_id"), F.col("_s")).cast("int"))
        .select(
            "vec_id",
            "label",
            "embedding",
            "_salt",
            F.explode(
                F.expr(
                    "transform(sequence(0, _s - 1), "
                    "j -> struct(least(_salt, j) AS lo, greatest(_salt, j) AS hi))"
                )
            ).alias("_g"),
        )
        .select(
            "vec_id", "label", "embedding", "_salt",
            F.col("_g.lo").alias("_lo"), F.col("_g.hi").alias("_hi"),
        )
    )


def cos_block_pairs(
    emb: DataFrame,
    threshold: float,
    tile: int = 2048,
    cell_cap: int = CELL_CAP,
) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine >= threshold within each label
    block: ONE shuffle on (label, salt-grid group), then a vectorized
    all-pairs kernel per group (applyInPandas).

    Scale: the block is the IVF cell; pair work is sum over cells of
    |cell|^2, executed as numpy row-tiles of ``tile`` x |group| so peak memory
    stays bounded.  Blocks beyond ``cell_cap`` rows sub-split on a
    deterministic salt (see :func:`_salted_blocks`): intra-salt groups run
    the self all-pairs kernel, cross-salt groups run one-side-tiled cross
    products — the pair SET and every cos_sim bit are identical to the
    unsplit kernel (dim-sequential accumulation and IEEE commutative
    multiply make the value orientation-free), but a hot cell now spans
    ~(n/cell_cap)^2/2 tasks instead of one.
    """

    def empty() -> pd.DataFrame:
        return pd.DataFrame({c.name: [] for c in PAIRS_SCHEMA})

    def pairs_frame(cos, ia, ib, ids_a, ids_b, label) -> pd.DataFrame:
        va, vb = ids_a[ia], ids_b[ib]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "label": label,
                "cos_sim": cos[ia, ib],
            }
        )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["embedding"])
        if len(pdf) < 2:
            return empty()
        label = pdf["label"].iloc[0]
        lo, hi = int(pdf["_lo"].iloc[0]), int(pdf["_hi"].iloc[0])
        out = []
        if lo == hi:
            # intra-salt: self all-pairs, keep a < b
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            n2 = dim_seq_norm2(A)
            for t0 in range(0, len(pdf), tile):
                t1 = min(t0 + tile, len(pdf))
                cos = dim_seq_scores(A[t0:t1], A) / np.sqrt(
                    np.multiply.outer(n2[t0:t1], n2)
                )
                with np.errstate(invalid="ignore"):
                    ia, ib = np.where(cos >= threshold)
                keep = ids[t0 + ia] < ids[ib]
                ia, ib = ia[keep], ib[keep]
                out.append(pairs_frame(cos, ia, ib, ids[t0:t1], ids, label))
        else:
            # cross-salt: disjoint sides, every A x B pair occurs once
            sa = pdf[pdf["_salt"] == lo]
            sb = pdf[pdf["_salt"] == hi]
            if sa.empty or sb.empty:
                return empty()
            A = np.stack(sa["embedding"].to_numpy()).astype(np.float64)
            B = np.stack(sb["embedding"].to_numpy()).astype(np.float64)
            ids_a = sa["vec_id"].to_numpy()
            ids_b = sb["vec_id"].to_numpy()
            n2a, n2b = dim_seq_norm2(A), dim_seq_norm2(B)
            for t0 in range(0, len(sa), tile):
                t1 = min(t0 + tile, len(sa))
                cos = dim_seq_scores(A[t0:t1], B) / np.sqrt(
                    np.multiply.outer(n2a[t0:t1], n2b)
                )
                with np.errstate(invalid="ignore"):
                    ia, ib = np.where(cos >= threshold)
                out.append(pairs_frame(cos, ia, ib, ids_a[t0:t1], ids_b, label))
        return pd.concat(out, ignore_index=True) if out else empty()

    return (
        _salted_blocks(emb, cell_cap)
        .groupBy("label", "_lo", "_hi")
        .applyInPandas(run, PAIRS_SCHEMA)
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
