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
