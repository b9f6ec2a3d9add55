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
    """Sequential double fold of the dot product (no shuffle, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_fold(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / F.sqrt(dot_fold(a, a) * dot_fold(b, b))


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
