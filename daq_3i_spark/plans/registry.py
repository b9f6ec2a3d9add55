"""Query registry — one entry per implemented operator (SURVEY.md §2).

Each entry pairs a Spark plan builder with the equivalent ANSI SQL for the
DuckDB oracle (or None for genuinely non-SQL-expressible ops, which get the
driver's weaker rows-only check).

Determinism conventions (so the order-insensitive value hash matches):

* elementwise float math stays DOUBLE: identical expression trees built from
  correctly-rounded primitives (+ - * / sqrt; never libm pow) are
  bit-identical across engines, so no rounding is needed;
* float AGGREGATES (sums/avgs) are order-nondeterministic, so they are
  computed as exact decimal sums — SUM(CAST(x AS DECIMAL(18,6))) — and the
  final column is cast to DOUBLE in BOTH dialects (the decimal->double cast
  of the same exact sum is correctly rounded, hence bit-identical).  The
  final cast must NOT stay decimal: the driver's oracle fetch coerces DuckDB
  decimals to float64 while Spark collects Decimal objects, so a decimal
  OUTPUT column never hash-matches.  18 digits keeps Spark's unscaled-long
  decimal fast path in reach while holding every value domain in the
  testdata (≤1e12 with 6 decimals); reference_ops keeps decimal(25,6)
  internally where it mirrors the reference's own sink type (db_model.py:54);
* every aggregate/computed column is aliased identically in both dialects;
* no query depends on row order (the driver sorts before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: SparkFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkFn) -> SparkFn:
        QUERIES[name] = QueryDef(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def spark_queries() -> dict[str, SparkFn]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
