"""Local reproduction of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonicalized value multiset.  Floats compare EXACTLY by
default — the registry's determinism conventions (exact decimal sums
surfaced as double, fixed-order elementwise math) make both engines
bit-identical, and the driver's value hash is exact, so a local tolerance
would hide real driver failures.  Decimal OUTPUT columns are treated as a
registry bug: the driver's oracle fetch coerces DuckDB decimals to float64
while Spark collects Decimal objects, so they can never hash-match (keep
decimals internal, cast the final column to double).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from daq_3i_spark.schemas import ALL_TABLES


def run_oracle(sql: str, sf_dir: str):
    # bound DuckDB to the shard's CPU share — its default is EVERY host
    # core per query, which stampedes the box when tools/run_tests_sharded.py
    # runs several oracle-heavy shards concurrently (measured: parity tests
    # went 3.2 s -> 12.5 s each under four 32-thread DuckDB neighbours);
    # sf0.001 queries are instant at any thread count
    threads = max(2, int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    con = duckdb.connect(config={"threads": threads})
    for name in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetch_arrow_table()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return None  # NaN ≡ NULL across both engines (decode contract)
        return ("f", v)
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return v


def _approx_eq(a, b) -> bool:
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0] == "f":
        x, y = a[1], b[1]
        if isinstance(x, str) or isinstance(y, str):
            return x == y
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    return False


def compare(spark_df, oracle_tbl, float_exact: bool = True) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    oracle_cols = sorted(oracle_tbl.column_names)
    if spark_cols != oracle_cols:
        problems.append(f"columns differ: spark={spark_cols} oracle={oracle_cols}")
        return problems

    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in spark_df.collect()
    ]
    oracle_rows = [
        tuple(_canon(rec[c]) for c in oracle_cols) for rec in oracle_tbl.to_pylist()
    ]
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
        return problems

    key = lambda r: tuple(repr(x) for x in r)  # noqa: E731
    spark_rows.sort(key=key)
    oracle_rows.sort(key=key)
    n_bad = 0
    for i, (srow, orow) in enumerate(zip(spark_rows, oracle_rows)):
        for c, sv, ov in zip(spark_cols, srow, orow):
            ok = sv == ov if float_exact else _approx_eq(sv, ov)
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched values total")
    return problems
