"""Shared-kernel tests for daq_3i_spark.functions.numeric.

Pins the overflow-free LCG sampling coin (VERDICT r8 'What's wrong #1'):
``lcg_coin`` / ``lcg_coin_sql`` must equal the textbook ``(k*A + C) % M``
(computed in Python bignums) for keys far beyond int64-overflow territory —
a ~1e10-document 100 TB corpus has doc_ids past 2^33, where the raw form's
``k * A`` product exceeds 2^63 and throws under ANSI mode.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from daq_3i_spark.functions.numeric import (
    MIX_A,
    MIX_C,
    MIX_M,
    lcg_coin,
    lcg_coin_sql,
)

#: keys spanning test scale through the full int64 range; everything past
#: ~8.4e9 overflows the un-reduced k * MIX_A product.
BIG_KEYS = [
    0,
    1,
    12345,
    2**31 - 2,
    2**31 - 1,
    2**31,
    2**33 + 17,          # first regime the raw coin cannot reach
    10_000_000_000,      # ~1e10 docs = the 100 TB corpus size
    2**53 + 11,
    2**62 + 3,
    2**63 - 1,           # int64 max
]


def _reference(k: int) -> int:
    return (k * MIX_A + MIX_C) % MIX_M  # Python bignums: never overflows


def test_lcg_coin_spark_matches_bignum_reference(spark):
    df = spark.createDataFrame([(k,) for k in BIG_KEYS], "doc_id long")
    rows = df.select("doc_id", lcg_coin(F.col("doc_id")).alias("h")).collect()
    got = {r["doc_id"]: r["h"] for r in rows}
    assert got == {k: _reference(k) for k in BIG_KEYS}


def test_lcg_coin_spark_ansi_mode_no_overflow(spark):
    """Under ANSI mode the raw coin THROWS past ~8.4e9; the pre-reduced
    form must stay silent and exact at int64 max."""
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([(k,) for k in BIG_KEYS], "doc_id long")
        rows = df.select(
            "doc_id", lcg_coin(F.col("doc_id")).alias("h")
        ).collect()
        assert {r["doc_id"]: r["h"] for r in rows} == {
            k: _reference(k) for k in BIG_KEYS
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_lcg_coin_sql_duckdb_matches_bignum_reference():
    con = duckdb.connect()
    vals = ", ".join(f"({k}::BIGINT)" for k in BIG_KEYS)
    got = dict(
        con.execute(
            f"SELECT k, {lcg_coin_sql('k')} FROM (VALUES {vals}) t(k)"
        ).fetchall()
    )
    assert got == {k: _reference(k) for k in BIG_KEYS}


def test_lcg_coin_identity_with_raw_form_at_test_scale():
    """Below 2^31 the pre-reduction is the literal identity (k % M == k for
    k < M), so every committed oracle hash at sf0.001/0.01/0.1 is unchanged
    by construction."""
    for k in [0, 1, 999_983, 2**30, MIX_M - 1]:
        assert (k % MIX_M) == k
        assert _reference(k) == ((k % MIX_M) * MIX_A + MIX_C) % MIX_M
