"""Conversion-compiler golden pairs (SURVEY §5.2): expr string -> value,
null-on-error, Spark/DuckDB dialect agreement, and the fallback UDF."""

from __future__ import annotations

import duckdb
import pytest

from daq_3i_spark.functions.convert import (
    compile_conversion,
    conversion_to_duckdb_sql,
    convert_fallback_udf,
)

CASES = [
    ("Value = x", 42.5, 42.5),
    ("Value = x / 10", 185.22, 18.522),
    ("Value = x * 1.5 + 2", 10.0, 17.0),
    ("Value = (x - 4000) / 16000 * 100", 4206.42, (4206.42 - 4000) / 16000 * 100),
    ("Value = x ** 0.5", 16.0, 4.0),
    ("Value = x ** 0.5", -4.0, None),  # complex -> NULL (documented divergence)
    ("Value = x ** 2", 3.0, 9.0),
    ("Value = -x + 1", 5.0, -4.0),
    ("Value = x % 7", 10.0, 3.0),
    ("Value = x / 0", 1.0, None),  # div-by-zero -> NULL
    ("Value = ", 1.0, None),  # malformed (fixture id 6)
    ("Value = import os", 1.0, None),  # rejected, not executed
    ("y = x", 1.0, None),  # wrong target symbol
]


@pytest.mark.parametrize("expr,x,expected", CASES)
def test_compile_duckdb(expr, x, expected):
    sql = conversion_to_duckdb_sql(expr, "xx")
    got = duckdb.execute(f"SELECT {sql} FROM (SELECT CAST(? AS DOUBLE) AS xx)", [x]).fetchone()[0]
    if expected is None:
        assert got is None, f"{expr}: {got}"
    else:
        assert got == pytest.approx(expected, rel=1e-12), f"{expr}: {got}"


def test_compile_spark_matches_duckdb(spark):
    rows = [(i, e, x) for i, (e, x, _) in enumerate(CASES)]
    df = spark.createDataFrame([(i, x) for i, _, x in rows], "i int, x double")
    for i, (expr, x, expected) in enumerate(CASES):
        c = compile_conversion(expr)
        if c is None:
            assert expected is None
            continue
        got = df.filter(f"i = {i}").select(c.column("x").alias("v")).collect()[0]["v"]
        if expected is None:
            assert got is None, f"{expr}: {got}"
        else:
            assert got == expected, f"{expr}: bit mismatch {got} != {expected}"


def test_fallback_udf(spark):
    df = spark.createDataFrame([(16.0,), (4.0,), (-1.0,)], "x double")
    out = df.select(convert_fallback_udf("Value = x ** 0.5")("x").alias("v")).collect()
    vals = [r["v"] for r in out]
    assert vals[0] == 4.0 and vals[1] == 2.0
    assert vals[2] is None or (vals[2] != vals[2])  # complex -> NULL/NaN
