"""Every registry query with an oracle must match DuckDB on the test tables —
a local reproduction of the driver's t2 correctness gate (at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from daq_3i_spark.plans import QUERIES
from tests.oracle_check import compare, run_oracle

ORACLED = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    tbl = run_oracle(q.oracle, sf_dir)
    problems = compare(df, tbl)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    n = df.count()
    assert n >= 0
