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


def test_every_registry_entry_is_oracled():
    """Since round 6 the registry carries ZERO rows-only entries — every op
    has a DuckDB oracle and goes through the hash gate above.  This pin
    replaces the old parametrized rows-only runner, which auto-skipped with
    an empty parameter set once the list emptied (the unexplained '1
    skipped' in the r6 suite); if an un-oracled op ever reappears, this
    fails loudly instead."""
    assert ROWS_ONLY == [], f"un-oracled registry entries: {ROWS_ONLY}"
