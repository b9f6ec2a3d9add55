"""Shared body of the oracle-parity sweep (tests/test_oracle_parity*.py).

The sweep is one parametrized test over every oracled registry entry —
~190 Spark-vs-DuckDB row-count + schema + value-hash comparisons, the
single heaviest module in the suite (the r9 sharded run spent 609 s on it
in one shard while five others finished in ~340 s).
tools/run_tests_sharded.py schedules whole modules, so the sweep is split
into interleaved quarter slices (test_oracle_parity_s{0..3}.py) that the
LPT scheduler can place on different shards; test_oracle_parity.py pins
that the slices cover the oracled set exactly once.
"""

from __future__ import annotations

from daq_3i_spark.plans import QUERIES
from tests.oracle_check import compare, run_oracle

ORACLED = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)

N_SLICES = 4


def parity_slice(k: int) -> list[str]:
    """Interleaved (round-robin) slice k of the sorted oracled names —
    consecutive names share a module/family and so have correlated cost;
    striding balances the slices better than contiguous blocks."""
    return ORACLED[k::N_SLICES]


def check_parity(spark, sf_dir, name) -> None:
    """One registry entry vs its DuckDB oracle — a local reproduction of
    the driver's correctness gate (at sf0.001 for speed; the driver runs
    sf0.01)."""
    from daq_3i_spark.cache import release_shared

    q = QUERIES[name]
    try:
        df = q.spark(spark, sf_dir)
        tbl = run_oracle(q.oracle, sf_dir)
        problems = compare(df, tbl)
        assert not problems, f"{name}: " + "; ".join(problems)
    finally:
        # drop this op's tracked shared() caches so a ~48-op sweep module
        # doesn't accumulate every multi-consumer frame for the session
        release_shared()
