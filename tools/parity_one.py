"""Run the driver-style oracle-parity check for ONE registry op (dev loop).

Usage: python tools/parity_one.py op_name [sf_dir]

The per-round dev companion to the full sweep in tests/test_oracle_parity*.py:
same compare() (row count + schema + value hash), one op, one process —
seconds instead of the sweep's minutes while iterating on a new operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2])
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.session import get_spark
    from tests.oracle_check import compare, run_oracle

    if name not in QUERIES:
        near = [n for n in QUERIES if name.removeprefix("op_") in n]
        print(f"unknown op {name!r}" + (f"; close: {near[:5]}" if near else ""))
        return 2
    q = QUERIES[name]
    spark = get_spark("parity_one")
    t0 = time.monotonic()
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        n = df.count()
        print(f"{name}: rows-only (no oracle) — {n} rows, "
              f"{time.monotonic() - t0:.2f}s")
        return 0
    tbl = run_oracle(q.oracle, sf_dir)
    problems = compare(df, tbl)
    dt = time.monotonic() - t0
    if problems:
        print(f"{name}: FAIL ({dt:.2f}s) — " + "; ".join(problems))
        return 1
    print(f"{name}: OK ({dt:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
