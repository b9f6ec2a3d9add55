"""Timezone-hostility sweep: run the whole driver contract in a session
pinned to a non-UTC, non-whole-hour zone (Asia/Kathmandu, +05:45) and
compare against the DuckDB oracle.

    python tools/verify_tz.py [sf_dir] [op ...]

The driver builds its own SparkSession with an unknown default timezone;
every registry entry must produce identical values anyway (the register()
wrapper pins UTC before each plan is built — see plans/registry.py).  This
sweep is how the op_range_join literal-parsing bug was found: timestamp
literals parse in the session timezone at analysis time, so building them
before the first load_* call shifted them by the host offset.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

TZ = "Asia/Kathmandu"


def main() -> int:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", TZ)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_check import compare, run_oracle

    qs, oracles = e.queries(), e.oracle_sql()
    fails: list[str] = []
    for name in qs:
        if only and name not in only:
            continue
        # reset before EVERY query: a real driver session keeps whatever
        # timezone it started with unless our code pins it
        spark.conf.set("spark.sql.session.timeZone", TZ)
        try:
            sdf = qs[name](spark, sf)
            if name in oracles:
                problems = compare(sdf, run_oracle(oracles[name], sf))
                status = "OK" if not problems else "FAIL " + "; ".join(problems[:2])
            else:
                status = f"rows-only rows={sdf.count()}"
                problems = []
        except Exception as ex:  # noqa: BLE001 - report and continue
            problems, status = [str(ex)], f"ERROR {type(ex).__name__}: {str(ex)[:160]}"
        if problems:
            fails.append(name)
        print(f"{name:34s} {status}", flush=True)
    print("TZ-FAILS:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
