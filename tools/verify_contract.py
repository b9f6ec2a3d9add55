"""Drive the full driver contract against the DuckDB oracle in one command.

    python tools/verify_contract.py [sf_dir] [op ...]

Runs entry() at sf0.001, then every queries() entry (or just the named ops)
at sf_dir (default /root/testdata/sf0.01) and compares oracled entries with
tests/oracle_check.compare — a local reproduction of the driver's smoke + t2
correctness gates.  Exit 0 iff everything passes.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_check import compare, run_oracle

    n = e.entry(spark).count()
    print(f"SMOKE entry rows={n}", flush=True)
    assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    names = [x for x in qs if not only or x in only]
    # NB: no "decimal" — the driver's oracle fetch coerces DuckDB decimals to
    # float64 while Spark collects Decimal objects, so a decimal OUTPUT column
    # can never hash-match (cast finals to double; keep decimals internal).
    scalar_ok = ("bigint", "int", "smallint", "tinyint", "long", "double",
                 "float", "string", "boolean", "date", "timestamp",
                 "timestamp_ntz", "binary")
    fails: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            # the driver's canonicalizer can't hash array/map/struct cells
            nested = [f.name for f in sdf.schema.fields
                      if f.dataType.simpleString().split("(")[0] not in scalar_ok]
            if nested:
                raise TypeError(f"non-scalar output columns {nested} "
                                "(driver canonicalizer would crash)")
            if name in oracles:
                problems = compare(sdf, run_oracle(oracles[name], sf))
                ok = not problems
                status = "OK" if ok else "FAIL " + "; ".join(problems[:3])
            else:
                ok, status = True, f"rows-only rows={sdf.count()}"
        except Exception as ex:  # noqa: BLE001 - report and continue
            ok, status = False, f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
        if not ok:
            fails.append(name)
        print(f"{name:34s} {time.time() - t0:6.1f}s {status}", flush=True)
        # drop this op's tracked shared() caches — a 193-op session would
        # otherwise accumulate every multi-consumer frame until exit
        from daq_3i_spark.cache import release_shared

        release_shared()
    print("FAILS:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
