"""Registry-wide column-pruning audit.

For every plannable registry op, walk the formatted physical plan, pair each
parquet `Scan` with its source table (via the InMemoryFileIndex location) and
its `ReadSchema`, and report scans that read EVERY column of a wide table.
At 100 TB a scan that hauls all 16 lineitem columns through the shuffle for a
2-column projection is the single most expensive silent mistake a plan can
make — Parquet is columnar, so unread columns are never even decoded, but
only if the projection is pruned at the scan.

Usage: python tools/pruning_sweep.py [sf_dir]
Prints one line per (op, table) scan: n_read/n_total columns, flagging
full-width scans of tables with > FULL_WIDTH_MIN columns.  Exit 1 if any
flagged scan is not in the documented allowlist (ops that genuinely consume
every column, e.g. format round-trips that must preserve the row).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULL_WIDTH_MIN = 6  # only wide tables matter; a 3-col table has nothing to prune

# ops that genuinely need every column of the table they scan full-width:
#   format round-trips (write-then-read the whole row), schema evolution,
#   change-feed / merge sinks that re-emit whole rows.
ALLOWED_FULL = {
    ("op_source_csv_roundtrip", "lineitem"),
    ("op_source_json_roundtrip", "lineitem"),
    ("op_source_orc_roundtrip", "lineitem"),
    ("op_source_schema_evolution", "lineitem"),
}

_SCAN_RE = re.compile(
    r"\(\d+\) Scan parquet ?\n(?:[^\n]*\n)*?"
    r"Location: InMemoryFileIndex(?: \(\d+ paths\))? \[[^\]]*?/(\w+)\.parquet[^\]]*\]\n"
    r"(?:[^\n]*\n)*?ReadSchema: struct<([^\n]*)>",
)


def scan_schemas(formatted_plan: str) -> list[tuple[str, list[str]]]:
    """[(table, [read columns])] for every parquet scan in a formatted plan."""
    out = []
    for m in _SCAN_RE.finditer(formatted_plan):
        table, schema = m.group(1), m.group(2)
        # split top-level commas only (array<...> etc. contain commas)
        cols, depth, cur = [], 0, []
        for ch in schema:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                cols.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            cols.append("".join(cur))
        out.append((table, [c.split(":", 1)[0].strip() for c in cols if c.strip()]))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from daq_3i_spark.session import get_spark
    from daq_3i_spark.plans import QUERIES

    spark = get_spark("pruning-sweep")

    widths = {}
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        widths[t] = len(spark.read.parquet(f"{sf_dir}/{t}.parquet").columns)

    # planning only — skip ops that execute work at build (streaming drains,
    # sink round-trips); mirrors tests/test_plan_quality.py's _EXECUTING set
    executing = {n for n in QUERIES if n.startswith("op_stream_")} | {
        "op_sink_partitioned_scan", "op_source_modbus_sim", "op_graceful_stop",
        "op_rollup_incremental",
    }

    flagged = []
    n_scans = 0
    for name in sorted(set(QUERIES) - executing):
        try:
            df = QUERIES[name].spark(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            print(f"ERR   {name}: {type(exc).__name__}: {exc}", flush=True)
            flagged.append((name, "<plan-error>"))
            continue
        for table, cols in scan_schemas(plan):
            n_scans += 1
            total = widths.get(table)
            if total is None:
                continue
            full = len(cols) >= total and total >= FULL_WIDTH_MIN
            if full and (name, table) not in ALLOWED_FULL:
                flagged.append((name, table))
                print(f"FULL  {name}: {table} reads {len(cols)}/{total} cols",
                      flush=True)
    print(f"swept {n_scans} parquet scans; {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
