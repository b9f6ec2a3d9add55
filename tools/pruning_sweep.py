"""Registry-wide physical-plan audit: column pruning + global windows.

For every plannable registry op, walk the formatted physical plan once and
check two scale properties:

1. **Column pruning** — pair each parquet `Scan` with its source table (via
   the InMemoryFileIndex location) and its `ReadSchema`, and flag scans that
   read EVERY column of a wide table.  At 100 TB a scan that hauls all 16
   lineitem columns through the shuffle for a 2-column projection is the
   single most expensive silent mistake a plan can make — Parquet is
   columnar, so unread columns are never even decoded, but only if the
   projection is pruned at the scan.

2. **Global windows** — flag `Window` nodes with an EMPTY partition spec
   (the "No Partition Defined for Window operation" plan: Exchange
   SinglePartition + one-task sort).  Exact but one-core at any scale; only
   acceptable over frames whose cardinality is bounded by something other
   than data volume (days, lang² cells, the shuffle partition count), each
   documented in GLOBAL_WINDOW_ALLOWED.  Unbounded ones get the distributed
   two-level rank instead (operators/ranks.py — the r9 op_text_vocab /
   op_events_rfm rewrite).

Usage: python tools/pruning_sweep.py [sf_dir]
Exit 1 if any flagged scan/window is not in its documented allowlist.
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
    # the data profiler computes null/distinct counts for EVERY column —
    # full-width is the op's definition, and the output is one row
    ("op_quality_profile", "events"),
}

# ops whose plan keeps a Window with NO partition spec — each one's frame is
# bounded by something other than data volume, so the SinglePartition sort
# is constant-sized at any corpus scale:
GLOBAL_WINDOW_ALLOWED = {
    # cumulative day-carry of the two-level prefix sum: rows = distinct days
    "op_events_concurrency": "per-day carry frame (rows = days)",
    # global correct/total attached to the confusion matrix: rows = langs²
    "op_text_langid_confusion": "lang x lang confusion cells",
    # operators/ranks.py offsets cumsum: rows = shuffle partition count P
    "op_text_vocab": "P-row partition-offsets frame (ranks.py)",
    "op_events_rfm": "P-row partition-offsets frame (ranks.py)",
    "op_corpus_curriculum": "P-row partition-offsets frame (ranks.py global_ntile)",
    "op_orders_abc_analysis": "P-row partition-offsets frame (ranks.py global_cumsum)",
}

_SCAN_RE = re.compile(
    r"\(\d+\) Scan parquet ?\n(?:[^\n]*\n)*?"
    r"Location: InMemoryFileIndex(?: \(\d+ paths\))? \[[^\]]*?/(\w+)\.parquet[^\]]*\]\n"
    r"(?:[^\n]*\n)*?ReadSchema: struct<([^\n]*)>",
)

_WINDOW_RE = re.compile(
    r"\(\d+\) (?:Window|RunningWindowFunction)\n(?:[^\n]*\n)*?Arguments: ([^\n]*)"
)


def _top_level_groups(args_line: str) -> list[str]:
    """Top-level [...] group contents of a formatted-plan Arguments line.
    A Window prints [functions], [partitionSpec], [orderSpec], OMITTING
    whichever spec is empty: 2 groups means EITHER no partition (global
    window — the scale problem) or no ordering (a plain partitioned
    aggregate frame, fine).  The two cases are told apart by content: an
    order spec annotates every element with ASC/DESC + NULLS ordering."""
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in args_line:
        if ch == "[":
            if depth == 0:
                cur = []
            else:
                cur.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
            else:
                cur.append(ch)
        elif depth > 0:
            cur.append(ch)
    return groups


def _is_order_spec(group: str) -> bool:
    return " ASC" in group or " DESC" in group


def global_windows(formatted_plan: str) -> int:
    """Number of Window nodes with an empty partition spec in the plan."""
    n = 0
    for m in _WINDOW_RE.finditer(formatted_plan):
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            continue  # [functions], [partitionSpec], [orderSpec]
        if len(groups) == 2 and not _is_order_spec(groups[1]):
            continue  # [functions], [partitionSpec] — unordered frame
        n += 1  # ordered with no partition, or no specs at all: global
    return n


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
    n_global = 0
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
        gw = global_windows(plan)
        if gw:
            n_global += gw
            if name not in GLOBAL_WINDOW_ALLOWED:
                flagged.append((name, "<global-window>"))
                print(f"GWIN  {name}: {gw} unpartitioned Window node(s) — "
                      "single-task sort of the whole frame", flush=True)
    print(
        f"swept {n_scans} parquet scans; {n_global} bounded global windows "
        f"(allowlisted); {len(flagged)} flagged"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
