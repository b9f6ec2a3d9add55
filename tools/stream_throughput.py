"""Flagship streaming-pipeline THROUGHPUT record (VERDICT r12 #6).

Every op_stream_* bench entry measures 4-batch replay latency, which hides a
throughput regression behind per-batch machinery constants.  This tool
drives the COMPLETE reference pipeline (source -> broadcast enrich ->
compiled convert -> foreachBatch append + status merge -> set-based
retention) over the events feed with an availableNow drain and reports
rows/second end to end.

Usage:
    python tools/stream_throughput.py [sf_dir] [--floor ROWS_PER_SEC]

Prints ONE JSON line.  With --floor, exits 1 when the measured throughput
falls below the floor — the round-close guard (BENCH_NOTES.md records the
per-round values; the floor is set well below the recorded steady envelope
so window noise never trips it but a real regression does).  Round-close
floor: 20000 (VERDICT r14 #4 — the measured r13-r14 envelope is
22.7-35.6k rows/s; the old 15k floor would have admitted a ~40% ingest
regression silently).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, sf_dir: str, tag: str) -> tuple[float, int]:
    from daq_3i_spark.plans.streaming_ops import _TMP_ROOT
    from daq_3i_spark.streaming.pipeline import read_channel_data, run_pipeline

    work = os.path.join(_TMP_ROOT, f"stream_tp-w{os.getpid()}", tag)
    if os.path.isdir(work):
        shutil.rmtree(work)
    t0 = time.monotonic()
    run_pipeline(spark, sf_dir, work, available_now=True)
    sec = time.monotonic() - t0
    rows = read_channel_data(spark, work).count()
    shutil.rmtree(work, ignore_errors=True)
    return sec, rows


def main() -> int:
    argv = sys.argv[1:]
    floor = None
    positional: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--floor":
            floor = float(argv[i + 1])
            i += 2
        else:
            positional.append(argv[i])
            i += 1
    sf_dir = positional[0] if positional else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from daq_3i_spark.session import get_spark
    from daq_3i_spark.sources.tables import table_rows

    spark = get_spark("stream_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    feed_rows = table_rows(sf_dir, "events")
    run_once(spark, sf_dir, "warm")  # warm: JVM + codegen + dim caches
    best_sec, kept = min(
        run_once(spark, sf_dir, f"m{k}") for k in range(2)
    )
    rps = feed_rows / best_sec
    print(
        json.dumps(
            {
                "metric": "stream_pipeline_rows_per_sec",
                "value": round(rps, 1),
                "unit": "rows/sec",
                "feed_rows": feed_rows,
                "kept_after_retention": kept,
                "sec": round(best_sec, 3),
                "sf_dir": sf_dir,
            }
        )
    )
    if floor is not None and rps < floor:
        print(f"FAIL: {rps:.1f} rows/sec below floor {floor}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
