#!/usr/bin/env python
"""Sharded test runner — the full suite wall without pytest-xdist.

The single-process suite costs ~11 min (VERDICT r8: 677 s, growing with the
registry) because one SparkSession executes every module serially on a
32-core host.  pytest-xdist is not installed (and installs are off-limits),
so this runner shards BY MODULE into N concurrent pytest subprocesses, each
with its own JVM/SparkSession sized to cores/N threads (local mode has no
port or metastore contention: the UI is disabled and nothing uses Hive).

Modules are assigned longest-first onto the emptiest shard (LPT scheduling)
using measured weights, so the wall tracks the heaviest module rather than
the sum.  Exit code is non-zero iff any shard fails; per-shard tails are
printed on failure.  Usage:

    python tools/run_tests_sharded.py            # 4 shards
    python tools/run_tests_sharded.py -n 6
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: measured single-process cost (seconds, r9 host) — only the RATIOS matter;
#: unknown/new modules default to 10 s which lands them on the lightest shard
WEIGHTS = {
    "test_oracle_parity.py": 200,
    "test_streaming.py": 90,
    "test_sink_services.py": 85,
    "test_plan_quality.py": 60,
    "test_corpus_adversarial.py": 45,
    "test_extension2.py": 40,
    "test_corpus_ops.py": 35,
    "test_analytics.py": 35,
    "test_timeseries.py": 30,
    "test_multimodal.py": 25,
    "test_analytics_property.py": 20,
    "test_timeseries_property.py": 20,
    "test_convert_property.py": 15,
    "test_text_portable.py": 15,
    "test_scrub_sketch.py": 15,
    "test_bucketed_join.py": 10,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="number of shards")
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    mods = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(ROOT, "tests", "test_*.py"))
    )
    # LPT: heaviest module onto the currently lightest shard
    shards: list[list[str]] = [[] for _ in range(args.n)]
    loads = [0.0] * args.n
    for m in sorted(mods, key=lambda m: -WEIGHTS.get(m, 10)):
        i = loads.index(min(loads))
        shards[i].append(m)
        loads[i] += WEIGHTS.get(m, 10)

    per_worker_cpus = max(2, args.cpus // args.n)
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        env = dict(
            os.environ,
            SPARK_GRAFT_TEST_CPUS=str(per_worker_cpus),
            PYTHONDONTWRITEBYTECODE="1",
        )
        cmd = [sys.executable, "-m", "pytest", "-q", *(f"tests/{m}" for m in shard)]
        procs.append(
            (
                i,
                shard,
                subprocess.Popen(
                    cmd,
                    cwd=ROOT,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )

    failed = False
    totals = {"passed": 0, "failed": 0, "error": 0, "skipped": 0}
    for i, shard, p in procs:
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        for k in totals:
            m = re.search(rf"(\d+) {k}", tail)
            if m:
                totals[k] += int(m.group(1))
        status = "ok" if p.returncode == 0 else f"FAIL rc={p.returncode}"
        print(f"shard {i} [{status}] {tail}   ({', '.join(shard)})")
        if p.returncode != 0:
            failed = True
            print("\n".join(out.strip().splitlines()[-40:]))
    print(
        f"TOTAL: {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['error']} errors, {totals['skipped']} skipped "
        f"in {time.time() - t0:.1f}s across {len(procs)} shards"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
