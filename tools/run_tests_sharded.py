#!/usr/bin/env python
"""Sharded test runner — the full suite wall without pytest-xdist.

The single-process suite costs ~11 min (VERDICT r8: 677 s, growing with the
registry) because one SparkSession executes every module serially on a
32-core host.  pytest-xdist is not installed (and installs are off-limits),
so this runner shards BY MODULE into N concurrent pytest subprocesses, each
with its own JVM/SparkSession sized to cores/N threads (local mode has no
port or metastore contention: the UI is disabled and nothing uses Hive).

Modules are assigned longest-first onto the emptiest shard (LPT scheduling)
using measured per-module times from the previous green run
(tools/.test_timings.json, written back by the conftest timing hook; the
static WEIGHTS table only seeds new modules), so the wall tracks the
heaviest module rather than the sum.  The two registry-wide sweeps are
pre-split into slice modules (test_oracle_parity_s{0..3}.py,
test_plan_quality_s{0..2}.py) so no single module dominates a shard.
Exit code is non-zero iff any shard fails; per-shard tails are printed on
failure.  Usage:

    python tools/run_tests_sharded.py            # 4 shards
    python tools/run_tests_sharded.py -n 6
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: fallback cost estimates (seconds-ish, r9 host) — only the RATIOS matter;
#: unknown/new modules default to 10 s which lands them on the lightest
#: shard.  MEASURED per-module times from the previous successful run
#: (tools/.test_timings.json, written by the conftest timing hook) take
#: precedence over this table, so it only seeds brand-new modules.
WEIGHTS = {
    "test_oracle_parity.py": 5,
    "test_oracle_parity_s0.py": 150,
    "test_oracle_parity_s1.py": 150,
    "test_oracle_parity_s2.py": 150,
    "test_oracle_parity_s3.py": 150,
    "test_plan_quality_s0.py": 120,
    "test_plan_quality_s1.py": 120,
    "test_plan_quality_s2.py": 120,
    "test_streaming.py": 90,
    "test_sink_services.py": 85,
    "test_plan_quality.py": 25,
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


TIMINGS_PATH = os.path.join(ROOT, "tools", ".test_timings.json")


def _load_timings() -> dict[str, float]:
    try:
        with open(TIMINGS_PATH) as fh:
            return {m: float(s) for m, s in json.load(fh).items()}
    except (OSError, ValueError):
        return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="number of shards")
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    mods = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(ROOT, "tests", "test_*.py"))
    )
    timings = _load_timings()

    def weight(m: str) -> float:
        # explicit membership test, not `or`: a genuinely-measured 0.0
        # (sub-5ms module) must not fall back to a stale static weight
        return timings[m] if m in timings else float(WEIGHTS.get(m, 10))

    # LPT: heaviest module onto the currently lightest shard
    shards: list[list[str]] = [[] for _ in range(args.n)]
    loads = [0.0] * args.n
    for m in sorted(mods, key=lambda m: -weight(m)):
        i = loads.index(min(loads))
        shards[i].append(m)
        loads[i] += weight(m)

    per_worker_cpus = max(2, args.cpus // args.n)
    t0 = time.time()
    procs = []
    timing_files = {}
    for i, shard in enumerate(shards):
        if not shard:
            continue
        timing_files[i] = os.path.join(ROOT, "tools", f".timings_shard{i}.tmp")
        env = dict(
            os.environ,
            SPARK_GRAFT_TEST_CPUS=str(per_worker_cpus),
            PYTHONDONTWRITEBYTECODE="1",
            TEST_TIMINGS_OUT=timing_files[i],
            # Spark already runs per_worker_cpus tasks per shard; a BLAS
            # that ALSO fans each numpy kernel out to every host core
            # oversubscribes n_shards x cpus x cores threads
            OMP_NUM_THREADS="1",
            OPENBLAS_NUM_THREADS="1",
            MKL_NUM_THREADS="1",
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

    # feed measured per-module times back into the next run's LPT schedule
    # (only after a fully green run — a failed shard under-reports its cost)
    merged = dict(timings)
    complete = not failed
    for i, path in timing_files.items():
        try:
            with open(path) as fh:
                merged.update(json.load(fh))
        except (OSError, ValueError):
            complete = False
        finally:
            try:
                os.unlink(path)
            except OSError:
                pass
    if complete:
        with open(TIMINGS_PATH, "w") as fh:
            json.dump(dict(sorted(merged.items())), fh, indent=1)
            fh.write("\n")

    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
