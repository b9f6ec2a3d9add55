#!/usr/bin/env python
"""Bench regression guard — fail >1.5x per-query slides unless explained.

Usage:
    python tools/bench_guard.py PREV.json NEW.json [--threshold 1.5]

Accepts either the driver's wrapper format (BENCH_r{N}.json with a "parsed"
key) or bench.py's raw one-line JSON ({"queries": {...}, ...}).  Compares
per-query wall times on the intersection of query sets and the common-query
total.  A query slower than threshold x its previous time is a REGRESSION
unless its name appears in BENCH_NOTES.md (the adjudication ledger — a note
naming the op and explaining the slide makes it an accepted, documented
offset, e.g. the round-4 degraded-host window).

Exit codes: 0 = clean or fully explained, 1 = unexplained regression(s),
2 = usage / unreadable input.

Cross-round caveat (see BENCH_NOTES.md): whole-run offsets where EVERY query
shifts by a similar factor are the signature of a slow host window, not an
operator regression.  Since r10 bench.py times a fixed-cost synthetic
calibration probe ("calibration_sec") alongside the queries; when BOTH
records carry it, per-query ratios are DIVIDED by the probe's own ratio (the
measured host factor) before the threshold test, so the guard flags operator
slides, not host weather.  When either record predates the probe (r9 and
older), the guard normalizes by the MEDIAN per-query ratio instead (r11): a
uniform host shift moves the median exactly as it moves each query, so
median-normalized ratios isolate per-op slides the same way the probe does —
with two caveats.  (1) A genuine regression touching >half the common set
would partly self-mask, which is why the raw median and total are always
printed and a median beyond the threshold still tags every flag
"whole-run offset" for the adjudication.  (2) The median is only a credible
host estimate over a reasonably sized sample: below MIN_MEDIAN_N common
queries a single real regression drags the median and normalizes ITSELF
away, so small probe-less comparisons fall back to raw ratios (pinned by
tests/test_scrub_sketch.py::test_bench_guard_self).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

#: minimum common-query count for the probe-less median-normalization
#: heuristic — under this, one real regression would shift the median
#: enough to mask itself, so the guard stays raw
MIN_MEDIAN_N = 8


def load_times(path: str) -> tuple[dict[str, float], float | None]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    q = doc.get("queries")
    if not isinstance(q, dict) or not q:
        raise ValueError(f"{path}: no per-query times found")
    cal = doc.get("calibration_sec")
    return {k: float(v) for k, v in q.items()}, (
        float(cal) if isinstance(cal, (int, float)) and cal > 0 else None
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--notes",
        default=os.path.join(os.path.dirname(__file__), "..", "BENCH_NOTES.md"),
    )
    args = ap.parse_args()

    try:
        (prev, cal_prev), (new, cal_new) = load_times(args.prev), load_times(args.new)
    except (OSError, ValueError, json.JSONDecodeError) as exc:
        print(f"bench_guard: {exc}", file=sys.stderr)
        return 2

    notes = ""
    if os.path.exists(args.notes):
        with open(args.notes) as f:
            notes = f.read()

    common = sorted(set(prev) & set(new))
    if not common:
        print("bench_guard: no common queries between the two benches", file=sys.stderr)
        return 2

    host = None
    if cal_prev is not None and cal_new is not None:
        host = cal_new / cal_prev

    ratios = {q: new[q] / prev[q] if prev[q] > 0 else float("inf") for q in common}
    median = statistics.median(ratios.values())
    total_prev = sum(prev[q] for q in common)
    total_new = sum(new[q] for q in common)
    print(
        f"common queries: {len(common)}  total {total_prev:.2f}s -> {total_new:.2f}s "
        f"({total_new / total_prev:.2f}x)  median per-query ratio {median:.2f}x"
    )
    if host is not None:
        print(
            f"calibration probe: {cal_prev:.2f}s -> {cal_new:.2f}s — host factor "
            f"{host:.2f}x (per-query ratios normalized by it)"
        )
        factor = host
    elif len(common) >= MIN_MEDIAN_N:
        print(
            f"calibration probe: absent in one record — normalizing by the "
            f"median per-query ratio {median:.2f}x (uniform-window heuristic)"
        )
        factor = median if median > 0 else 1.0
    else:
        print(
            f"calibration probe: absent, and {len(common)} common queries "
            f"are too few for the median heuristic (min {MIN_MEDIAN_N}) — "
            "using raw ratios"
        )
        factor = 1.0

    norm = {q: r / factor for q, r in ratios.items()}
    regressions = [(q, norm[q]) for q in norm if norm[q] > args.threshold]
    regressions.sort(key=lambda t: -t[1])
    unexplained = []
    for q, r in regressions:
        tag = " [whole-run offset]" if host is None and median > args.threshold else ""
        raw = f" raw {ratios[q]:.2f}x"
        if q in notes:
            print(f"  EXPLAINED  {q}: {prev[q]:.2f}s -> {new[q]:.2f}s ({r:.2f}x{raw}){tag}")
        else:
            print(f"  REGRESSION {q}: {prev[q]:.2f}s -> {new[q]:.2f}s ({r:.2f}x{raw}){tag}")
            unexplained.append(q)

    if unexplained:
        print(
            f"bench_guard: {len(unexplained)} unexplained regression(s) > "
            f"{args.threshold}x — add an adjudicating note to BENCH_NOTES.md "
            "naming each op, or fix the slide.",
            file=sys.stderr,
        )
        return 1
    print("bench_guard: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
