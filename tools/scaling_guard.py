"""Guard the sf0.1 -> sf1 scaling ratios against regression (VERDICT r6 #6).

Round 6 measured every scaled-table headline op sub-linear on 10x data
(worst x4.48).  This tool pins those ratios: a future plan change that
breaks sub-linearity (quadratic pair generation, a broadcast flipping to
shuffle, per-row driver work) fails THIS gate instead of waiting for a
bench eyeball.

    python tools/make_sf1.py            # synthesize the 10x replica
    python tools/scaling_pass.py        # fresh measurement -> .tmp/scaling_pass.json
    python tools/scaling_guard.py       # compare against SCALING_BASELINE.json

Failure conditions per op (see ``check``):
  * ratio > HARD_CAP (10 = the data growth factor): super-linear, always a
    bug regardless of history;
  * ratio > baseline_ratio * TOLERANCE + SLACK: a regression vs the pinned
    measurement beyond shared-host noise.
New ops absent from the baseline are reported (so the baseline gets
re-pinned deliberately) but don't fail the gate; ops that disappeared fail
it, because a silently-dropped measurement is how coverage rots.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "SCALING_BASELINE.json")
CURRENT = os.path.join(ROOT, ".tmp", "scaling_pass.json")

HARD_CAP = 10.0  # the data ratio: above this the plan does super-linear work
TOLERANCE = 1.8  # multiplicative noise allowance on a shared host
SLACK = 0.5  # absolute allowance so tiny baselines (x0.9) don't over-trigger


def check(
    baseline: dict[str, dict],
    current: dict[str, dict],
    hard_cap: float = HARD_CAP,
    tolerance: float = TOLERANCE,
    slack: float = SLACK,
) -> tuple[list[str], list[str]]:
    """(failures, notes) comparing per-op scaling ratios to the baseline."""
    failures: list[str] = []
    notes: list[str] = []
    for op in sorted(baseline):
        if op not in current:
            failures.append(f"{op}: measured in baseline but missing from current run")
    for op, row in sorted(current.items()):
        ratio = row["ratio"]
        if ratio > hard_cap:
            failures.append(
                f"{op}: ratio x{ratio} exceeds the data growth factor "
                f"x{hard_cap} — super-linear work"
            )
            continue
        base = baseline.get(op)
        if base is None:
            notes.append(f"{op}: new op, no pinned baseline (re-pin deliberately)")
            continue
        limit = base["ratio"] * tolerance + slack
        if ratio > limit:
            failures.append(
                f"{op}: ratio x{ratio} regressed past x{limit:.2f} "
                f"(baseline x{base['ratio']} * {tolerance} + {slack})"
            )
    return failures, notes


def main() -> int:
    with open(sys.argv[1] if len(sys.argv) > 1 else BASELINE) as fh:
        baseline = json.load(fh)
    with open(sys.argv[2] if len(sys.argv) > 2 else CURRENT) as fh:
        current = json.load(fh)
    failures, notes = check(baseline, current)
    for n in notes:
        print(f"NOTE  {n}")
    for f in failures:
        print(f"FAIL  {f}")
    print(f"scaling_guard: {len(current)} ops, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
