"""Registry-count drift guard.

README.md and SURVEY.md state the registry's entry/oracle counts in prose;
those numbers drifted twice in round 5 when ops landed without a doc bump.
This tool derives the true counts from the registry itself and fails if any
documented number disagrees.  Run standalone or via tests/test_counts.py
(part of the default pytest run).

    python tools/check_counts.py
    python tools/check_counts.py --census
    python tools/check_counts.py --plan --reps op_a op_b --predrain r14:3 r12:6

``--plan`` assembles the next round's ``_CHECK_PRIORITY`` window
mechanically (hand-listing 50 names each round is the error-prone step
VERDICT r15 #1 warns about): the entire oldest cohort leads, then the
``--reps`` changed-path representatives, then ``--predrain rN:K`` slots
filled alphabetically from each named cohort; fails loudly if the lead
cohort alone overflows the 50-slot window or any name is unknown.
Output is a paste-ready Python list literal.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def registry_counts() -> tuple[int, int]:
    from daq_3i_spark.plans import QUERIES

    total = len(QUERIES)
    oracled = sum(1 for q in QUERIES.values() if q.oracle)
    return total, oracled


def doc_claims() -> list[tuple[str, int, int]]:
    """(location, claimed_total, claimed_oracled) for every doc site that
    states registry counts.  Patterns are anchored to the exact phrases the
    docs use, so a reworded sentence fails loudly here rather than silently
    dropping out of the check."""
    claims: list[tuple[str, int, int]] = []

    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"\((\d+) entries, (\d+) oracled;", readme)
    if not m:
        raise AssertionError("README.md lost its '(N entries, M oracled;' phrase")
    claims.append(("README.md entries/oracled", int(m.group(1)), int(m.group(2))))
    m = re.search(r"(\d+) DuckDB-oracled queries", readme)
    if not m:
        raise AssertionError("README.md lost its 'N DuckDB-oracled queries' phrase")
    claims.append(("README.md DuckDB-oracled", -1, int(m.group(1))))

    survey = open(os.path.join(ROOT, "SURVEY.md")).read()
    m = re.search(r"Registry total: (\d+) entries, (\d+) oracled\.", survey)
    if not m:
        raise AssertionError("SURVEY.md lost its 'Registry total:' line")
    claims.append(("SURVEY.md registry total", int(m.group(1)), int(m.group(2))))
    return claims


def check() -> list[str]:
    total, oracled = registry_counts()
    errors = []
    for loc, c_total, c_oracled in doc_claims():
        if c_total not in (-1, total):
            errors.append(f"{loc}: claims {c_total} entries, registry has {total}")
        if c_oracled != oracled:
            errors.append(f"{loc}: claims {c_oracled} oracled, registry has {oracled}")
    return errors


def staleness_census() -> dict[str, int | None]:
    """Latest driver-check round per registry op, from CORRECTNESS_r*.json.

    The driver's sweep covers the first 50 queries() entries per round, so
    rotation planning (_CHECK_PRIORITY in plans/__init__.py) needs the
    per-op latest-check round — previously hand-computed from the VERDICT
    table each round (VERDICT r10 #8 asked for this emitter).  Only PASS
    rows count (every gate green): a failed row doesn't refresh staleness.
    Never-checked ops map to None.
    """
    import glob
    import json

    from daq_3i_spark.plans import QUERIES

    latest: dict[str, int | None] = {name: None for name in QUERIES}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name, rec in json.load(open(path)).items():
            if name not in latest:
                continue  # renamed/retired op
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
                and not rec.get("err")
            )
            if ok and (latest[name] is None or rnd > latest[name]):
                latest[name] = rnd
    return latest


def print_census() -> None:
    latest = staleness_census()
    by_round: dict[int | None, list[str]] = {}
    for name, rnd in latest.items():
        by_round.setdefault(rnd, []).append(name)
    print("staleness census (latest PASS round -> ops):")
    for rnd in sorted(by_round, key=lambda r: (r is not None, r)):
        ops = sorted(by_round[rnd])
        label = f"r{rnd}" if rnd is not None else "never"
        print(f"  {label}: {len(ops)} ops")
        for i in range(0, len(ops), 4):
            print("      " + ", ".join(ops[i : i + 4]))


#: Driver correctness sweep covers the first this-many queries() entries.
WINDOW_SLOTS = 50


def plan_window(
    reps: list[str], predrain: dict[int, int]
) -> tuple[list[str], list[str]]:
    """Assemble the next check window: (window, notes).

    Lead with the ENTIRE oldest cohort (the ops hitting the staleness
    horizon — skipping any also named in ``reps``), then the changed-path
    reps, then ``predrain[round] = count`` slots taken alphabetically from
    each named cohort.  Raises on unknown names, overflow, or a predrain
    round with fewer ops than requested."""
    latest = staleness_census()
    unknown = [n for n in reps if n not in latest]
    if unknown:
        raise ValueError(f"--reps names not in the registry: {unknown}")
    by_round: dict[int, list[str]] = {}
    for name, rnd in latest.items():
        if rnd is not None:
            by_round.setdefault(rnd, []).append(name)
    never = sorted(n for n, r in latest.items() if r is None)

    window: list[str] = []
    notes: list[str] = []
    # never-checked ops are staler than any cohort
    for n in never:
        if n not in window:
            window.append(n)
    if never:
        notes.append(f"never-checked: {len(never)}")
    if not by_round:
        # fresh clone with no CORRECTNESS_r*.json: every op is in `never`
        # and already leads — there is no cohort census to consult (ADVICE
        # r16: min() over an empty dict crashed here unhelpfully)
        if predrain:
            raise ValueError(
                "--predrain given but no driver census data was found "
                "(no CORRECTNESS_r*.json) — there are no cohorts to drain"
            )
        notes.append("no census data: window = never-checked ops only")
        if len(window) > WINDOW_SLOTS:
            # make the truncation loud (ADVICE r17): a fresh clone with more
            # registered ops than slots would otherwise silently drop the
            # overflow from the generated window
            notes.append(
                f"WARNING: {len(window) - WINDOW_SLOTS} never-checked ops "
                f"truncated from the {WINDOW_SLOTS}-slot window"
            )
        return window[:WINDOW_SLOTS], notes
    oldest = min(by_round)
    lead = sorted(n for n in by_round[oldest] if n not in reps)
    window += [n for n in lead if n not in window]
    notes.append(f"lead cohort r{oldest}: {len(lead)} (+{len(by_round[oldest]) - len(lead)} via reps)")
    if len(window) + len(reps) > WINDOW_SLOTS:
        raise ValueError(
            f"lead cohort r{oldest} ({len(lead)}) + reps ({len(reps)}) "
            f"overflow the {WINDOW_SLOTS}-slot window — split the cohort "
            "across rounds explicitly"
        )
    window += [n for n in reps if n not in window]
    if reps:
        notes.append(f"changed-path reps: {len(reps)}")
    for rnd in sorted(predrain):
        want = predrain[rnd]
        pool = sorted(n for n in by_round.get(rnd, []) if n not in window)
        if len(pool) < want:
            raise ValueError(
                f"--predrain r{rnd}:{want} but only {len(pool)} "
                "unwindowed ops remain in that cohort"
            )
        take = pool[:want]
        if len(window) + len(take) > WINDOW_SLOTS:
            raise ValueError(
                f"--predrain r{rnd}:{want} overflows the "
                f"{WINDOW_SLOTS}-slot window at {len(window)} filled"
            )
        window += take
        notes.append(f"pre-drain r{rnd}: {want} (cohort -> {len(pool) - want})")
    notes.append(f"window: {len(window)}/{WINDOW_SLOTS} slots")
    return window, notes


def print_plan(argv: list[str]) -> None:
    reps: list[str] = []
    predrain: dict[int, int] = {}
    it = iter(argv)
    for a in it:
        if a == "--reps":
            continue
        if a == "--predrain":
            continue
        m = re.fullmatch(r"r(\d+):(\d+)", a)
        if m:
            predrain[int(m.group(1))] = int(m.group(2))
        else:
            # every non-cohort token is a rep; plan_window validates names
            # against the registry, so a misspelled op fails LOUDLY there
            # instead of silently vanishing from the generated window
            # (ADVICE r16: the old op_-prefix filter dropped typos like
            # 'opstream_pipeline' without any error)
            reps.append(a)
    window, notes = plan_window(reps, predrain)
    for n in notes:
        print("#", n)
    print("_CHECK_PRIORITY = [")
    for name in window:
        print(f'    "{name}",')
    print("]")


def main() -> int:
    total, oracled = registry_counts()
    errors = check()
    print(f"registry: {total} entries, {oracled} oracled")
    if "--census" in sys.argv:
        print_census()
    if "--plan" in sys.argv:
        print_plan(sys.argv[sys.argv.index("--plan") + 1 :])
    for e in errors:
        print("DRIFT:", e)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
