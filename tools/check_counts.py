"""Registry-count drift guard.

README.md and SURVEY.md state the registry's entry/oracle counts in prose;
those numbers drifted twice in round 5 when ops landed without a doc bump.
This tool derives the true counts from the registry itself and fails if any
documented number disagrees.  Run standalone or via tests/test_counts.py
(part of the default pytest run).

    python tools/check_counts.py
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


def main() -> int:
    total, oracled = registry_counts()
    errors = check()
    print(f"registry: {total} entries, {oracled} oracled")
    if "--census" in sys.argv:
        print_census()
    for e in errors:
        print("DRIFT:", e)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
