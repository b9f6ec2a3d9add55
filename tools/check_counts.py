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


def main() -> int:
    total, oracled = registry_counts()
    errors = check()
    print(f"registry: {total} entries, {oracled} oracled")
    for e in errors:
        print("DRIFT:", e)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
