"""Registry-wide parity pins.  The sweep itself lives in the slice modules
test_oracle_parity_s{0..3}.py (split so tools/run_tests_sharded.py can
spread it across shards); this module pins the invariants that make the
split safe."""

from __future__ import annotations

from tests.parity_common import N_SLICES, ORACLED, ROWS_ONLY, parity_slice


def test_every_registry_entry_is_oracled():
    """Since round 6 the registry carries ZERO rows-only entries — every op
    has a DuckDB oracle and goes through the hash gate in the slice modules.
    This pin replaces the old parametrized rows-only runner, which
    auto-skipped with an empty parameter set once the list emptied (the
    unexplained '1 skipped' in the r6 suite); if an un-oracled op ever
    reappears, this fails loudly instead."""
    assert ROWS_ONLY == [], f"un-oracled registry entries: {ROWS_ONLY}"


def test_slices_cover_every_oracled_entry_exactly_once():
    """The four slice modules must partition ORACLED — an edit that drops or
    doubles a slice would silently shrink (or pad) the local correctness
    gate."""
    seen = [n for k in range(N_SLICES) for n in parity_slice(k)]
    assert sorted(seen) == ORACLED
    assert len(seen) == len(ORACLED)
