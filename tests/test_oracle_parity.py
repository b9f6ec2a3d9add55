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
    """The four LIVE slice modules must partition ORACLED — introspected by
    IMPORTING each module and reading the NAMES list its parametrize
    actually uses, so a deleted slice file or a copy-pasted wrong index
    fails HERE (checking only the slice function would miss both)."""
    import importlib

    seen: list[str] = []
    for k in range(N_SLICES):
        mod = importlib.import_module(f"tests.test_oracle_parity_s{k}")
        assert mod.NAMES == parity_slice(k), f"slice module s{k} uses a wrong index"
        seen.extend(mod.NAMES)
    assert sorted(seen) == ORACLED
    assert len(seen) == len(ORACLED)
