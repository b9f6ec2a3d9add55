"""Oracle-parity sweep, slice 2/4 — body and slicing in
tests/parity_common.py (split so tools/run_tests_sharded.py can spread the
sweep across shards; coverage pinned in test_oracle_parity.py, which
introspects this module's NAMES)."""

from __future__ import annotations

import pytest

from tests.parity_common import check_parity, parity_slice

NAMES = parity_slice(2)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    check_parity(spark, sf_dir, name)
