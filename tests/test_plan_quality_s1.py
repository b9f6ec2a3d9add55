"""Registry-wide plan-quality sweeps, slice 1/3 — bodies and slicing in
tests/plan_quality_common.py (split so tools/run_tests_sharded.py can
spread the sweeps across shards; coverage pinned in test_plan_quality.py,
which introspects this module's NAMES)."""

from __future__ import annotations

import pytest

from tests.plan_quality_common import (
    check_driver_hashable_schema,
    check_lazy_construction,
    check_no_cartesian,
    plannable_slice,
)

NAMES = plannable_slice(1)


@pytest.mark.parametrize("name", NAMES)
def test_no_cartesian_product(spark, sf_dir, name):
    check_no_cartesian(spark, sf_dir, name)


@pytest.mark.parametrize("name", NAMES)
def test_result_schema_is_driver_hashable(spark, sf_dir, name):
    check_driver_hashable_schema(spark, sf_dir, name)


@pytest.mark.parametrize("name", NAMES)
def test_construction_is_lazy(spark, sf_dir, name):
    check_lazy_construction(spark, sf_dir, name)
