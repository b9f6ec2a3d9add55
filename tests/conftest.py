from __future__ import annotations

import collections
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# per-module wall cost, fed back to tools/run_tests_sharded.py's LPT
# scheduler (its static WEIGHTS table went stale as modules grew; measured
# times keep the shards balanced without hand-maintenance)
_MODULE_SECONDS: collections.defaultdict[str, float] = collections.defaultdict(float)


def pytest_runtest_logreport(report):
    # setup+call+teardown all charge the test's module; the session-scoped
    # spark fixture's ~15 s build lands on the first test of its shard,
    # which is noise at the scheduling granularity that matters here
    _MODULE_SECONDS[report.nodeid.split("::", 1)[0].split("/")[-1]] += report.duration


def pytest_sessionfinish(session, exitstatus):
    out = os.environ.get("TEST_TIMINGS_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump({m: round(s, 2) for m, s in _MODULE_SECONDS.items()}, fh, indent=1)


@pytest.fixture(scope="session")
def spark():
    from daq_3i_spark.session import get_spark

    s = get_spark("daq_3i_spark_tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s.sparkContext.setLogLevel("ERROR")
    # codegen health gate: in production a >64 KB generated method silently
    # falls back to interpreted execution ("Code grows beyond 64 KB" on
    # stderr) — correct rows, ~10x slower, invisible to the oracle checks.
    # The test session disables the fallback so any op that silently left
    # whole-stage codegen FAILS its parity test instead (the giant-CASE
    # pitfall functions/decode.py:decode_cols documents).  Production
    # sessions (daq_3i_spark.session.get_spark) keep graceful fallback.
    s.conf.set("spark.sql.codegen.fallback", "false")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
