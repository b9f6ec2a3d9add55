"""load_events / read_events_stream must adapt to every physical ``ts`` type
the driver's testdata has shipped: TIMESTAMP(NANOS) (rounds 1-2, Spark reads
it as long only via nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
(round 3+, Spark reads TIMESTAMP_NTZ).  A hard-coded schema silently
misreads one generation as the other (us interpreted as ns lands in 1970 —
the round-3 regression), so both paths are pinned here with the same
wall-clock fixture."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from daq_3i_spark.sources.tables import load_events

_TS = [
    datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    # version 2.6 keeps TIMESTAMP(NANOS) physical (1.0 would coerce)
    pq.write_table(table, os.path.join(path, "events.parquet"), version="2.6")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_events_normalizes_each_generation(spark, tmp_path, unit):
    d = str(tmp_path / unit)
    os.makedirs(d)
    _write_events(d, unit)
    df = load_events(spark, d)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got == {1: _TS[0], 2: _TS[1]}, f"{unit}: wall-clock values changed"


def test_load_events_is_timezone_proof(spark, tmp_path):
    """Whatever timezone the (driver's) session starts with, the collected
    wall-clock values must equal the naive values DuckDB reads."""
    d = str(tmp_path / "tz")
    os.makedirs(d)
    _write_events(d, "us")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        df = load_events(spark, d)  # pins UTC itself
        got = {r["event_id"]: r["ts"] for r in df.collect()}
        assert got == {1: _TS[0], 2: _TS[1]}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
