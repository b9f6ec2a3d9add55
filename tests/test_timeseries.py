"""range_join bucketing must be width-independent: any bucket_s yields the
same rows as the brute-force (unbucketed) range predicate — ADVICE r1 found
widths coarser than 1 hour silently dropping matches under the old
date_trunc('hour') bucketing."""

from __future__ import annotations

import datetime as dt

import pytest

from daq_3i_spark.operators.timeseries import range_join


@pytest.fixture(scope="module")
def frames(spark):
    base = dt.datetime(2024, 1, 1)
    ivl = spark.createDataFrame(
        [
            # spans 3 hours — the case the hour-stride bug dropped at 2h buckets
            (1, base + dt.timedelta(minutes=30), base + dt.timedelta(hours=3, minutes=30)),
            (1, base + dt.timedelta(hours=5), base + dt.timedelta(hours=5, minutes=1)),
            (2, base, base + dt.timedelta(days=1)),
        ],
        "channel_id int, interval_start timestamp, interval_end timestamp",
    )
    data = spark.createDataFrame(
        [
            (1, i, base + dt.timedelta(minutes=17 * i))
            for i in range(60)
        ]
        + [(2, 1000 + i, base + dt.timedelta(hours=6 * i)) for i in range(8)],
        "channel_id int, id long, ts timestamp",
    )
    return ivl, data


@pytest.mark.parametrize("bucket_s", [1800, 3600, 7200, 86400])
def test_range_join_any_bucket_width(spark, frames, bucket_s):
    ivl, data = frames
    got = {
        (r["channel_id"], r["interval_start"], r["id"])
        for r in range_join(ivl, data, key="channel_id", bucket_s=bucket_s).collect()
    }
    brute = {
        (r["channel_id"], r["interval_start"], r["id"])
        for r in ivl.join(data, "channel_id")
        .filter("ts >= interval_start AND ts < interval_end")
        .collect()
    }
    assert got == brute and len(brute) > 0
