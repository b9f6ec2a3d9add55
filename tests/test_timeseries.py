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


def test_interpolate_midpoints_and_exact_hits(spark, sf_dir):
    """Linear-interpolation semantics on the registry op's own output: for
    every emitted grid instant, recompute the expected value from the raw
    samples in python and compare exactly (same IEEE ops, same order)."""
    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.sources.daq_dims import channel_data_df

    out = QUERIES["op_timeseries_interpolate"].spark(spark, sf_dir).collect()
    assert out
    samples = {}
    for r in channel_data_df(spark, sf_dir).collect():
        samples.setdefault(r["channel_id"], []).append(
            (int(r["ts"].timestamp() * 1_000_000), r["value"])
        )
    for ch in samples:
        samples[ch].sort()
    import bisect

    checked_exact = 0
    for r in out[:500]:
        ts_us, ch = r["minute_us"], r["channel_id"]
        pts = samples[ch]
        i = bisect.bisect_left(pts, (ts_us, float("-inf")))
        # prev = last sample strictly before; next = first at/after
        assert 0 < i < len(pts) or (i < len(pts) and pts[i][0] == ts_us)
        t1, v1 = pts[i - 1]
        t2, v2 = pts[i]
        want = v1 + (v2 - v1) * (float(ts_us - t1) / float(t2 - t1))
        assert r["interp_value"] == want
        if t2 == ts_us:
            assert r["interp_value"] == v2
            checked_exact += 1


def test_locf_carries_latest_at_or_before(spark, sf_dir):
    """LOCF semantics recomputed in python: value = latest sample at/before
    the instant (inclusive tie-break, opposite of interpolation's), and
    staleness_us is the exact age of that sample."""
    import bisect

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.sources.daq_dims import channel_data_df

    out = QUERIES["op_timeseries_locf"].spark(spark, sf_dir).collect()
    assert out
    samples = {}
    for r in channel_data_df(spark, sf_dir).collect():
        samples.setdefault(r["channel_id"], []).append(
            (int(r["ts"].timestamp() * 1_000_000), r["value"])
        )
    for ch in samples:
        samples[ch].sort()
    for r in out[:500]:
        pts = samples[r["channel_id"]]
        i = bisect.bisect_right(pts, (r["minute_us"], float("inf")))
        assert i > 0
        t1, v1 = pts[i - 1]
        assert r["locf_value"] == v1
        assert r["staleness_us"] == r["minute_us"] - t1 >= 0


def test_gapfill_duplicate_ts_oracle_parity(spark, sf_dir, tmp_path):
    """Adversarial duplicate-(channel, ts) fixtures: FIXTURES.md documents
    channel_data as allowing duplicate-ts rows, but the shipped corpus has
    none — so the id tie-break in the gap-fill windows (ADVICE r5: without
    it pv/nv flap with partition order) was never exercised.  This builds an
    events table with three-way ts collisions ON grid instants, at day
    boundaries, and in carry history, then hash-compares every gap-fill
    variant against its DuckDB oracle on that data."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from daq_3i_spark.plans import QUERIES
    from oracle_check import compare, run_oracle
    from daq_3i_spark.schemas import ALL_TABLES

    d = str(tmp_path / "dup_sf")
    os.makedirs(d)
    for t in ALL_TABLES:
        if t != "events":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    def us(s: str) -> int:
        import datetime as dt

        return int(
            dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
            * 1_000_000
        )

    rows = []  # (user_id, ts)
    for ch_u in range(5):  # channels 1..5
        # carry history before the grid (with a 2-way collision)
        rows += [(ch_u, us("2024-01-08 06:00:00"))] * 2
        rows += [(ch_u, us("2024-01-09 23:59:00"))]
        # ON a grid instant: 3-way collision (tie-break decides pv AND nv)
        rows += [(ch_u, us("2024-01-10 08:00:00"))] * 3
        # off-grid seconds within the day
        rows += [(ch_u, us("2024-01-10 14:30:37"))] * 2
        # exactly at the day-1/day-2 boundary midnight (multiday bucket edge)
        rows += [(ch_u, us("2024-01-11 00:00:00"))] * 2
        # day-2 interior + day-3 collision
        rows += [(ch_u, us("2024-01-11 12:00:00"))]
        rows += [(ch_u, us("2024-01-12 18:45:00"))] * 3
        # post-grid carry-out (collision too)
        rows += [(ch_u, us("2024-01-14 03:00:00"))] * 2

    # distinct values per duplicate so a wrong tie-break changes output; NULL
    # values planted exactly where the IGNORE-NULLS/carry split bites — per
    # 16-row channel block: idx 2 is the LAST pre-grid sample (a single-
    # struct carry would pick its NULL value and drop the first grid rows
    # where the oracle interpolates from the older non-null), idx 4 is one
    # of the 3-way mid-grid collision, idx 14 is the first post-grid carry
    # row.  pv/nv must skip these while pt/nt still advance on them.
    values = [float(i * 7 % 13) for i in range(len(rows))]
    for i in range(len(rows)):
        if i % 16 in (2, 4, 14):
            values[i] = None
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")

    ops = [
        "op_timeseries_interpolate",
        "op_timeseries_interpolate_bucketed",
        "op_timeseries_interpolate_multiday",
        "op_timeseries_locf",
        "op_timeseries_locf_bucketed",
        "op_timeseries_locf_multiday",
    ]
    for name in ops:
        q = QUERIES[name]
        problems = compare(q.spark(spark, d), run_oracle(q.oracle, d))
        assert not problems, f"{name} on duplicate-ts data: {problems}"


def test_trend_recovers_exact_slope(spark):
    """op_timeseries_trend's least-squares kernel on constructed data: a
    perfectly linear channel (value = 2.5 + 0.25/hr) recovers slope and
    intercept EXACTLY (integer sufficient statistics, one double division);
    a constant channel gets slope 0; a channel whose samples all share one
    hour (zero x-variance) is filtered, not NaN'd."""
    import pyspark.sql.functions as F

    from daq_3i_spark.plans.analytics_ops import op_timeseries_trend

    rows = []
    for h in range(24):
        rows.append((100 + h, 1, f"2024-01-05 {h:02d}:30:00", 2.5 + 0.25 * h))
        rows.append((200 + h, 2, f"2024-01-05 {h:02d}:30:00", 7.0))
    for k in range(10):
        rows.append((300 + k, 3, f"2024-01-05 11:{k:02d}:00", float(k)))
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    # drive the registered plan body directly on the constructed frame
    from unittest import mock

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {r["channel_id"]: r for r in op_timeseries_trend(spark, "unused").collect()}
    assert set(out) == {1, 2}, "zero-variance channel 3 must be filtered"
    assert out[1]["slope_per_hour"] == 0.25
    assert out[1]["intercept"] == 2.5
    assert out[1]["n_samples"] == 24
    assert out[2]["slope_per_hour"] == 0.0
    assert out[2]["intercept"] == 7.0


def test_seasonal_outlier_flags_planted_anomaly(spark):
    """op_timeseries_seasonal_outlier on constructed data: channel 1 reads
    ~10.0 at minute 00:05 across 31 days except ONE wild 500.0 spike, which
    must be the only flagged sample; channel 2 is constant (zero variance →
    gate closed); single-sample minutes are varianceless and never flag."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_timeseries_seasonal_outlier

    rows = []
    for d in range(1, 32):
        v = 500.0 if d == 15 else 10.0 + (d % 3) * 0.01  # tiny benign wiggle
        rows.append((d, 1, f"2024-01-{d:02d} 00:05:00", v))
        rows.append((100 + d, 2, f"2024-01-{d:02d} 00:05:00", 7.0))
    rows.append((999, 3, "2024-01-01 09:09:00", 123.4))  # lone sample
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {
            r["channel_id"]: r
            for r in op_timeseries_seasonal_outlier(spark, "unused").collect()
        }
    assert out[1]["n_outliers"] == 1 and out[1]["n_samples"] == 31
    assert out[2]["n_outliers"] == 0 and out[2]["n_samples"] == 31
    assert out[3]["n_outliers"] == 0 and out[3]["n_samples"] == 1


def test_seasonal_outlier_cross_engine_on_spiked_corpus(spark, sf_dir, tmp_path):
    """Cross-engine branch coverage for the seasonal gate: the shipped
    corpus fires zero outliers (per-minute groups are too small for any
    sample to exceed 3 sigma of its own group — max attainable z is
    (n-1)/sqrt(n)), so this builds an events table with a DENSE minute
    (31 days at 00:05, one 50x spike) and re-runs the FULL Spark-vs-DuckDB
    hash comparison on it — the is_out=1 arm of both dialects must agree,
    not just the quiet census."""
    import glob
    import os
    import shutil

    import pyspark.sql.functions as F

    from daq_3i_spark.schemas import ALL_TABLES
    from parity_common import check_parity

    d = str(tmp_path / "spiked_sf")
    os.makedirs(d)
    base = sf_dir.replace("sf0.01", "sf0.001")
    for t in ALL_TABLES:
        src_f = os.path.join(base, f"{t}.parquet")
        if t != "events" and os.path.exists(src_f):
            shutil.copy(src_f, os.path.join(d, f"{t}.parquet"))
    rows = []
    for day in range(1, 32):
        v = 500.0 if day == 15 else 10.0 + (day % 3) * 0.01
        # user_id 0 -> channel 1; a second quiet user on channel 2
        rows.append((day, f"2024-01-{day:02d} 00:05:00", 0, "sample", v, "{}"))
        rows.append((100 + day, f"2024-01-{day:02d} 00:05:00", 1, "sample", 7.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.coalesce(1).write.parquet(str(tmp_path / "ev_out"))
    part = glob.glob(str(tmp_path / "ev_out" / "*.parquet"))[0]
    shutil.move(part, os.path.join(d, "events.parquet"))

    for name in ("op_timeseries_seasonal_outlier", "op_timeseries_trend",
                 "op_timeseries_outlier_mad"):
        check_parity(spark, d, name)
    # and the spike actually fires the gate, on its channel only
    from daq_3i_spark.plans import QUERIES

    out = {
        r["channel_id"]: r["n_outliers"]
        for r in QUERIES["op_timeseries_seasonal_outlier"].spark(spark, d).collect()
    }
    assert out == {1: 1, 2: 0}


def test_autocorr_exact_extremes(spark):
    """op_timeseries_autocorr on constructed series: a perfect ramp
    (y = x + c) gives r1 exactly 1.0, a perfect alternation gives exactly
    -1.0 (milli-fixed-point values chosen so the variance cores' squares
    stay under 2^53 — the division and sqrt are then exact); a constant
    hour (zero variance) is filtered."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_timeseries_autocorr

    rows = []
    for i in range(1, 21):  # channel 1: ramp 0.001 .. 0.020
        rows.append((i, 1, f"2024-01-01 10:00:{i:02d}", i * 0.001))
    for i in range(1, 21):  # channel 2: alternation 0.001 / 0.002
        rows.append((100 + i, 2, f"2024-01-01 10:00:{i:02d}", (1 + i % 2) * 0.001))
    for i in range(1, 21):  # channel 3: constant
        rows.append((200 + i, 3, f"2024-01-01 10:00:{i:02d}", 5.0))
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {r["channel_id"]: r for r in op_timeseries_autocorr(spark, "unused").collect()}
    assert set(out) == {1, 2}, "zero-variance channel 3 must be filtered"
    assert out[1]["r1"] == 1.0 and out[1]["n_pairs"] == 19
    assert out[2]["r1"] == -1.0 and out[2]["n_pairs"] == 19


def test_window_range_frame_semantics(spark):
    """op_sql_window_range on constructed series: the trailing 1-hour frame
    is value-defined (inclusive 3600s bound), timestamp TIES are peers (both
    rows see the identical frame including each other), and the average is
    the exact milli-fixed-point ratio."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.sql_surface3 import op_sql_window_range

    rows = [
        # channel 1: 0s, +30min, +61min — the 61min frame drops the 0s sample
        (1, 1, "2024-01-01 10:00:00", 1.0),
        (2, 1, "2024-01-01 10:30:00", 2.0),
        (3, 1, "2024-01-01 11:01:00", 4.0),
        # exactly-1h spacing: the bound is INCLUSIVE, so id 5 still sees id 4
        (4, 1, "2024-01-01 20:00:00", 10.0),
        (5, 1, "2024-01-01 21:00:00", 20.0),
        # channel 2: a timestamp tie — peers share one frame
        (6, 2, "2024-01-01 10:00:00", 1.0),
        (7, 2, "2024-01-01 10:00:00", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {r["id"]: r for r in op_sql_window_range(spark, "unused").collect()}
    assert [out[i]["n_1h"] for i in range(1, 8)] == [1, 2, 2, 1, 2, 2, 2]
    assert out[2]["avg_1h"] == 1.5           # (1+2)/2
    assert out[3]["avg_1h"] == 3.0           # (2+4)/2 — the 0s sample aged out
    assert out[5]["avg_1h"] == 15.0          # inclusive 1h bound keeps id 4
    assert out[6]["avg_1h"] == 2.0 and out[7]["avg_1h"] == 2.0  # tie peers


def test_changepoint_finds_planted_step(spark):
    """op_timeseries_changepoint on constructed hours: a planted level step
    is found at the exact boundary with the exact shift; a pure ramp has a
    CONSTANT mean gap (exactly n/2 at every split), so the deterministic
    tie-break picks the earliest split; a single-sample hour (no valid
    split) is absent."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_timeseries_changepoint

    rows = []
    # channel 1: 10 samples at 1.0 then 10 at 5.0 -> split after t=10, shift 4
    for i in range(20):
        rows.append((i, 1, f"2024-01-01 10:{i:02d}:00", 1.0 if i < 10 else 5.0))
    # channel 2: ramp 1..20 -> shift is 10 at EVERY split; tie-break -> t=1
    for i in range(20):
        rows.append((100 + i, 2, f"2024-01-01 10:{i:02d}:00", float(i + 1)))
    # channel 3: one sample -> no split exists
    rows.append((200, 3, "2024-01-01 10:00:00", 9.0))
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {
            r["channel_id"]: r
            for r in op_timeseries_changepoint(spark, "unused").collect()
        }
    assert set(out) == {1, 2}
    assert out[1]["split_after"] == 10 and out[1]["mean_shift"] == 4.0
    assert out[2]["split_after"] == 1 and out[2]["mean_shift"] == 10.0
    assert out[1]["n_samples"] == 20


def test_gap_census_constructed(spark):
    """op_timeseries_gap_census on constructed feeds: a planted 2h hole is
    counted once with the exact width; a gap-free channel reports zero
    gaps and NULL max; a single-sample channel (no intervals) is absent."""
    import pyspark.sql.functions as F
    from unittest import mock

    from daq_3i_spark.plans.analytics_ops import op_timeseries_gap_census

    rows = []
    # channel 1: minutely samples, one 2-hour hole between 10:05 and 12:05
    for i, t in enumerate(
        ["10:00", "10:01", "10:02", "10:03", "10:04", "10:05", "12:05", "12:06"]
    ):
        rows.append((i, 1, f"2024-01-01 {t}:00", 1.0))
    # channel 2: three samples, one minute apart — no gaps
    for i, t in enumerate(["09:00", "09:01", "09:02"]):
        rows.append((100 + i, 2, f"2024-01-01 {t}:00", 1.0))
    # channel 3: single sample
    rows.append((200, 3, "2024-01-01 08:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "id long, channel_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with mock.patch(
        "daq_3i_spark.sources.daq_dims.channel_data_df", lambda s, d: df
    ):
        out = {
            r["channel_id"]: r
            for r in op_timeseries_gap_census(spark, "unused").collect()
        }
    assert set(out) == {1, 2}
    assert out[1]["n_intervals"] == 7 and out[1]["n_gaps"] == 1
    assert out[1]["max_gap_us"] == 7_200_000_000
    assert out[1]["gap_us_total"] == 7_200_000_000
    assert out[2]["n_gaps"] == 0 and out[2]["max_gap_us"] is None
