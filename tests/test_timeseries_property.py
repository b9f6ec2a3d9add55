"""Property-based checks of the time-series joins (operators/timeseries.py)
against brute-force python references — random keys/timestamps including the
adversarial cases (equal timestamps, empty ranges, bucket-boundary hits) that
fixed fixtures miss."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from daq_3i_spark.operators.timeseries import asof_join, range_join

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=seconds)


_key = st.integers(min_value=1, max_value=3)
# second offsets chosen so collisions and bucket boundaries (3600) happen
_sec = st.integers(min_value=0, max_value=7200)

_data_rows = st.lists(
    st.tuples(_key, _sec, st.integers(min_value=-100, max_value=100)),
    min_size=0,
    max_size=12,
)
_query_rows = st.lists(st.tuples(_key, _sec), min_size=1, max_size=6)


_DATA_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("id", T.LongType()),
    ]
)
_QUERY_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@settings(max_examples=12, deadline=None)
@given(data=_data_rows, queries=_query_rows)
def test_asof_join_matches_reference(spark, data, queries):
    d_rows = [(k, _ts(s), float(v), i) for i, (k, s, v) in enumerate(data)]
    q_rows = [(k, _ts(s)) for k, s in queries]
    d = spark.createDataFrame(d_rows, _DATA_SCHEMA)
    q = spark.createDataFrame(q_rows, _QUERY_SCHEMA)

    got = {
        (r["channel_id"], r["ts"]): r["asof_value"]
        for r in asof_join(q, d, key="channel_id").collect()
    }

    for k, ts in q_rows:
        # reference: latest strictly-before sample; highest id wins ties
        cands = [(row[1], row[3], row[2]) for row in d_rows if row[0] == k and row[1] < ts]
        expected = max(cands)[2] if cands else None
        assert got[(k, ts)] == expected, (k, ts, got[(k, ts)], expected)


_ivl_rows = st.lists(
    st.tuples(_key, _sec, st.integers(min_value=0, max_value=7200)),
    min_size=1,
    max_size=5,
)


@settings(max_examples=12, deadline=None)
@given(data=_data_rows, ivls=_ivl_rows, bucket_s=st.sampled_from([60, 3600, 7200]))
def test_range_join_matches_reference(spark, data, ivls, bucket_s):
    d_rows = [(k, _ts(s), float(v), i) for i, (k, s, v) in enumerate(data)]
    i_rows = [
        (k, j, _ts(s), _ts(s + w)) for j, (k, s, w) in enumerate(ivls)
    ]
    d = spark.createDataFrame(d_rows, _DATA_SCHEMA)
    ivl_schema = T.StructType(
        [
            T.StructField("channel_id", T.IntegerType()),
            T.StructField("ivl_id", T.IntegerType()),
            T.StructField("interval_start", T.TimestampType()),
            T.StructField("interval_end", T.TimestampType()),
        ]
    )
    iv = spark.createDataFrame(i_rows, ivl_schema)

    got = sorted(
        (r["ivl_id"], r["id"])
        for r in range_join(iv, d, key="channel_id", bucket_s=bucket_s).collect()
    )
    expected = sorted(
        (j, i)
        for (k, j, s, e) in i_rows
        for (dk, ts, _v, i) in d_rows
        if dk == k and s <= ts < e
    )
    assert got == expected, f"bucket_s={bucket_s}: {got} != {expected}"
