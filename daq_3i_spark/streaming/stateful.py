"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps exactly two pieces of per-channel state (SURVEY §2.2/2.4):

* the latest sample (``ChannelState.value/last_read_at`` — bus.py:27-36,
  last-value-wins overwrite), and
* the due-filter clock (``check_read_due``: emit only when
  ``now - last_read_at > timing`` — bus.py:38-49).

Both become one keyed state operator here.  State per key is O(1) (a single
timestamp + value), so state-store size is #channels — trivially shardable
across executors by the groupBy key.  The batch analogs (window row_number /
lag filters in plans/reference_ops.py) are the oracle-checkable twins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LATEST_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _latest_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep the max-(ts, id) sample per channel across micro-batches and emit
    the running latest — the ChannelState slot, minus the lost-update race
    (bus.py:32-36 overwrites unsynchronized; here state is transactional)."""
    if state.exists:
        cur_id, cur_ts_us, cur_value = state.get
    else:
        cur_id, cur_ts_us, cur_value = None, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns -> us
        best = max(range(len(pdf)), key=lambda i: (ts_us[i], int(pdf["id"].iloc[i])))
        if cur_ts_us is None or (ts_us[best], int(pdf["id"].iloc[best])) > (
            cur_ts_us,
            cur_id if cur_id is not None else -1,
        ):
            cur_id = int(pdf["id"].iloc[best])
            cur_ts_us = int(ts_us[best])
            cur_value = float(pdf["value"].iloc[best])
    state.update((cur_id, cur_ts_us, cur_value))
    yield pd.DataFrame(
        {
            "channel_id": [key[0]],
            "id": [cur_id],
            "ts": [pd.Timestamp(cur_ts_us, unit="us")],
            "value": [cur_value],
        }
    )


def latest_per_key_stream(samples: DataFrame) -> DataFrame:
    """Streaming latest-per-channel over a (id, channel_id, ts, value) stream."""
    return samples.groupBy("channel_id").applyInPandasWithState(
        _latest_fn,
        outputStructType=LATEST_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- the due-filter (check_read_due, bus.py:38-49) ---------------------------

DUE_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_DUE_STATE = T.StructType([T.StructField("last_emit_us", T.LongType(), True)])


def _due_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit a sample only when its event time is more than ``timing`` seconds
    past the previously *emitted* sample — the reference's per-channel
    sampling-interval gate (strict `>`, seconds; last_read_at advances on
    every emitted read, bus.py:46-48).  The group's Arrow chunks are
    concatenated and sorted ONCE so rows are processed in global (ts, id)
    order — per-chunk sorting deviates whenever a key's micro-batch spans
    more than one Arrow batch (ADVICE r1).  State per key stays O(1); the
    per-batch group itself must fit in memory, which applyInPandasWithState
    already assumes."""
    last_us = state.get[0] if state.exists else None
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    out = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "id"])
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        timing_us = pdf["timing"].to_numpy() * 1_000_000
        emit = []
        for i in range(len(pdf)):
            if last_us is None or ts_us[i] - last_us > timing_us[i]:
                emit.append(i)
                last_us = int(ts_us[i])
        if emit:
            sel = pdf.iloc[emit]
            out.append(sel[["channel_id", "id", "ts", "value"]])
    state.update((last_us,))
    yield from iter(out) if out else iter(
        [pd.DataFrame(columns=["channel_id", "id", "ts", "value"])]
    )


def due_filter_stream(samples_with_timing: DataFrame) -> DataFrame:
    """Streaming due-filter over (id, channel_id, ts, value, timing) — the
    ``timing`` column comes from the broadcast channels dim.  State per key is
    one timestamp; the batch lag-based analog (op_filter_due) approximates
    this, the stateful form is exact w.r.t. the reference."""
    return samples_with_timing.groupBy("channel_id").applyInPandasWithState(
        _due_fn,
        outputStructType=DUE_SCHEMA,
        stateStructType=_DUE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
