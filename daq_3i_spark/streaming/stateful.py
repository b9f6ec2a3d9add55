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


# --- stale-channel monitor (event-time state timeout) ------------------------
#
# The reference marks failed reads with last_status = -1 (bus.py:94) but has
# no liveness detection for channels that silently STOP producing.  With
# keyed state + EventTimeTimeout the engine emits a stale marker when the
# watermark passes a channel's last event time + threshold — the natural
# streaming upgrade of the per-channel status keys (daq-3i.py:284).

STALE_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("status", T.IntegerType(), True),
    ]
)

_STALE_STATE = T.StructType([T.StructField("last_ts_us", T.LongType(), True)])

STALE_STATUS = -1  # bus.py:94's failure marker, reused for staleness


def make_stale_fn(stale_after_s: int):
    def _stale_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_us = state.get[0] if state.exists else None
            state.remove()
            yield pd.DataFrame(
                {
                    "channel_id": [key[0]],
                    "last_ts": [
                        pd.Timestamp(last_us, unit="us") if last_us else pd.NaT
                    ],
                    "status": [STALE_STATUS],
                }
            )
            return
        last_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = (pdf["ts"].astype("int64") // 1000).max()
            last_us = max(last_us or 0, int(ts_us))
        state.update((last_us,))
        # fire when the WATERMARK (event time, not wall clock) passes
        # last_ts + threshold — deterministic under replay.  A timestamp
        # already below the watermark is invalid: clamp to watermark + 1 ms,
        # so an already-stale channel fires on the next micro-batch.
        desired_ms = last_us // 1000 + stale_after_s * 1000
        state.setTimeoutTimestamp(max(desired_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({"channel_id": [], "last_ts": [], "status": []}).astype(
            {"channel_id": "int32", "status": "int32"}
        )

    return _stale_fn


def stale_monitor_stream(samples: DataFrame, stale_after_s: int = 60) -> DataFrame:
    """Emit (channel_id, last_ts, status=-1) when a channel produces nothing
    for ``stale_after_s`` seconds of EVENT time (watermark-driven timeout —
    replay-deterministic, unlike processing-time timeouts).  State per key is
    one timestamp."""
    return (
        samples.withWatermark("ts", "0 seconds")
        .groupBy("channel_id")
        .applyInPandasWithState(
            make_stale_fn(stale_after_s),
            outputStructType=STALE_SCHEMA,
            stateStructType=_STALE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
