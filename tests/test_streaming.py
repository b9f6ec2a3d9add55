"""Live-mode streaming behaviors that the single-batch driver replay can't
check: multi-micro-batch sink evolution (append + status upsert across
batches), keyed-state evolution in applyInPandasWithState, and the Modbus
DataSource in streaming mode.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from pyspark.sql import functions as F

from daq_3i_spark.operators.core import latest_per_key
from daq_3i_spark.sources.daq_dims import channels_df
from daq_3i_spark.streaming.pipeline import (
    enrich_and_convert,
    persist_batch,
    read_channel_data,
    read_status,
    retention_compact,
)
from daq_3i_spark.streaming.stateful import latest_per_key_stream

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture()
def feed_dir(spark, sf_dir):
    """The sf0.001 sample feed split into 3 parquet files so
    maxFilesPerTrigger=1 yields 3 micro-batches."""
    from daq_3i_spark.sources.daq_dims import channel_data_df

    d = os.path.join(TMP, "test_feed")
    if os.path.isdir(d):
        shutil.rmtree(d)
    channel_data_df(spark, sf_dir).repartition(3).write.parquet(d)
    # FileStreamSource orders batches by file modification time (ties break
    # arbitrarily) — pin distinct mtimes in sorted-name order so the batch
    # sequence is deterministic and tests can replay it
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    base = int(time.time()) - 600
    for i, f in enumerate(files):
        os.utime(os.path.join(d, f), (base + 10 * i, base + 10 * i))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sample_stream(spark, feed: str):
    from daq_3i_spark.schemas import CHANNEL_DATA

    return (
        spark.readStream.schema(CHANNEL_DATA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )


def test_pipeline_multibatch(spark, sf_dir, feed_dir):
    work = os.path.join(TMP, "test_pipeline")
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)

    enriched = enrich_and_convert(_sample_stream(spark, feed_dir), spark)
    q = (
        enriched.writeStream.foreachBatch(
            lambda b, bid: persist_batch(spark, work, b, bid)
        )
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    # sink contents == batch-computed expectation (multi-batch append converges
    # to the same rows as one batch)
    expected = enrich_and_convert(
        spark.read.parquet(feed_dir).selectExpr("id", "channel_id", "ts", "value"),
        spark,
    )
    got = read_channel_data(spark, work)
    assert got.count() == expected.count()
    assert (
        got.exceptAll(expected).count() == 0 and expected.exceptAll(got).count() == 0
    )

    # status snapshot: heartbeat + one CHL key per persisted channel,
    # ts = latest event time seen for that key (latest-wins across batches)
    status = read_status(spark, work)
    rows = {r["parameter"]: r for r in status.collect()}
    assert "daq-3i" in rows
    per_chl_max = {
        r["channel_id"]: r["mx"]
        for r in expected.groupBy("channel_id").agg(F.max("ts").alias("mx")).collect()
    }
    for cid, mx in per_chl_max.items():
        assert rows[f"CHL: {cid}"]["ts"] == mx
    assert rows["daq-3i"]["ts"] == max(per_chl_max.values())

    # retention: count per channel <= history_len, newest ids kept
    retention_compact(spark, work)
    kept = read_channel_data(spark, work)
    hist = {
        r["id"]: r["history_len"]
        for r in channels_df(spark).select("id", "history_len").collect()
    }
    counts = {r["channel_id"]: r["n"] for r in kept.groupBy("channel_id").agg(F.count("*").alias("n")).collect()}
    for cid, n in counts.items():
        assert n <= hist[cid], f"channel {cid}: {n} > history_len {hist[cid]}"
    # newest-kept: max id per channel unchanged by compaction
    max_before = {
        r["channel_id"]: r["m"]
        for r in expected.groupBy("channel_id").agg(F.max("id").alias("m")).collect()
    }
    max_after = {
        r["channel_id"]: r["m"]
        for r in kept.groupBy("channel_id").agg(F.max("id").alias("m")).collect()
    }
    assert max_after == max_before
    shutil.rmtree(work, ignore_errors=True)


def test_latest_state_multibatch(spark, sf_dir, feed_dir):
    q = (
        latest_per_key_stream(_sample_stream(spark, feed_dir))
        .writeStream.format("memory")
        .queryName("t_latest_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink accumulates one row per key per batch; the final
    # state per key is the last (max ts, id) emission
    emitted = spark.table("t_latest_mb")
    final = latest_per_key(emitted, "channel_id", [F.desc("ts"), F.desc("id")])

    batch = latest_per_key(
        spark.read.parquet(feed_dir), "channel_id", [F.desc("ts"), F.desc("id")]
    ).select("channel_id", "id", "ts", "value")
    assert sorted(final.collect()) == sorted(batch.collect())


def test_modbus_stream_two_ticks(spark):
    from daq_3i_spark.sources.modbus_source import ModbusSimDataSource

    try:
        spark.dataSource.register(ModbusSimDataSource)
    except Exception:
        pass
    q = (
        spark.readStream.format("modbus_sim")
        .option("poll_ts", 1_700_000_000)
        .load()
        .writeStream.format("memory")
        .queryName("t_modbus_stream")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        ticks = {r["tick"] for r in spark.table("t_modbus_stream").select("tick").distinct().collect()}
        if len(ticks) >= 2:
            break
        time.sleep(0.5)
    q.stop()
    assert len(ticks) >= 2, f"saw ticks {ticks}"
    # each tick is one full poll sweep: 18 pollable channels (enabled, TCP bus,
    # func code 3)
    per_tick = (
        spark.table("t_modbus_stream")
        .groupBy("tick")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n"] == 18 for r in per_tick)


def _expected_decode(fmt: int, addr: int) -> float | None:
    """Independent expectation: simulator register n holds n (tick 0);
    assemble + bit-cast with struct, per the documented format table
    (functions/decode.py module doc; reference modbus.py:58-166)."""
    import math
    import struct

    r0, r1, r2 = addr, addr + 1, addr + 2

    def s16(r):
        return r - 65536 if r >= 32768 else r

    def s32(u):
        return u - 4294967296 if u >= 2147483648 else u

    def bswap(r):
        return ((r & 255) << 8) | (r >> 8)

    def f32(u):
        v = struct.unpack(">f", struct.pack(">I", u))[0]
        return None if not math.isfinite(v) else v

    lo_hi, hi_lo = (r1 << 16) | r0, (r0 << 16) | r1
    skip, rskip = (r2 << 16) | r0, (r0 << 16) | r2
    return {
        0: float(s16(r0)),
        1: float(s32(lo_hi)),
        2: float(s32(hi_lo)),
        3: float(s32(skip)),
        4: float(r0),
        5: float(lo_hi),
        6: float(hi_lo),
        7: f32(lo_hi),
        8: f32(skip),
        9: f32((bswap(r1) << 16) | bswap(r0)),
        10: f32(hi_lo),
        11: f32(rskip),
        12: f32(hi_lo),
        13: float(s32(lo_hi)),
    }[fmt]


def test_modbus_batch_decode(spark):
    """Every one of the 14 format codes must poll enough registers AND decode
    to the independently-computed bit-cast value (guards FORMAT_REGS /
    REG_COUNT drift: an under-polled format decodes to NULL)."""
    from daq_3i_spark.plans import QUERIES

    df = QUERIES["op_source_modbus_sim"].spark(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 18
    seen_formats = set()
    for r in rows:
        exp = _expected_decode(r["format_code"], r["address"])
        assert r["value"] == exp, (
            f"channel {r['channel_id']} format {r['format_code']}: "
            f"got {r['value']} want {exp}"
        )
        seen_formats.add(r["format_code"])
    assert seen_formats == set(range(14))


@pytest.mark.parametrize("arrow_batch", [None, 1])
def test_due_filter_matches_sequential_reference(spark, sf_dir, feed_dir, arrow_batch):
    """The stateful due-filter must reproduce the reference's check_read_due
    semantics (bus.py:38-49) exactly: per channel, emit iff
    ts - last_emitted_ts > timing (strict), scanning samples in (ts, id)
    order — verified against a plain-python sequential simulation, across
    multiple micro-batches.  The arrow_batch=7 variant forces every group to
    span several Arrow chunks, exercising the global concat+sort in _due_fn
    (ADVICE r1: per-chunk sorting broke ordering beyond one chunk)."""
    from daq_3i_spark.sources.daq_dims import channels_df
    from daq_3i_spark.streaming.stateful import due_filter_stream

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    if arrow_batch is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
    try:
        timing = channels_df(spark).select(F.col("id").alias("channel_id"), "timing")
        q = (
            due_filter_stream(_sample_stream(spark, feed_dir).join(F.broadcast(timing), "channel_id"))
            .writeStream.format("memory")
            .queryName("t_due_mb")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["channel_id"], r["id"]) for r in spark.table("t_due_mb").collect()}
    finally:
        if arrow_batch is not None:
            if prev is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    # sequential python reference: batches are the 3 feed files in commit
    # order, rows within a batch in (ts, id) order
    import pyarrow.parquet as pq
    import os as _os

    files = sorted(
        _os.path.join(feed_dir, f) for f in _os.listdir(feed_dir) if f.endswith(".parquet")
    )
    tmap = {r["channel_id"]: r["timing"] for r in timing.collect()}
    last: dict[int, int] = {}
    expect = set()
    for fp in files:
        tbl = pq.read_table(fp).to_pylist()
        tbl.sort(key=lambda r: (r["ts"], r["id"]))
        for r in tbl:
            cid = r["channel_id"]
            ts_us = int(r["ts"].timestamp() * 1_000_000)
            if cid not in last or ts_us - last[cid] > tmap[cid] * 1_000_000:
                expect.add((cid, r["id"]))
                last[cid] = ts_us
    assert got == expect


def test_persist_batch_replay_idempotent(spark, tmp_path):
    """A crash between the sink write and the checkpoint commit replays the
    batch; the per-batch overwrite directory must converge instead of
    duplicating rows (ADVICE r1: plain append was at-least-once)."""
    import datetime as dt

    work = str(tmp_path / "replay")
    mk = lambda vid: spark.createDataFrame(  # noqa: E731
        [(vid, 1, dt.datetime(2024, 1, 1, 0, 0, vid), float(vid))],
        "id long, channel_id int, ts timestamp, value double",
    )
    persist_batch(spark, work, mk(1), 0)
    assert read_channel_data(spark, work).count() == 1
    persist_batch(spark, work, mk(1), 0)  # replay of the same batch id
    assert read_channel_data(spark, work).count() == 1, "replay duplicated rows"
    persist_batch(spark, work, mk(2), 1)  # a genuinely new batch still lands
    assert read_channel_data(spark, work).count() == 2


def test_upsert_status_rewrites_only_touched_buckets(spark, tmp_path):
    """The status upsert is the merge_upsert touched-partition protocol on
    hash buckets (VERDICT r13): an N-key batch writes <= min(N,
    STATUS_BUCKETS) bucket dirs into its version, untouched buckets stay
    byte-for-byte in older versions, and read_status unions each bucket's
    newest copy (latest-wins across versions)."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        STATUS_BUCKETS,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "bucketed")
    t0 = dt.datetime(2024, 1, 1)
    full = spark.createDataFrame(
        [(f"CHL: {i}", 1, t0) for i in range(200)],
        "parameter string, status int, ts timestamp",
    )
    upsert_status(spark, work, full, 0)
    v0 = os.path.join(work, "daq_status", "v=0")
    v0_buckets = sorted(d for d in os.listdir(v0) if d.startswith("__b="))
    assert len(v0_buckets) == STATUS_BUCKETS  # 200 keys cover every bucket
    v0_bytes = {
        d: sorted(
            (f, os.path.getsize(os.path.join(v0, d, f)))
            for f in os.listdir(os.path.join(v0, d))
            if f.endswith(".parquet")
        )
        for d in v0_buckets
    }

    # a 2-key batch (one channel + heartbeat) touches <= 2 buckets
    t1 = dt.datetime(2024, 1, 2)
    small = spark.createDataFrame(
        [("CHL: 7", 1, t1), ("daq-3i", 1, t1)],
        "parameter string, status int, ts timestamp",
    )
    upsert_status(spark, work, small, 1)
    v1 = os.path.join(work, "daq_status", "v=1")
    v1_buckets = sorted(d for d in os.listdir(v1) if d.startswith("__b="))
    assert 1 <= len(v1_buckets) <= 2, v1_buckets

    # untouched v=0 buckets are byte-for-byte what they were
    for d in v0_buckets:
        now = sorted(
            (f, os.path.getsize(os.path.join(v0, d, f)))
            for f in os.listdir(os.path.join(v0, d))
            if f.endswith(".parquet")
        )
        assert now == v0_bytes[d], d

    # the live snapshot is latest-wins across versions
    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert len(rows) == 201  # 200 channels + heartbeat
    assert rows["CHL: 7"] == t1
    assert rows["daq-3i"] == t1
    assert rows["CHL: 8"] == t0

    # replaying version 1 converges (pure function of pre-batch state)
    upsert_status(spark, work, small, 1)
    rows2 = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert rows2 == rows


def test_status_version_gc_bounds_dirs_and_keeps_pinned_buckets(spark, tmp_path):
    """Superseded status versions are GC'd (a 1 Hz pipeline would otherwise
    grow one dir per micro-batch forever), but a version holding some
    bucket's NEWEST copy is pinned until that bucket is rewritten — GC can
    never drop live data."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        _status_versions,
        read_status,
        upsert_status,
    )

    from daq_3i_spark.streaming.pipeline import _status_bucket

    work = str(tmp_path / "gc")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    mk = lambda rows, i: spark.createDataFrame(  # noqa: E731
        [(p, 1, t(i)) for p in rows],
        "parameter string, status int, ts timestamp",
    )
    # key set chosen so later batches NEVER touch the pinned key's bucket —
    # the pinned key's newest copy stays in v=0, which GC must then keep
    cands = spark.createDataFrame(
        [(f"k{j}",) for j in range(64)] + [("pinned-key",)], "parameter string"
    )
    bmap = {
        r["parameter"]: r["b"]
        for r in cands.select(
            "parameter", _status_bucket(F.col("parameter")).alias("b")
        ).collect()
    }
    ks = [k for k in bmap if k != "pinned-key" and bmap[k] != bmap["pinned-key"]][:32]
    assert len(ks) == 32

    # batch 0 carries the loner key; batches 1..6 rewrite the other buckets
    upsert_status(spark, work, mk(["pinned-key"] + ks, 0), 0)
    for i in range(1, 7):
        upsert_status(spark, work, mk(ks, i), i)

    vs = _status_versions(work)
    # v=0 is pinned (holds pinned-key's newest bucket copy) + the keep-2 tail
    assert 0 in vs
    assert len(vs) <= 2 + 1, vs  # keep-2 + the pinned version
    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert rows["pinned-key"] == t(0)
    assert rows[ks[3]] == t(6)
    assert len(rows) == 33


def test_status_gc_preserves_replay_inputs(spark, tmp_path):
    """ADVICE r14 (high): GC runs inside upsert_status right after writing
    the HEAD version — before the streaming checkpoint commits it.  If
    supersession-by-head could free a version, the exact crash window
    test_pipeline_crash_restart_exactly_once pins (crash between sink write
    and checkpoint commit) would replay the head batch against a snapshot
    whose pre-batch bucket copy was GC'd, silently dropping every key of
    that bucket absent from the replayed batch.  Construct that window:
    v=0 is the ONLY holder of bucket B (keys a+b), filler batches push it
    past the keep-2 tail, the head batch rewrites bucket B with just key a
    (GC fires), then the head is REPLAYED — key b must still be there."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        _status_bucket,
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "gc_replay")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    mk = lambda rows, i: spark.createDataFrame(  # noqa: E731
        [(p, 1, t(i)) for p in rows],
        "parameter string, status int, ts timestamp",
    )
    cands = spark.createDataFrame(
        [(f"k{j}",) for j in range(128)], "parameter string"
    )
    bmap = {
        r["parameter"]: r["b"]
        for r in cands.select(
            "parameter", _status_bucket(F.col("parameter")).alias("b")
        ).collect()
    }
    by_bucket: dict[int, list[str]] = {}
    for k, b in sorted(bmap.items()):
        by_bucket.setdefault(b, []).append(k)
    bucket_b, (key_a, key_b, *_rest) = next(
        (b, ks) for b, ks in sorted(by_bucket.items()) if len(ks) >= 2
    )
    fillers = [ks[0] for b, ks in sorted(by_bucket.items()) if b != bucket_b][:8]
    assert len(fillers) >= 3

    # v=0: sole holder of bucket B (keys a+b); v=1..3: other buckets only
    upsert_status(spark, work, mk([key_a, key_b], 0), 0)
    for i in range(1, 4):
        upsert_status(spark, work, mk(fillers, i), i)
    assert 0 in _status_versions(work), "setup: v=0 must still be pinned"

    # head batch 4 rewrites bucket B with ONLY key a; GC fires inside
    head = mk([key_a], 4)
    upsert_status(spark, work, head, 4)
    # crash before checkpoint commit -> foreachBatch replays batch 4
    upsert_status(spark, work, head, 4)

    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert rows.get(key_b) == t(0), (
        "replay after GC dropped a key whose pre-batch bucket copy was freed"
    )
    assert rows[key_a] == t(4)


def test_status_upsert_replay_overwrites_partial_version(spark, tmp_path):
    """A crash MID-WRITE of version v=N can leave a partial dir (some
    bucket subdirs written, no guarantee of completeness — parquet has no
    dir-level transaction).  The replay's mode=overwrite truncates the
    whole v=N target (static overwrite, not dynamic-partition), so stale
    partial buckets cannot survive next to the replayed ones and the
    snapshot converges to the pure function of (pre-batch state, batch)."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        STATUS_BUCKETS,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "partial")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    full = spark.createDataFrame(
        [(f"CHL: {i}", 1, t(0)) for i in range(200)],
        "parameter string, status int, ts timestamp",
    )
    upsert_status(spark, work, full, 0)

    # fabricate a crashed batch-1 write: a v=1 dir holding ONE stale bucket
    # copy that the real batch 1 would not produce (garbage timestamp)
    v1 = os.path.join(work, "daq_status", "v=1")
    garbage = spark.createDataFrame(
        [("CHL: 7", 1, t(59))], "parameter string, status int, ts timestamp"
    ).withColumn("__b", F.lit(3))
    garbage.write.partitionBy("__b").mode("overwrite").parquet(v1)
    assert os.path.isdir(os.path.join(v1, "__b=3"))

    # the replay of batch 1 (crash recovery) must fully supersede the
    # partial dir — including the garbage bucket it never touches
    small = spark.createDataFrame(
        [("daq-3i", 1, t(1))], "parameter string, status int, ts timestamp"
    )
    upsert_status(spark, work, small, 1)
    assert not os.path.isdir(os.path.join(v1, "__b=3")), (
        "static overwrite must truncate the whole partial version dir"
    )
    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert rows["CHL: 7"] == t(0), "garbage from the crashed write leaked"
    assert rows["daq-3i"] == t(1)
    assert len(rows) == 201


def test_status_gc_version_count_stays_bounded_under_soak(spark, tmp_path):
    """The replay-input pinning (below-head liveness) must not reopen the
    unbounded-growth problem GC exists to solve: besides the keep-2 tail,
    each bucket can pin at most its newest copy and its newest-below-head
    copy, so the version-dir count is bounded by ~2*STATUS_BUCKETS + keep
    regardless of batch count.  30 skewed batches (deterministic key
    subsets, some buckets hot, some written once) must stay under that
    bound while every key's latest value survives."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        STATUS_BUCKETS,
        _STATUS_KEEP_VERSIONS,
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "gc_soak")
    t = lambda i: dt.datetime(2024, 1, 1, 0, i % 60, i // 60)  # noqa: E731
    keys = [f"CHL: {i}" for i in range(40)]
    expect: dict[str, object] = {}
    for b in range(30):
        # deterministic skew: key j is in batch b iff b % (1 + j % 7) == 0
        batch_keys = [k for j, k in enumerate(keys) if b % (1 + j % 7) == 0]
        if not batch_keys:
            batch_keys = [keys[b % len(keys)]]
        for k in batch_keys:
            expect[k] = t(b)
        upsert_status(
            spark,
            work,
            spark.createDataFrame(
                [(k, 1, t(b)) for k in batch_keys],
                "parameter string, status int, ts timestamp",
            ),
            b,
        )
        n_versions = len(_status_versions(work))
        assert n_versions <= 2 * STATUS_BUCKETS + _STATUS_KEEP_VERSIONS, (
            f"batch {b}: {n_versions} version dirs — GC bound broken"
        )

    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert rows == expect


def test_status_flat_snapshot_migrates_wholesale_on_first_upsert(spark, tmp_path):
    """A NONEMPTY flat snapshot (hand-written or legacy layout) must not
    split-brain with bucketed versions: because the bucket filter returns
    the whole flat dir, the first upsert merges ALL its rows (every
    bucket, not just the touched ones) and rewrites them into the
    bucketed layout — one version later the flat dir is fully superseded,
    so no read can ever union a bucket's rows from both layouts."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "flat_migrate")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    v0 = os.path.join(work, "daq_status", "v=0")
    spark.createDataFrame(
        [(f"CHL: {i}", 1, t(0)) for i in range(100)],
        "parameter string, status int, ts timestamp",
    ).coalesce(1).write.parquet(v0)  # FLAT: no __b=* dirs
    assert not any(n.startswith("__b=") for n in os.listdir(v0))

    # a 1-key upsert touches one bucket, but must carry the whole flat
    # snapshot into v=1's bucketed layout
    upsert_status(
        spark,
        work,
        spark.createDataFrame(
            [("CHL: 7", 1, t(1))], "parameter string, status int, ts timestamp"
        ),
        1,
    )
    v1 = os.path.join(work, "daq_status", "v=1")
    v1_buckets = [n for n in os.listdir(v1) if n.startswith("__b=")]
    assert len(v1_buckets) > 2, "flat rows must migrate into v=1's buckets"

    rows = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert len(rows) == 100
    assert rows["CHL: 7"] == t(1)
    assert rows["CHL: 8"] == t(0)

    # two more upserts push v=0 past keep-2; fully superseded -> GC'd
    for i in (2, 3):
        upsert_status(
            spark,
            work,
            spark.createDataFrame(
                [("daq-3i", 1, t(i))], "parameter string, status int, ts timestamp"
            ),
            i,
        )
    assert 0 not in _status_versions(work), "superseded flat dir not GC'd"
    assert {r["parameter"] for r in read_status(spark, work).collect()} == (
        {f"CHL: {i}" for i in range(100)} | {"daq-3i"}
    )


def _keys_by_bucket(spark, n_cands: int = 256) -> dict[int, list[str]]:
    """Candidate status keys grouped by their snapshot hash bucket."""
    from daq_3i_spark.streaming.pipeline import _status_bucket

    cands = spark.createDataFrame(
        [(f"CHL: {j}",) for j in range(n_cands)], "parameter string"
    )
    out: dict[int, list[str]] = {}
    for r in cands.select(
        "parameter", _status_bucket(F.col("parameter")).alias("b")
    ).collect():
        out.setdefault(r["b"], []).append(r["parameter"])
    for ks in out.values():
        ks.sort()
    return out


def test_status_flat_partial_bucket_coverage_no_split_brain(spark, tmp_path):
    """ADVICE r15 (medium): a nonempty FLAT version whose keys DON'T cover
    every bucket must still be fully superseded by the first upsert.
    Pre-fix, the migration write created ``__b=*`` dirs only for buckets
    with rows, so the flat dir kept claiming the rowless buckets and
    read_status re-read it WHOLE — unioning stale copies of keys already
    superseded in the bucketed layout (duplicate parameters, stale ts).
    The wholesale-migration test didn't catch it because its 100 keys
    happened to cover all 16 buckets."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "flat_partial")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    by_bucket = _keys_by_bucket(spark)
    # flat snapshot confined to TWO buckets — 14 buckets stay rowless
    b0, b1 = sorted(by_bucket)[:2]
    flat_keys = (by_bucket[b0] + by_bucket[b1])[:10]
    assert len(flat_keys) == 10
    v0 = os.path.join(work, "daq_status", "v=0")
    spark.createDataFrame(
        [(k, 1, t(0)) for k in flat_keys],
        "parameter string, status int, ts timestamp",
    ).coalesce(1).write.parquet(v0)  # FLAT: no __b=* dirs
    assert not any(n.startswith("__b=") for n in os.listdir(v0))

    upsert_status(
        spark,
        work,
        spark.createDataFrame(
            [(flat_keys[0], 1, t(1))], "parameter string, status int, ts timestamp"
        ),
        1,
    )
    rows = read_status(spark, work).collect()
    params = [r["parameter"] for r in rows]
    assert len(params) == len(set(params)), (
        "split-brain: a read unioned the stale flat snapshot next to the "
        "bucketed layout"
    )
    got = {r["parameter"]: r["ts"] for r in rows}
    assert got == {k: (t(1) if k == flat_keys[0] else t(0)) for k in flat_keys}

    # ADVICE r15 (low): the flat version must become GC-able even though
    # its keys never covered every bucket
    for i in (2, 3):
        upsert_status(
            spark,
            work,
            spark.createDataFrame(
                [("daq-3i", 1, t(i))], "parameter string, status int, ts timestamp"
            ),
            i,
        )
    assert 0 not in _status_versions(work), (
        "flat version pinned forever despite full supersession by the "
        "_FULL_SNAPSHOT migration version"
    )
    got = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert got == {
        **{k: (t(1) if k == flat_keys[0] else t(0)) for k in flat_keys},
        "daq-3i": t(3),
    }


def test_create_table_flat_v0_gc_even_with_unhit_buckets(spark, tmp_path):
    """ADVICE r15 (low), empty-init case: the CLI CREATE-TABLE zero-row
    flat v=0 must not be pinned by GC forever when the live key set never
    hashes into some bucket (41 keys over 16 buckets makes an unhit bucket
    plausible).  The _FULL_SNAPSHOT migration version claims every bucket,
    so v=0 is fully superseded regardless of key coverage."""
    import datetime as dt

    from daq_3i_spark import schemas
    from daq_3i_spark.streaming.pipeline import (
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "empty_init")
    spark.createDataFrame([], schemas.DAQ_STATUS).write.mode("overwrite").parquet(
        os.path.join(work, "daq_status", "v=0")
    )
    # initialized table is readable as an empty typed frame (pre-r14 pin)
    assert read_status(spark, work).count() == 0

    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    by_bucket = _keys_by_bucket(spark)
    one_key = by_bucket[sorted(by_bucket)[0]][0]  # single bucket hit, ever
    for i in range(1, 4):
        upsert_status(
            spark,
            work,
            spark.createDataFrame(
                [(one_key, 1, t(i))], "parameter string, status int, ts timestamp"
            ),
            i,
        )
    assert 0 not in _status_versions(work), (
        "zero-row CREATE-TABLE flat v=0 pinned forever by unhit buckets"
    )
    got = {r["parameter"]: r["ts"] for r in read_status(spark, work).collect()}
    assert got == {one_key: t(3)}


def test_status_flat_migration_replayed_after_crash(spark, tmp_path):
    """VERDICT r15 #5: crash between the wholesale-migration write and its
    checkpoint commit, then replay.  The replay must still read the flat
    dir as the full pre-batch snapshot (the ``before=batch_id`` view
    excludes the just-written migration version AND its marker), and must
    converge to the identical post-migration state — including when the
    crash tore the write so the bucket dirs landed but the _FULL_SNAPSHOT
    marker didn't (the marker is written after the parquet job)."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import (
        _FULL_MARKER,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "flat_crash")
    t = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    by_bucket = _keys_by_bucket(spark)
    b0, b1 = sorted(by_bucket)[:2]
    flat_keys = (by_bucket[b0] + by_bucket[b1])[:10]
    v0 = os.path.join(work, "daq_status", "v=0")
    spark.createDataFrame(
        [(k, 1, t(0)) for k in flat_keys],
        "parameter string, status int, ts timestamp",
    ).coalesce(1).write.parquet(v0)

    head = spark.createDataFrame(
        [(flat_keys[0], 1, t(1))], "parameter string, status int, ts timestamp"
    )
    expect = {k: (t(1) if k == flat_keys[0] else t(0)) for k in flat_keys}

    # crash point A: full migration write landed, checkpoint never
    # committed -> foreachBatch replays batch 1 verbatim
    upsert_status(spark, work, head, 1)
    upsert_status(spark, work, head, 1)
    rows = read_status(spark, work).collect()
    assert len(rows) == len({r["parameter"] for r in rows})
    assert {r["parameter"]: r["ts"] for r in rows} == expect

    # crash point B: the parquet job finished but the marker write didn't
    # (torn migration) -> the replay's mode=overwrite rewrites dir+marker
    v1 = os.path.join(work, "daq_status", "v=1")
    os.remove(os.path.join(v1, _FULL_MARKER))
    upsert_status(spark, work, head, 1)
    assert os.path.exists(os.path.join(v1, _FULL_MARKER)), (
        "replay did not restore the torn migration marker"
    )
    rows = read_status(spark, work).collect()
    assert len(rows) == len({r["parameter"] for r in rows})
    assert {r["parameter"]: r["ts"] for r in rows} == expect


def test_status_bucket_dirs_property_matches_reference(tmp_path):
    """Pure-filesystem property check of ``_status_bucket_dirs`` (the
    liveness primitive that read_status, upsert_status's pre-batch merge,
    AND the GC pin set all stand on): against an independent per-bucket
    max-version reference, across random interleavings of bucketed
    versions, a flat (CLI-init) version, a ``_FULL_SNAPSHOT``-marked
    migration version (claims every bucket; rowless buckets claimed EMPTY
    — superseding older copies without contributing a read path), and the
    ``before``/``buckets`` parameters.  No Spark needed — the function only lists directories."""
    from hypothesis import given, settings, strategies as st

    from daq_3i_spark.streaming.pipeline import (
        STATUS_BUCKETS,
        _status_bucket_dirs,
    )

    layouts = st.lists(
        st.one_of(
            st.just("flat"),
            st.sets(
                st.integers(0, STATUS_BUCKETS - 1), min_size=1, max_size=5
            ),
            st.tuples(
                st.just("full"),
                st.sets(st.integers(0, STATUS_BUCKETS - 1), max_size=5),
            ),
        ),
        min_size=0,
        max_size=8,
    )

    case_n = [0]

    @settings(max_examples=60, deadline=None)
    @given(
        layouts,
        st.one_of(st.none(), st.integers(0, 9)),
        st.one_of(
            st.none(),
            st.sets(st.integers(0, STATUS_BUCKETS - 1), min_size=1, max_size=4),
        ),
    )
    def run(versions, before, buckets):
        case_n[0] += 1
        work = str(tmp_path / f"case{case_n[0]}")
        d = os.path.join(work, "daq_status")
        for v, spec in enumerate(versions):
            vd = os.path.join(d, f"v={v}")
            if spec == "flat":
                os.makedirs(vd)
                open(os.path.join(vd, "part-00000.parquet"), "w").close()
            else:
                marked = isinstance(spec, tuple)
                present = spec[1] if marked else spec
                os.makedirs(vd, exist_ok=True)
                for b in present:
                    bd = os.path.join(vd, f"__b={b}")
                    os.makedirs(bd)
                    open(os.path.join(bd, "part-00000.parquet"), "w").close()
                if marked:
                    open(os.path.join(vd, "_FULL_SNAPSHOT"), "w").close()

        # independent reference: newest claim per bucket; flat = all
        # buckets read from the version dir; full-marked = all buckets,
        # rowless ones claimed EMPTY (claim without a read path)
        best: dict[int, str | None] = {}
        for v, spec in enumerate(versions):
            if before is not None and v >= before:
                continue
            vd = os.path.join(d, f"v={v}")
            marked = isinstance(spec, tuple)
            present = set() if spec == "flat" else (spec[1] if marked else spec)
            claimed = (
                range(STATUS_BUCKETS) if spec == "flat" or marked else present
            )
            for b in claimed:
                if buckets is None or b in buckets:
                    if spec == "flat":
                        best[b] = vd
                    elif b in present:
                        best[b] = os.path.join(vd, f"__b={b}")
                    else:
                        best[b] = None  # empty claim: shadows, reads nothing
        expect = sorted({p for p in best.values() if p is not None})

        got = _status_bucket_dirs(work, before=before, buckets=buckets)
        assert sorted(got) == expect
        assert len(got) == len(set(got)), "duplicate read paths"

    run()


def test_retention_compact_crash_points_never_lose_the_table(spark, tmp_path):
    """Every crash point of the compaction swap leaves a readable table:
    (A) crash between the two renames -> live dir missing, aside copy
    present, read_channel_data recovers it; (B) crash after the swap but
    before aside cleanup -> live wins, the next compact drops the aside."""
    import datetime as dt

    from daq_3i_spark.streaming.pipeline import retention_compact

    work = str(tmp_path / "swap")
    mk = lambda vid: spark.createDataFrame(  # noqa: E731
        [(vid, 1, dt.datetime(2024, 1, 1, 0, 0, vid), float(vid))],
        "id long, channel_id int, ts timestamp, value double",
    )
    persist_batch(spark, work, mk(1), 0)
    persist_batch(spark, work, mk(2), 1)
    cd = os.path.join(work, "channel_data")
    aside = os.path.join(work, "channel_data_old")
    n0 = read_channel_data(spark, work).count()
    assert n0 == 2

    # (A) simulate a crash between rename(live, aside) and rename(tmp, live)
    os.rename(cd, aside)
    assert read_channel_data(spark, work).count() == n0  # recovered
    assert os.path.isdir(cd) and not os.path.exists(aside)

    # (B) simulate a crash after the swap, before the aside cleanup
    shutil.copytree(cd, aside)
    assert read_channel_data(spark, work).count() == n0  # live wins
    retention_compact(spark, work)
    assert not os.path.exists(aside)  # next compact clears the leftover
    assert read_channel_data(spark, work).count() == n0


def test_due_fn_multichunk_scrambled():
    """_due_fn must process a group's rows in global (ts, id) order even when
    the Arrow chunk iterator delivers them scrambled across many chunks
    (ADVICE r1: per-chunk sorting silently deviated beyond one chunk)."""
    import datetime as dt

    import pandas as pd

    from daq_3i_spark.streaming.stateful import _due_fn

    class _FakeState:
        exists = False

        def update(self, v):
            self.saved = v

    def mk(ts_s, rid):
        return pd.DataFrame(
            {
                "channel_id": [1],
                "id": [rid],
                "ts": [pd.Timestamp(dt.datetime(2024, 1, 1, 0, 0, ts_s))],
                "value": [float(rid)],
                "timing": [10],
            }
        )

    # sorted order: (0s,1) emit, (5s,2) gap 5<=10 skip, (11s,3) gap 11>10 emit,
    # (20s,4) gap 9 skip, (22s,5) gap 11 emit
    chunks = [mk(11, 3), mk(0, 1), mk(22, 5), mk(5, 2), mk(20, 4)]
    st = _FakeState()
    out = pd.concat(list(_due_fn((1,), iter(chunks), st)), ignore_index=True)
    assert sorted(out["id"].tolist()) == [1, 3, 5], out
    assert st.saved == (int(pd.Timestamp("2024-01-01 00:00:22").timestamp() * 1_000_000),)


def test_stateful_crash_restart_recovers_state(spark, feed_dir, state_provider, tmp_path):
    """Keyed-state RECOVERY (not just size) is provider-portable (VERDICT
    r13 #4): a stateful query (applyInPandasWithState latest-per-channel)
    crashes inside batch 1 AFTER batch 0 committed its state snapshot; the
    restart must resume from the recovered state under BOTH providers.
    Detection: update-mode emissions are per-key monotone in (ts, id)
    across batches when state survives — a restart that lost state re-emits
    keys at whatever their post-crash batches happen to contain, which
    regresses below the batch-0 emission for any key whose newest sample
    lives in file 0 (the repartitioned feed guarantees many such keys)."""
    import pyspark.errors

    work = str(tmp_path / f"stateful_restart_{state_provider}")
    os.makedirs(work)
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "emissions")

    crashed = {"done": False}

    def sink(crash: bool):
        def run(b, bid):
            b.write.mode("overwrite").parquet(os.path.join(out, f"batch_{bid}"))
            if crash and bid == 1 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("injected crash in batch 1")
        return run

    def start(crash: bool):
        return (
            latest_per_key_stream(_sample_stream(spark, feed_dir))
            .writeStream.foreachBatch(sink(crash))
            .outputMode("update")  # must match the stateful op's mode
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crash=True)
    with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException):
        q.awaitTermination()
    assert crashed["done"], "the injected crash must have fired"

    q2 = start(crash=False)
    q2.awaitTermination()

    emitted = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(out)
        .withColumn("__f", F.input_file_name())
        .withColumn(
            "__batch",
            F.regexp_extract("__f", r"batch_(\d+)", 1).cast("int"),
        )
    )
    rows = emitted.select("__batch", "channel_id", "ts", "id", "value").collect()

    # per-key monotone emissions across batches <=> state recovered
    seen: dict[int, tuple] = {}
    for r in sorted(rows, key=lambda r: (r["__batch"], r["ts"], r["id"])):
        cur = (r["ts"], r["id"])
        if r["channel_id"] in seen:
            assert cur >= seen[r["channel_id"]], (
                f"state lost at restart ({state_provider}): channel "
                f"{r['channel_id']} regressed {seen[r['channel_id']]} -> {cur} "
                f"in batch {r['__batch']}"
            )
        seen[r["channel_id"]] = cur

    # and the final state equals the batch-computed latest per key
    final = latest_per_key(
        emitted.select("channel_id", "id", "ts", "value"),
        "channel_id",
        [F.desc("ts"), F.desc("id")],
    )
    batch = latest_per_key(
        spark.read.parquet(feed_dir), "channel_id", [F.desc("ts"), F.desc("id")]
    ).select("channel_id", "id", "ts", "value")
    assert sorted(final.collect()) == sorted(batch.collect())


def test_pipeline_crash_restart_exactly_once(spark, sf_dir, feed_dir):
    """End-to-end exactly-once: the sink crashes AFTER batch 0's parquet
    append but BEFORE the checkpoint commit; the restarted query replays
    batch 0 into the same batch-id directory and the final sink equals the
    batch-computed expectation exactly — no duplicated, no lost rows."""
    import pyspark.errors

    work = os.path.join(TMP, "test_crash_restart")
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)
    ckpt = os.path.join(work, "ckpt")

    crashed = {"done": False}

    def crashing_sink(b, bid):
        persist_batch(spark, work, b, bid)  # data IS written
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before checkpoint commit")

    q = (
        enrich_and_convert(_sample_stream(spark, feed_dir), spark)
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException):
        q.awaitTermination()
    assert crashed["done"], "the injected crash must have fired"

    # restart from the same checkpoint: batch 0 replays (its offsets were
    # never committed) and must overwrite, not append
    q2 = (
        enrich_and_convert(_sample_stream(spark, feed_dir), spark)
        .writeStream.foreachBatch(
            lambda b, bid: persist_batch(spark, work, b, bid)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    expected = enrich_and_convert(
        spark.read.parquet(feed_dir).selectExpr("id", "channel_id", "ts", "value"),
        spark,
    )
    got = read_channel_data(spark, work)
    assert got.count() == expected.count(), "crash+restart lost or duplicated rows"
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )
    shutil.rmtree(work, ignore_errors=True)


def test_stale_monitor_flags_stopped_channels(spark, sf_dir, feed_dir):
    """Channels that stop producing must be flagged with status=-1 once the
    WATERMARK passes last_ts + threshold (event-time timeout — deterministic
    under replay, unlike wall-clock timeouts).  Every emitted marker must
    satisfy the staleness predicate, and channels whose data ends well
    before the global max event time must be flagged."""
    from daq_3i_spark.schemas import CHANNEL_DATA
    from daq_3i_spark.streaming.stateful import STALE_STATUS, stale_monitor_stream

    stale_after = 3600  # 1 hour of event time
    stream = (
        spark.readStream.schema(CHANNEL_DATA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .select("channel_id", "ts", "value")
    )
    q = (
        stale_monitor_stream(stream, stale_after_s=stale_after)
        .writeStream.format("memory")
        .queryName("stale_monitor")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["channel_id"]: r for r in spark.table("stale_monitor").collect()}

    feed = spark.read.parquet(feed_dir)
    last_per_chl = {
        r["channel_id"]: r["mx"]
        for r in feed.groupBy("channel_id").agg(F.max("ts").alias("mx")).collect()
    }
    global_max = max(last_per_chl.values())

    for cid, r in got.items():
        assert r["status"] == STALE_STATUS
        # the marker is point-in-time: the channel WAS stale when the
        # watermark passed last_ts + threshold (it may resume later, like
        # batch-gapped feeds do) — so its last_ts is stale relative to the
        # final watermark and never exceeds the channel's true max
        assert (global_max - r["last_ts"]).total_seconds() >= stale_after, (
            cid,
            r["last_ts"],
            global_max,
        )
        assert r["last_ts"] <= last_per_chl[cid]
    # channels stale by MORE than one batch margin must have fired
    must_flag = {
        cid
        for cid, mx in last_per_chl.items()
        if (global_max - mx).total_seconds() >= 2 * stale_after
    }
    assert must_flag <= set(got), f"missed stale channels: {must_flag - set(got)}"


def test_rollup_incremental_prunes_recompute(spark, sf_dir):
    """The refresh must only recompute the buckets the delta touches: the
    stored aggregate's untouched rows survive the anti-join unmodified, and
    touched buckets (including the one the split instant straddles) are a
    small fraction of the table."""
    from pyspark.sql import functions as F

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.plans.streaming_ops import _ROLLUP_SPLIT
    from daq_3i_spark.sources.daq_dims import channel_data_df

    cd = channel_data_df(spark, sf_dir)
    split = F.lit(_ROLLUP_SPLIT).cast("timestamp")
    touched = (
        cd.filter(F.col("ts") >= split)
        .select("channel_id", F.date_trunc("hour", "ts").alias("b"))
        .distinct()
        .count()
    )
    total = (
        cd.select("channel_id", F.date_trunc("hour", "ts").alias("b"))
        .distinct()
        .count()
    )
    assert 0 < touched < total / 2, "delta must touch a strict minority"
    out = QUERIES["op_rollup_incremental"].spark(spark, sf_dir).count()
    assert out == total


def test_stream_rollup_refresh_is_multibatch(spark, sf_dir):
    """The merge must be exercised across real micro-batches: the feed
    replays as 4 files with maxFilesPerTrigger=1, so >= 2 rollup snapshot
    versions exist after the drain and the last one is the op's output."""
    import os

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.plans.streaming_ops import _TMP_ROOT

    out = QUERIES["op_stream_rollup_refresh"].spark(spark, sf_dir)
    n = out.count()
    # the op's workdir is per-PROCESS (streaming_ops._workdir appends
    # -w{pid} so concurrent sharded workers don't rmtree each other); the
    # op above ran in THIS process, so the same suffix finds its output
    roll_root = os.path.join(
        _TMP_ROOT, f"op_stream_rollup_refresh-w{os.getpid()}", "rollup"
    )
    versions = [d for d in os.listdir(roll_root) if d.startswith("v=")]
    assert len(versions) >= 2, "drain must produce several merged snapshots"
    assert n > 0


def test_time_retention_partition_drop_semantics(spark, sf_dir, tmp_path):
    """apply_time_retention must (a) remove expired partitions at the
    directory level, (b) rewrite ONLY the straddled partition, and (c) leave
    every surviving partition's files byte-for-byte untouched (same names,
    sizes, mtimes) — the proof that at scale retention is a metadata drop
    plus a one-day rewrite, never a table scan."""
    from daq_3i_spark.sources.daq_dims import channel_data_df
    from daq_3i_spark.sources.sink import (
        apply_time_retention,
        write_channel_data_partitioned,
    )
    from daq_3i_spark.plans.streaming_ops import _RETENTION_CUTOFF

    path = str(tmp_path / "cd_part")
    write_channel_data_partitioned(channel_data_df(spark, sf_dir), path)
    cutoff_date = _RETENTION_CUTOFF.split(" ")[0]

    def inventory():
        inv = {}
        for d in os.listdir(path):
            if d.startswith("p_date="):
                pdir = os.path.join(path, d)
                inv[d.split("=", 1)[1]] = {
                    f: (st.st_size, st.st_mtime_ns)
                    for f in os.listdir(pdir)
                    for st in [os.stat(os.path.join(pdir, f))]
                }
        return inv

    before = inventory()
    assert any(p < cutoff_date for p in before), "fixture must have expired days"
    assert cutoff_date in before, "fixture must straddle the cutoff"
    assert any(p > cutoff_date for p in before), "fixture must have kept days"

    apply_time_retention(spark, path, _RETENTION_CUTOFF)
    after = inventory()

    assert not any(p < cutoff_date for p in after), "expired partitions remain"
    assert after[cutoff_date] != before[cutoff_date], "boundary not rewritten"
    for p in before:
        if p > cutoff_date:
            assert after[p] == before[p], f"kept partition {p} was rewritten"

    survivors = spark.read.parquet(path)
    expect = channel_data_df(spark, sf_dir).filter(
        F.col("ts") >= F.lit(_RETENTION_CUTOFF).cast("timestamp")
    )
    assert survivors.count() == expect.count()
    assert survivors.filter(
        F.col("ts") < F.lit(_RETENTION_CUTOFF).cast("timestamp")
    ).count() == 0


def test_compaction_threshold_semantics(spark, sf_dir, tmp_path):
    """compact_partitions must rewrite ONLY partitions above the file-count
    threshold (fragmented ones become a single sorted file) and leave
    compact partitions byte-for-byte untouched — the idempotence that makes
    it a safe background service."""
    from daq_3i_spark.sources.daq_dims import channel_data_df
    from daq_3i_spark.sources.sink import compact_partitions

    path = str(tmp_path / "sink")
    cd = channel_data_df(spark, sf_dir).withColumn("p_date", F.to_date("ts"))
    split = F.lit("2024-01-16").cast("date")
    (
        cd.filter(F.col("p_date") < split)
        .repartition(F.col("p_date"))
        .write.partitionBy("p_date")
        .parquet(path)
    )
    for k in range(6):
        (
            cd.filter((F.col("p_date") >= split) & (F.col("id") % 6 == k))
            .repartition(F.col("p_date"))
            .write.mode("append")
            .partitionBy("p_date")
            .parquet(path)
        )

    def inventory():
        inv = {}
        for d in os.listdir(path):
            if d.startswith("p_date="):
                pdir = os.path.join(path, d)
                inv[d.split("=", 1)[1]] = {
                    f: (st.st_size, st.st_mtime_ns)
                    for f in os.listdir(pdir)
                    if f.endswith(".parquet")
                    for st in [os.stat(os.path.join(pdir, f))]
                }
        return inv

    before = inventory()
    n_before = spark.read.parquet(path).count()
    done = compact_partitions(spark, path, max_files=4)
    after = inventory()

    frag = {p for p, files in before.items() if len(files) > 4}
    assert set(done) == frag and frag, "exactly the fragmented partitions compact"
    for p in before:
        if p in frag:
            assert len(after[p]) == 1, f"{p} not compacted to one file"
        else:
            assert after[p] == before[p], f"compact partition {p} was rewritten"
    # content-neutral
    assert spark.read.parquet(path).count() == n_before


def test_snapshot_refresh_replay_convergence(spark, sf_dir):
    """The versioned-snapshot commit step must be idempotent under the
    streaming engine's crash-replay contract: a batch_id re-delivered after
    a crash-before-checkpoint-commit rewrites ITS version from the same
    predecessor, so any replay interleaving converges to the straight run."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from daq_3i_spark.plans.streaming_ops import (
        _TMP_ROOT,
        make_snapshot_refresh,
        snapshot_versions,
    )
    from daq_3i_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")
    batches = [ev.filter(F.pmod(F.xxhash64("value"), F.lit(3)) == k) for k in range(3)]

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.min("value").alias("mn")
        )

    def merge(stored, part):
        return (
            stored.unionByName(part)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"), F.min("mn").alias("mn"))
        )

    def run(sequence, name):
        root = os.path.join(_TMP_ROOT, name)
        if os.path.isdir(root):
            shutil.rmtree(root)
        refresh = make_snapshot_refresh(spark, root, partial, merge)
        for bid in sequence:
            refresh(batches[bid], bid)
        final = sorted(
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(root, f"v={snapshot_versions(root)[-1]}")
            ).collect()
        )
        shutil.rmtree(root)
        return final

    straight = run([0, 1, 2], "snap_replay_a")
    # crash-replay interleavings the engine can produce: re-delivery of the
    # last batch, and re-delivery mid-chain before the successor ran
    assert run([0, 1, 1, 2], "snap_replay_b") == straight
    assert run([0, 0, 1, 2, 2], "snap_replay_c") == straight
    assert run([0, 1, 2, 2], "snap_replay_d") == straight


def test_stream_forecast_monitor_equals_batch(spark, sf_dir):
    """op_stream_forecast_monitor (4 incremental micro-batches merging
    hourly-count partials) must reproduce op_events_forecast_naive's
    from-scratch evaluation exactly — counts are integers and the scoring
    tree is shared, so equality is ==, not approx."""
    from daq_3i_spark.plans import QUERIES

    got = sorted(
        tuple(r)
        for r in QUERIES["op_stream_forecast_monitor"].spark(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in QUERIES["op_events_forecast_naive"].spark(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(request, spark):
    """Run a streaming soak under BOTH state-store providers (VERDICT r12
    #5): the 100 TB claim for keyed state assumes state spills beyond
    executor heap, which is the RocksDB provider's job — a soak green under
    both proves the state ops are provider-portable, not
    HDFSBackedStateStore-shaped.  The conf is read at query START, so
    set/restore around each test is enough; checkpoints are rebuilt per
    test (work dirs are rmtree'd at entry), so no provider mixing within a
    checkpoint lineage."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    if request.param == "rocksdb":
        spark.conf.set(key, _ROCKSDB_PROVIDER)
    yield request.param
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_snapshot_protocol_20_batch_soak_state_bounded(spark, sf_dir, state_provider):
    """Long-run soak for the versioned-snapshot protocol (VERDICT r11 #7):
    every op_stream_* op replays exactly 4 micro-batches, which cannot
    answer 'does state leak over a day'.  Drive ~20 REAL micro-batches of
    the hourly-rollup maintenance through a checkpointed stream with
    keep_versions=3 and pin, at EVERY batch: (a) the snapshot row count
    stays bounded by the final bar cardinality (mergeable partials — state
    is bar-sized, never row-sized or batch-count-sized), and (b) the
    snapshot root never holds more than max(2, keep_versions) version
    directories (retention pruning keeps pace with the stream).  The final
    snapshot must equal the from-scratch recompute exactly — 20 rounds of
    merge lose nothing."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from daq_3i_spark.functions.numeric import fx_unscaled
    from daq_3i_spark.plans.streaming_ops import (
        _TMP_ROOT,
        make_snapshot_refresh,
        pinned_shuffle,
        snapshot_versions,
    )
    from daq_3i_spark.sources.daq_dims import channel_data_df

    work = os.path.join(_TMP_ROOT, "soak20")
    if os.path.isdir(work):
        shutil.rmtree(work)
    feed = os.path.join(work, "feed")
    channel_data_df(spark, sf_dir).repartition(20).write.parquet(feed)
    root = os.path.join(work, "rollup")

    def partial(df):
        return df.groupBy(
            "channel_id",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_us"),
        ).agg(
            F.count("*").alias("n_samples"),
            F.sum(fx_unscaled(F.col("value"))).alias("sum_fx"),
        )

    def merge(stored, part):
        return (
            stored.unionByName(part)
            .groupBy("channel_id", "bucket_us")
            .agg(
                F.sum("n_samples").alias("n_samples"),
                F.sum("sum_fx").alias("sum_fx"),
            )
        )

    keep = 3
    refresh = make_snapshot_refresh(spark, root, partial, merge, keep_versions=keep)
    trace = []  # (batch_id, n_versions, snapshot_rows) after each commit

    def observed(batch, batch_id):
        refresh(batch, batch_id)
        vs = snapshot_versions(root)
        rows = spark.read.parquet(os.path.join(root, f"v={vs[-1]}")).count()
        trace.append((batch_id, len(vs), rows))

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    with pinned_shuffle(spark, 8):
        q = (
            stream.writeStream.foreachBatch(observed)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    bars = (
        spark.read.parquet(feed)
        .select("channel_id", F.date_trunc("hour", "ts").alias("b"))
        .distinct()
        .count()
    )
    assert len(trace) >= 20, f"soak ran only {len(trace)} batches"
    for batch_id, n_versions, rows in trace:
        assert n_versions <= max(2, keep), (
            f"batch {batch_id}: {n_versions} snapshot versions — pruning leaks"
        )
        assert rows <= bars, (
            f"batch {batch_id}: snapshot holds {rows} rows > {bars} bars — "
            "state grows with batch count, not bar cardinality"
        )
    assert trace[-1][2] == bars  # every bar present at the end

    # 20 rounds of incremental merge == the from-scratch recompute, exactly
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(root, f"v={snapshot_versions(root)[-1]}")
        ).collect()
    )
    want = sorted(tuple(r) for r in partial(spark.read.parquet(feed)).collect())
    assert got == want
    shutil.rmtree(work)


def test_snapshot_refresh_replay_with_pruning(spark, sf_dir):
    """keep_versions pruning must not break crash-replay convergence: the
    engine can re-deliver the LAST batch_id after a crash, and pruning
    keeps a floor of 2 versions precisely so the replayed batch still
    finds its predecessor.  Run the replay interleavings of
    test_snapshot_refresh_replay_convergence WITH aggressive pruning
    (keep_versions=2) and pin (a) the final state equals the prune-less
    straight run and (b) the root holds <= 2 version dirs at the end."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from daq_3i_spark.plans.streaming_ops import (
        _TMP_ROOT,
        make_snapshot_refresh,
        snapshot_versions,
    )
    from daq_3i_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")
    batches = [ev.filter(F.pmod(F.xxhash64("value"), F.lit(3)) == k) for k in range(3)]

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.min("value").alias("mn")
        )

    def merge(stored, part):
        return (
            stored.unionByName(part)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"), F.min("mn").alias("mn"))
        )

    def run(sequence, name, keep):
        root = os.path.join(_TMP_ROOT, name)
        if os.path.isdir(root):
            shutil.rmtree(root)
        refresh = make_snapshot_refresh(
            spark, root, partial, merge, keep_versions=keep
        )
        for bid in sequence:
            refresh(batches[bid], bid)
        vs = snapshot_versions(root)
        final = sorted(
            tuple(r)
            for r in spark.read.parquet(os.path.join(root, f"v={vs[-1]}")).collect()
        )
        shutil.rmtree(root)
        return final, len(vs)

    straight, _ = run([0, 1, 2], "snap_prune_a", None)
    for seq, name in (
        ([0, 1, 1, 2], "snap_prune_b"),
        ([0, 1, 2, 2], "snap_prune_c"),  # replay AFTER pruning already ran
        ([0, 0, 1, 2], "snap_prune_d"),
    ):
        got, n_vs = run(seq, name, 2)
        assert got == straight, f"{name}: pruning broke replay convergence"
        assert n_vs <= 2, f"{name}: {n_vs} versions retained"


def test_stateful_latest_20_batch_soak_state_is_channel_bounded(
    spark, sf_dir, state_provider
):
    """State-size soak for the applyInPandasWithState family (the module
    docstring's claim: state per key is O(1), store size = #channels).
    Drive ~20 micro-batches of the latest-per-channel operator and read the
    state-store row count from every progress event: it must never exceed
    the distinct channel count — growth with batch count or row count means
    the operator is accumulating history instead of the single
    (id, ts, value) slot.  Final emitted latest must equal the batch
    latest-per-key oracle."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from daq_3i_spark.plans.streaming_ops import _TMP_ROOT, pinned_shuffle
    from daq_3i_spark.sources.daq_dims import channel_data_df
    from daq_3i_spark.streaming.stateful import latest_per_key_stream

    work = os.path.join(_TMP_ROOT, "stateful_soak20")
    if os.path.isdir(work):
        shutil.rmtree(work)
    feed = os.path.join(work, "feed")
    cd = channel_data_df(spark, sf_dir).select("channel_id", "id", "ts", "value")
    cd.repartition(20).write.parquet(feed)
    n_channels = cd.select("channel_id").distinct().count()

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    out = os.path.join(work, "out")

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with pinned_shuffle(spark, 8):
        q = (
            latest_per_key_stream(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = q.recentProgress

    batches = [p for p in progresses if p["numInputRows"] > 0 or p["stateOperators"]]
    assert len(batches) >= 20, f"soak ran only {len(batches)} progress events"
    for p in batches:
        for sop in p["stateOperators"]:
            rows = sop["numRowsTotal"]
            assert rows <= n_channels, (
                f"batch {p['batchId']}: state holds {rows} rows > "
                f"{n_channels} channels — per-key state is not O(1)"
            )

    # last emitted row per channel == the batch latest-per-key oracle
    emitted = spark.read.parquet(out)
    w_latest = emitted.groupBy("channel_id").agg(
        F.max(F.struct("ts", "id", "value")).alias("s")
    )
    got = sorted(
        (r["channel_id"], r["s"]["ts"], r["s"]["id"], r["s"]["value"])
        for r in w_latest.collect()
    )
    want = sorted(
        (r["channel_id"], r["s"]["ts"], r["s"]["id"], r["s"]["value"])
        for r in cd.groupBy("channel_id")
        .agg(F.max(F.struct("ts", "id", "value")).alias("s"))
        .collect()
    )
    assert got == want
    shutil.rmtree(work)


def test_watermark_window_agg_20_batch_soak_state_evicts(
    spark, sf_dir, state_provider
):
    """Watermark-eviction soak — the third streaming-state family (versioned
    snapshots and applyInPandasWithState have their own 20-batch soaks):
    replay events as ~20 TIME-ORDERED micro-batches through the tumbling
    1-minute windowed aggregation (10-minute watermark) and pin, from the
    state-store metrics, that (a) live state stays within the horizon bound
    — windows inside (watermark horizon + one batch's time span + slack),
    never the whole history — and (b) eviction actually happens: the final
    state holds a small fraction of all windows ever aggregated.  Append
    output over 20 batches must emit every finalized window exactly once
    (equal to the batch recompute minus the still-open tail)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from daq_3i_spark.plans.streaming_ops import _TMP_ROOT, pinned_shuffle
    from daq_3i_spark.sources.tables import load_events
    from daq_3i_spark.streaming.windows import windowed_aggs

    work = os.path.join(_TMP_ROOT, "wm_soak20")
    if os.path.isdir(work):
        shutil.rmtree(work)
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    ev = load_events(spark, sf_dir).select("ts", "event_type", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_s = (hi - lo).total_seconds()
    n_slices = 20
    slice_s = span_s / n_slices

    ev_c = ev.persist()
    ev_c.count()
    bounds = [lo + __import__("datetime").timedelta(seconds=slice_s * k)
              for k in range(n_slices + 1)]
    for k in range(n_slices):
        cond = F.col("ts") >= F.lit(bounds[k])
        cond &= (F.col("ts") < F.lit(bounds[k + 1])) if k < n_slices - 1 else F.lit(True)
        tmp = os.path.join(work, f"tmp{k}")
        ev_c.filter(cond).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(feed, f"slice_{k}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    ev_c.unpersist()

    n_types = ev.select("event_type").distinct().count()
    # occupancy-based bound (events are SPARSE in 1-minute windows at this
    # span): live state is at most one batch's occupied (window, type)
    # pairs — they stay until the NEXT batch's watermark passes them — plus
    # the <= 10-minute horizon tail from the previous batch and boundary
    # slack.  A linear-growth bug (no eviction) would accumulate ALL
    # occupied pairs instead.
    lo_us = int(lo.timestamp() * 1_000_000)
    slice_us = int(slice_s * 1_000_000) or 1
    occupied = (
        ev.select(
            F.window("ts", "1 minute").alias("w"),
            "event_type",
            F.floor((F.unix_micros("ts") - F.lit(lo_us)) / F.lit(slice_us))
            .alias("slice"),
        )
        .distinct()
        .groupBy("slice")
        .count()
    )
    max_per_slice = occupied.agg(F.max("count")).first()[0]
    bound = max_per_slice + (11 + 3) * n_types  # horizon tail + slack
    total_windows = (
        ev.select(F.window("ts", "1 minute"), "event_type").distinct().count()
    )
    assert bound < total_windows / 3, (
        "fixture degenerate: horizon bound does not separate from history "
        f"(bound={bound}, total={total_windows})"
    )

    out = os.path.join(work, "out")

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    with pinned_shuffle(spark, 8):
        q = (
            windowed_aggs(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = q.recentProgress

    with_state = [p for p in progresses if p["stateOperators"]]
    assert len(with_state) >= n_slices, f"only {len(with_state)} progress events"
    max_state = 0
    for p in with_state:
        for sop in p["stateOperators"]:
            max_state = max(max_state, sop["numRowsTotal"])
            assert sop["numRowsTotal"] <= bound, (
                f"batch {p['batchId']}: {sop['numRowsTotal']} state rows > "
                f"horizon bound {bound} — watermark is not evicting"
            )
    final_state = max(
        sop["numRowsTotal"] for sop in with_state[-1]["stateOperators"]
    )
    assert final_state < total_windows / 3, "no eviction over the run"

    # append emitted exactly the finalized windows: the batch recompute
    # minus windows still open past the final watermark
    emitted = spark.read.parquet(out)
    assert emitted.count() == emitted.distinct().count()  # exactly once
    assert emitted.count() >= total_windows - bound
    shutil.rmtree(work)


def test_feed_key_fingerprints_corpus_not_basename(tmp_path):
    """Two corpora sharing a basename must never share a feed-cache key, and
    regenerating a table in place must re-key (ADVICE r12: the cached feed
    IS the op input, so a stale hit is an oracle-invisible wrong result)."""
    import os
    import shutil

    from daq_3i_spark.plans.streaming_ops import _sf_feed_key

    a = tmp_path / "one" / "sf"
    b = tmp_path / "two" / "sf"
    for d in (a, b):
        d.mkdir(parents=True)
    shutil.copyfile("/root/testdata/sf0.001/region.parquet", a / "events.parquet")
    shutil.copyfile("/root/testdata/sf0.001/nation.parquet", b / "events.parquet")
    assert os.path.basename(a) == os.path.basename(b)
    k_a, k_b = _sf_feed_key("x", str(a)), _sf_feed_key("x", str(b))
    assert k_a != k_b

    # regenerate-in-place (new mtime) => new key
    os.utime(a / "events.parquet", ns=(1, 1))
    assert _sf_feed_key("x", str(a)) != k_a
    # stable across calls when nothing changed
    assert _sf_feed_key("x", str(b)) == k_b


def test_feed_key_fingerprints_directory_table_parts(tmp_path):
    """A directory-shaped table fingerprints its contained part files: an
    in-place overwrite of one part (which leaves the directory's own stat
    unchanged on most filesystems) must re-key (ADVICE r13)."""
    import os
    import shutil

    from daq_3i_spark.plans.streaming_ops import _sf_feed_key

    sf = tmp_path / "sf"
    tbl = sf / "events.parquet"  # directory-shaped table
    tbl.mkdir(parents=True)
    shutil.copyfile(
        "/root/testdata/sf0.001/region.parquet", tbl / "part-000.parquet"
    )
    shutil.copyfile(
        "/root/testdata/sf0.001/nation.parquet", tbl / "part-001.parquet"
    )
    dir_stat = os.stat(tbl)
    k0 = _sf_feed_key("x", str(sf))
    assert _sf_feed_key("x", str(sf)) == k0  # stable when nothing changed

    # overwrite one part in place; pin the directory stat unchanged so the
    # test proves the key change comes from the PART fingerprint
    os.utime(tbl / "part-001.parquet", ns=(7, 7))
    os.utime(tbl, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    assert os.stat(tbl).st_mtime_ns == dir_stat.st_mtime_ns
    assert _sf_feed_key("x", str(sf)) != k0


def test_purge_dead_worker_caches(monkeypatch, tmp_path):
    """Cache dirs of exited workers are removed — INCLUDING an own-pid dir,
    which at purge time (module import) can only belong to a dead
    predecessor whose pid this process recycled (the module creates
    -w{pid} dirs only after import; ADVICE r13).  Unsuffixed entries are
    never touched."""
    import os

    import daq_3i_spark.plans.streaming_ops as so

    monkeypatch.setattr(so, "_TMP_ROOT", str(tmp_path))
    dead = tmp_path / "feedcache-w999999999"  # pid_max is < 999999999
    recycled = tmp_path / f"feedcache-w{os.getpid()}"  # dead predecessor's
    plain = tmp_path / "sf1"  # no -w{pid} suffix: never touched
    for d in (dead, recycled, plain):
        d.mkdir()
    so._purge_dead_worker_caches()
    assert not dead.exists()
    assert not recycled.exists()
    assert plain.exists()

def test_read_status_empty_table_never_flips_to_none(spark, tmp_path):
    """Direct-API corner of the _FULL_SNAPSHOT migration (r16): a ZERO-ROW
    upsert over a flat CREATE-TABLE init writes a marker version with no
    bucket dirs (partitionBy on a zero-row frame writes nothing readable);
    once GC collects the flat v=0, every claim is an empty claim.  The
    table still EXISTS — read_status must return the empty typed frame,
    not None (the CREATE-TABLE contract).  Unreachable via persist_batch
    (the heartbeat row is unconditional); pinned for direct API use."""
    from daq_3i_spark import schemas
    from daq_3i_spark.streaming.pipeline import (
        _status_versions,
        read_status,
        upsert_status,
    )

    work = str(tmp_path / "zero_row_upserts")
    spark.createDataFrame([], schemas.DAQ_STATUS).write.mode("overwrite").parquet(
        os.path.join(work, "daq_status", "v=0")
    )
    empty = spark.createDataFrame([], schemas.DAQ_STATUS)
    for i in range(1, 4):  # push flat v=0 past the keep-2 tail
        upsert_status(spark, work, empty, i)
    assert 0 not in _status_versions(work), "flat v=0 should be collected"
    got = read_status(spark, work)
    assert got is not None, "existing-but-empty table read as None"
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["parameter", "status", "ts"]


def test_stream_dedup_ingest_kernel_is_spread(spark, sf_dir):
    """The per-batch MinHash kernel must fan out before it runs (r18): the
    one-file-per-trigger replay delivers each micro-batch as a single
    partition, and an unspread kernel hashes the whole batch on one core.
    The spread is observable in the band index: each batch's append writes
    one file per non-empty kernel partition, so the drained index holds
    MORE files than the 4 micro-batches (the unspread shape wrote exactly
    one file per batch)."""
    import os

    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.plans.streaming_ops import _TMP_ROOT

    n = QUERIES["op_stream_dedup_ingest"].spark(spark, sf_dir).count()
    assert n > 0
    index_dir = os.path.join(
        _TMP_ROOT, f"op_stream_dedup_ingest-w{os.getpid()}", "band_index"
    )
    files = [f for f in os.listdir(index_dir) if f.endswith(".parquet")]
    assert len(files) > 4, (
        f"band index holds {len(files)} files for 4 micro-batches — the "
        "kernel ran unspread (single partition per batch)"
    )
