"""Core DAQ operators as set-based DataFrame transforms.

These replace the reference's row-at-a-time loops with single declarative
statements (the reference's own comment at daq-3i.py:176-178 records that
intent).  All are pure window/agg compositions — one shuffle on the group
key each, partial aggregation map-side, no Python in the plan.

Scale note: each of these shuffles exactly once on ``key``; with the fact
table written partitioned/bucketed by ``channel_id`` the shuffle disappears
entirely (bucketed scan → no exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order: list[Column]) -> DataFrame:
    """Most recent row per key — the batch analog of the reference's
    ``ChannelState`` latest-wins slot (bus.py:32-36; SURVEY §2.4
    op_latest_per_channel).  Deterministic: pass a total order (e.g.
    [F.desc('ts'), F.desc('id')])."""
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def oldest_n_per_key(df: DataFrame, key: str, order_col: str, n: Column | int) -> DataFrame:
    """Bottom-n rows per key (the reference's delete-candidate scan,
    daq-3i.py:209: ORDER BY id ASC LIMIT n per channel)."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    n_col = F.lit(n) if isinstance(n, int) else n
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n_col).drop("__rn")


def retention_keep(df: DataFrame, channels: DataFrame, key: str = "channel_id") -> DataFrame:
    """Retention policy, keep-side formulation (SURVEY §2.5 op_retention_topk):
    keep the newest ``history_len`` rows per channel; one statement, no batch
    cap (the reference's ≤100-deletes-per-cycle cap is an artifact of row-at-
    a-time deletes — daq-3i.py:203-204 — deliberately not replicated).

    ``channels`` needs columns (id, history_len); it is tiny and broadcast.
    """
    w = Window.partitionBy(key).orderBy(F.col("id").desc())
    return (
        df.join(
            F.broadcast(channels.select(F.col("id").alias(key), "history_len")),
            key,
            "inner",
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("history_len"))
        .drop("__rn", "history_len")
    )


def status_snapshot(updates: DataFrame, key: str = "parameter") -> DataFrame:
    """Batch analog of the daq_status upsert (daq_status.py:36-68): latest
    update per parameter wins.  In streaming this is the foreachBatch MERGE;
    as a query it is latest-per-key over the update log."""
    w = Window.partitionBy(key).orderBy(F.col("ts").desc(), F.col("status").desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
