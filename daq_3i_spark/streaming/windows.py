"""Watermarked event-time windowing over the sample stream.

The reference has processing-time scheduling only (SURVEY §2.7 summary): no
event-time windows, no late-data story.  These are the Structured Streaming
upgrades the new engine exposes; the batch twins (op_window_agg_events /
op_session_window_batch in plans/extension_ops.py) are the DuckDB-checkable
equivalents.

Scale: windowed aggregation state is bounded by the watermark horizon
(late rows beyond 10 minutes are dropped); state shards by the groupBy key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daq_3i_spark.functions.numeric import fx_sum


def windowed_aggs(events: DataFrame, width: str = "1 minute") -> DataFrame:
    """Tumbling event-time windows per event_type with a 10-minute watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            fx_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_aggs(
    events: DataFrame, width: str = "2 minutes", slide: str = "1 minute"
) -> DataFrame:
    """Sliding event-time windows per event_type — each event is replicated
    into width/slide windows by F.window; state stays bounded by the
    watermark horizon exactly as in the tumbling case."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            fx_sum(F.col("value")).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggs(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows (gap-close) per user — F.session_window is the native
    streaming form of the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
