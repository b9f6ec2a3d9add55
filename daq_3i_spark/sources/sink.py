"""Partitioned sink layout — how channel_data is laid out at 100 TB.

The reference appends every sample to one unpartitioned MySQL table
(/root/reference/db_model.py:49-54).  At 100 TB the sink must be a
date-partitioned parquet/Delta table so that

* time-range scans prune partitions at file-listing time (no data touched
  outside the range),
* retention (keep newest N per channel) rewrites only recent partitions,
* the per-channel access path stays narrow via row-group sorting on
  channel_id within each date partition (min/max stats prune row groups).

``p_date`` is a derived partition column; the natural key columns stay in the
data so readers are unaffected.  Writing sorted-within-partitions puts each
channel's rows in contiguous row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_channel_data_partitioned(df: DataFrame, path: str) -> None:
    """(id, channel_id, ts, value) -> parquet partitioned by p_date, sorted by
    channel_id within each partition."""
    (
        df.withColumn("p_date", F.to_date("ts"))
        .repartition(F.col("p_date"))
        .sortWithinPartitions("channel_id", "id")
        .write.mode("overwrite")
        .partitionBy("p_date")
        .parquet(path)
    )


def read_channel_data_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_channel_data_jdbc(
    df: DataFrame,
    url: str,
    table: str = "channel_data",
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """The reference's actual sink: a SQL database over JDBC
    (/root/reference/db_model.py:65-67 builds a MySQL URL; one INSERT+COMMIT
    per row, daq-3i.py:274-281).  Here: executor-parallel batched writes,
    and the decimal(25,6) cast (db_model.py:54) happens at THIS boundary —
    inside the engine values stay double (see DIVERGENCES.md).

    No database runs in the test environment, so this is exercised only by
    callers with a live JDBC URL (e.g. ``jdbc:mysql://host/db``); the parquet
    sink (streaming/pipeline.py) is the tested path.
    """
    (
        df.withColumn("value", F.col("value").cast("decimal(25,6)"))
        .write.mode(mode)
        .option("batchsize", str(batchsize))
        .jdbc(url, table)
    )
