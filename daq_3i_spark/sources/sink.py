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


def _staging_dir(path: str) -> str:
    """Per-table staging area for partition rewrites, OUTSIDE the table root:
    a crash mid-rewrite must never leave a half-written directory where
    partition discovery can see it (a stray 'p_date=...rewrite' dir inside
    the root would double-count rows or degrade p_date to a string column).
    Stale staging from a previous crashed run is removed on entry — the
    rewrite sources are only deleted AFTER their replacement is complete, so
    re-running the service converges."""
    import os
    import shutil

    staging = path.rstrip("/") + ".staging"
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)
    return staging


def apply_time_retention(spark: SparkSession, path: str, cutoff: str) -> None:
    """DELETE WHERE ts < cutoff over the date-partitioned sink, with
    partition-drop semantics: partitions wholly before the cutoff's DATE are
    removed at the directory level (no rows read), the single partition a
    mid-day cutoff straddles is rewritten with a row filter, and every later
    partition's files are left byte-for-byte untouched.  At 100 TB the drop
    is a metastore/manifest operation per expired day; only ~one day of data
    is ever rewritten regardless of table size.  Rewrites stage outside the
    table root (see _staging_dir); the one non-atomic window left is the
    rmtree+move swap itself, which a transactional table format (Delta/
    Iceberg manifest swap) closes in production."""
    import os
    import shutil

    staging = _staging_dir(path)
    cutoff_date = cutoff.split(" ")[0]
    for d in os.listdir(path):
        if d.startswith("p_date=") and d.split("=", 1)[1] < cutoff_date:
            shutil.rmtree(os.path.join(path, d))

    bdir = os.path.join(path, f"p_date={cutoff_date}")
    if os.path.isdir(bdir):
        # rewrite ONLY the straddled partition: filter into a fresh
        # directory, then swap — later partitions are never opened
        tmp = os.path.join(staging, "boundary")
        (
            spark.read.parquet(bdir)
            .filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            .write.parquet(tmp)
        )
        shutil.rmtree(bdir)
        shutil.move(tmp, bdir)
    shutil.rmtree(staging, ignore_errors=True)


def compact_partitions(spark: SparkSession, path: str, max_files: int = 4) -> list[str]:
    """Small-file compaction over the date-partitioned sink (the OPTIMIZE
    analog): every partition holding more than ``max_files`` parquet files
    is rewritten as ONE file sorted by (channel_id, id); partitions at or
    under the threshold are left byte-for-byte untouched.  Returns the list
    of compacted partition values.

    Streaming appends fragment the sink (one file per micro-batch per
    partition); scan cost then pays per-file open/footer overhead and loses
    row-group channel locality.  At 100 TB this runs as a background table
    service per recent partition; old partitions compact once and never
    again — which is why the threshold check matters (idempotent, touches
    only fragmented partitions).  Rewrites stage outside the table root
    (see _staging_dir); a crash before a partition's swap leaves its source
    intact and still-fragmented, so the next run redoes exactly that
    partition."""
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    staging = _staging_dir(path)
    todo = []
    for d in sorted(os.listdir(path)):
        if not d.startswith("p_date="):
            continue
        pdir = os.path.join(path, d)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) > max_files:
            todo.append((d, pdir))

    # each rewrite stages into its own directory, so the per-partition jobs
    # are independent — run them as concurrent Spark jobs (a sequential loop
    # pays one job-submission latency per partition)
    def rewrite(item: tuple[str, str]) -> str:
        d, pdir = item
        tmp = os.path.join(staging, d)
        (
            spark.read.parquet(pdir)
            .sort("channel_id", "id")
            .coalesce(1)
            .write.parquet(tmp)
        )
        shutil.rmtree(pdir)
        shutil.move(tmp, pdir)
        return d.split("=", 1)[1]

    with ThreadPoolExecutor(max_workers=8) as pool:
        done = list(pool.map(rewrite, todo))
    shutil.rmtree(staging, ignore_errors=True)
    return done


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
