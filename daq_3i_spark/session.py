"""SparkSession factory.

Local test mode is ``local[N]`` (one JVM); the config below is chosen so the
same code is correct on a multi-executor cluster at 100 TB:

- AQE on (runtime coalesce, skew-join splitting) — replaces hand-tuning
  shuffle partition counts per stage.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  is the *initial* number only, AQE coalesces.
- UTC session timezone so timestamps hash identically against the DuckDB
  oracle (DuckDB parquet timestamps are naive/UTC).
- Arrow enabled for the (few) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "daq_3i_spark", cpus: str | int | None = None) -> SparkSession:
    cpus = str(cpus or DEFAULT_CPUS)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce/re-partition around cached frames (the iterative
        # ops persist() their reused edge/state frames; without this the
        # cache pins every downstream shuffle at the static partition count)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
