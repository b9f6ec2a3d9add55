"""Parquet table loaders for the driver-provided tables.

Always ``spark.read.parquet`` (columnar scan, predicate pushdown + column
pruning reach the footer).  At 100 TB these would be partitioned/bucketed
table roots; the API is the same.

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]).  We read nanos as long
(``spark.sql.legacy.parquet.nanosAsLong`` — a runtime-settable SQL conf, so
this works in any session, including the driver's) and truncate to
microseconds with *integer* division — ``DIV 1000``, not ``/1000``: epoch
nanos ≈ 1.7e18 overflows double's 53-bit mantissa, so float division would
perturb the microsecond.  DuckDB truncates TIMESTAMP_NS -> TIMESTAMP (µs) the
same way, so the two engines see identical timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daq_3i_spark.schemas import ALL_TABLES


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + round-robin repartition to the session's parallelism.

    The local test tables are single-row-group parquet files — one split, so
    a scan feeds ONE task and every downstream per-row kernel (hashing,
    unrolled dot products) runs on one core.  The cheap round-robin exchange
    (a few MB) fans the kernel out across all cores.  On a production table
    with many splits the scan parallelizes by itself and callers would use
    plain load_table; use this only in front of compute-heavy projections.
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for spark.sql plans)."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition an already-filtered DataFrame to session
    parallelism — load_spread's post-filter form, so selective predicates
    still push down to the scan before the fan-out exchange."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
