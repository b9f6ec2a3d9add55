"""Source/sink format coverage — CSV and JSON round-trips.

The reference's only I/O is SQL-over-JDBC (db_model.py:65-67) plus the
Modbus wire protocol; a Spark engine additionally speaks the file formats.
Each op writes a driver table out in the format under test, reads it back
with an EXPLICIT schema (no inference in production paths — SURVEY §1.3),
and returns the re-read rows; the oracle is simply the source table, so the
hash check proves the round-trip is lossless for every column type
(ints, doubles, strings, timestamps).

Scale: both writers shard by the input partitioning (one file per task, no
driver funnel); CSV/JSON are exchange formats here — the hot sink stays
parquet (sources/sink.py), which keeps column stats and pruning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from daq_3i_spark.plans.registry import register
from daq_3i_spark.sources.daq_dims import dims_cte_sql
from daq_3i_spark.sources.tables import load_table

_TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
)


def _workdir(name: str) -> str:
    # per-process suffix: see plans/streaming_ops.py:_workdir (concurrent
    # runners executing the same op must not rmtree each other's staging)
    d = os.path.join(_TMP_ROOT, f"{name}-w{os.getpid()}")
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@register(
    "op_source_csv_roundtrip",
    "SELECT * FROM orders",
    doc="CSV sink+source round-trip of the orders table (header, explicit "
    "schema on re-read, symmetric ISO timestamps, shortest-repr doubles): "
    "the oracle is the source table itself, so the hash check proves "
    "losslessness for long/double/string/timestamp",
)
def op_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders")
    path = os.path.join(_workdir("csv_roundtrip"), "orders_csv")
    # symmetric default timestamp format (ISO-T, millisecond precision —
    # o_orderdate is date-resolution so the round-trip is exact); an
    # asymmetric override risks silent PERMISSIVE-mode nulls on read
    src.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(_ORDERS_SCHEMA).option("header", "true").csv(path)


_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


@register(
    "op_source_json_roundtrip",
    "SELECT * FROM customer",
    doc="JSON-lines sink+source round-trip of the customer table (explicit "
    "schema on re-read — never schema inference in a production path); "
    "oracle = source table, hash-checked lossless",
)
def op_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "customer")
    path = os.path.join(_workdir("json_roundtrip"), "customer_json")
    src.write.mode("overwrite").json(path)
    return spark.read.schema(_CUSTOMER_SCHEMA).json(path)


@register(
    "op_source_orc_roundtrip",
    "SELECT * FROM lineitem",
    doc="ORC sink+source round-trip of the widest table (lineitem, 10 "
    "columns incl. dates-as-timestamps and three doubles): ORC is the "
    "second columnar production format Spark ships natively (predicate "
    "pushdown, column pruning, and zlib/zstd stripes like parquet), and "
    "the oracle is the source table itself — the hash check proves the "
    "engine can land on and read back an ORC lakehouse losslessly with "
    "no schema inference in the path",
)
def op_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "lineitem")
    path = os.path.join(_workdir("orc_roundtrip"), "lineitem_orc")
    src.write.mode("overwrite").orc(path)
    return spark.read.schema(src.schema).orc(path)


@register(
    "op_source_schema_evolution",
    f"""WITH {dims_cte_sql()}
    SELECT id, channel_id, ts, value,
       CASE WHEN id % 2 = 1 THEN CAST(id % 100 AS INT) END AS quality
    FROM channel_data""",
    doc="schema evolution on the sink — the lakehouse reality that a "
    "long-lived table's files span schema versions: half of channel_data "
    "lands with the original 4-column schema, the other half with an "
    "added INT quality column, and ONE mergeSchema read returns the "
    "union schema with nulls where the old files have no column.  The "
    "oracle states the same rows directly, hash-proving the merged read "
    "is exact (no silent column drop, no type widening surprises).  At "
    "100 TB, mergeSchema's footer union is a planning-time cost only — "
    "scans still prune to the requested columns per file",
)
def op_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.plans.streaming_ops import _workdir
    from daq_3i_spark.sources.daq_dims import channel_data_df
    from pyspark.sql import functions as F

    cd = channel_data_df(spark, sf_dir)
    path = os.path.join(_workdir("schema_evolution"), "cd_evolved")
    old = cd.filter(F.pmod(F.col("id"), F.lit(2)) == 0)
    new = cd.filter(F.pmod(F.col("id"), F.lit(2)) == 1).withColumn(
        "quality", F.pmod(F.col("id"), F.lit(100)).cast("int")
    )
    old.write.parquet(os.path.join(path, "gen=1"))
    new.write.parquet(os.path.join(path, "gen=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("id", "channel_id", "ts", "value", "quality")
    )
