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
from daq_3i_spark.sources.tables import load_table

_TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
)


def _workdir(name: str) -> str:
    d = os.path.join(_TMP_ROOT, name)
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
