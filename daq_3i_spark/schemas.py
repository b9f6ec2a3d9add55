"""Explicit schemas — no inference in production paths.

Group A mirrors the reference's 5 ORM tables (/root/reference/db_model.py:9-62):
``buses channels conversions channel_data daq_status``.  Group B is the
driver-provided star schema + events/documents/embeddings parquet tables
(FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Group A: reference-shaped DAQ tables (db_model.py) ---------------------

BUSES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("protocol", T.IntegerType(), True),  # 1 = MODBUS-TCP (bus.py:6)
        T.StructField("address", T.StringType(), True),
        T.StructField("port", T.IntegerType(), True),
        T.StructField("timeout", T.IntegerType(), True),
        T.StructField("enabled", T.BooleanType(), True),
    ]
)

CHANNELS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("bus_id", T.IntegerType(), True),  # FK buses.id (db_model.py:13-14)
        T.StructField("device_id", T.IntegerType(), True),
        T.StructField("address", T.IntegerType(), True),
        T.StructField("timing", T.IntegerType(), True),  # poll period seconds (db_model.py:17)
        T.StructField("conversion_id", T.IntegerType(), True),  # FK conversions.id; 0/NULL = none
        T.StructField("func_code", T.IntegerType(), True),  # 3 = read-holding (modbus.py:9)
        T.StructField("format_code", T.IntegerType(), True),  # 0..13 (modbus.py:11-24)
        T.StructField("enabled", T.BooleanType(), True),
        T.StructField("eng_unit", T.StringType(), True),
        T.StructField("history_len", T.IntegerType(), True),  # retention rows (db_model.py:24)
        T.StructField("long_name", T.StringType(), True),
    ]
)

CONVERSIONS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("expr", T.StringType(), True),  # 'Value = f(x)' programs (conversion.py:10-12)
    ]
)

CHANNEL_DATA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("channel_id", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),  # sink casts to decimal(25,6) (db_model.py:54)
    ]
)

DAQ_STATUS = T.StructType(
    [
        T.StructField("parameter", T.StringType(), False),  # unique key (db_model.py:60)
        T.StructField("status", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# --- Group B: driver-provided tables (FIXTURES.md §B) ------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
