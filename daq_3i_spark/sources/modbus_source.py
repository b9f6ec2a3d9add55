"""Modbus acquisition as a PySpark Python Data Source (Spark 4 API).

The reference polls MODBUS-TCP devices with pymodbus, one blocking socket per
register read (/root/reference/modbus.py:37-56), against a simulator that
serves register *n* = value *n* (/root/reference/modbus_server.py:89-95).

This module exposes the same acquisition as a declarative source:

* ``modbus_sim`` — batch + streaming reads against an in-process simulated
  device with the reference simulator's register map (register n holds n,
  advanced by one per stream tick so successive micro-batches change).  Fully
  deterministic: options ``poll_ts`` (epoch seconds of the poll) and
  ``ticks`` pin the output.
* a real pymodbus transport would plug into ``_read_registers`` behind the
  same interface; pymodbus is not installed here, so that path raises with a
  clear message (import-gated, never in the simulated path).

Partitioning: one input partition per (bus, device) — the natural parallel
unit (the reference runs one thread per bus, daq-3i.py:341-345); at scale
each executor polls a disjoint device set.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from daq_3i_spark.functions.decode import REG_COUNT
from daq_3i_spark.sources.daq_dims import buses_rows, channels_rows

# register count polled per format code. Single source of truth is
# functions/decode.py:REG_COUNT (the corrected version of the reference's
# buggy FORMAT_LENGTH, modbus.py:26-29 — SURVEY §2.9.1): polling fewer
# registers than decode_cols consumes would NULL every sample of that format.
FORMAT_REGS = REG_COUNT

SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("bus_id", T.IntegerType(), True),
        T.StructField("device_id", T.IntegerType(), True),
        T.StructField("address", T.IntegerType(), True),
        T.StructField("format_code", T.IntegerType(), True),
        T.StructField("registers", T.ArrayType(T.IntegerType()), True),
        T.StructField("poll_ts", T.LongType(), True),  # epoch seconds
        T.StructField("tick", T.LongType(), True),
    ]
)


def _sim_read(address: int, count: int, tick: int) -> list[int]:
    """The simulator device: register n holds (n + tick) mod 2^16
    (modbus_server.py's range(0,99) block, advanced per tick)."""
    return [(address + i + tick) % 65536 for i in range(count)]


def _poll_rows(tick: int, poll_ts: int) -> list[tuple]:
    """One poll sweep: every enabled channel on an enabled MODBUS-TCP bus,
    func code 3 only (modbus.py:9,44-49)."""
    tcp_buses = {b[0] for b in buses_rows() if b[6] and b[2] == 1}
    rows = []
    for c in channels_rows():
        cid, _name, bus_id, device_id, address, _t, _conv, func, fmt, enabled = c[:10]
        if not enabled or bus_id not in tcp_buses or func != 3:
            continue
        count = FORMAT_REGS.get(fmt, 1)
        rows.append(
            (cid, bus_id, device_id, address, fmt,
             _sim_read(address, count, tick), poll_ts + tick, tick)
        )
    return rows


class _BusPartition(InputPartition):
    def __init__(self, bus_id: int):
        self.bus_id = bus_id


class _SimBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.poll_ts = int(options.get("poll_ts", 0))
        self.ticks = int(options.get("ticks", 1))

    def partitions(self) -> list[InputPartition]:
        return [
            _BusPartition(b[0]) for b in buses_rows() if b[6] and b[2] == 1
        ]

    def read(self, partition: _BusPartition) -> Iterator[tuple]:
        for tick in range(self.ticks):
            for row in _poll_rows(tick, self.poll_ts):
                if row[1] == partition.bus_id:
                    yield row


class _SimStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.poll_ts = int(options.get("poll_ts", 0))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        tick = int(start["tick"])
        return iter(_poll_rows(tick, self.poll_ts)), {"tick": tick + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for tick in range(int(start["tick"]), int(end["tick"])):
            yield from _poll_rows(tick, self.poll_ts)


class ModbusSimDataSource(DataSource):
    """spark.read.format("modbus_sim") / spark.readStream.format("modbus_sim").

    Register with ``spark.dataSource.register(ModbusSimDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "modbus_sim"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SimBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SimStreamReader(self.options)


def read_live_modbus(*_args, **_kwargs):
    """Placeholder for the real pymodbus transport (not installed here)."""
    raise NotImplementedError(
        "live MODBUS-TCP requires pymodbus; the modbus_sim source provides "
        "the same interface against a deterministic simulated device"
    )
