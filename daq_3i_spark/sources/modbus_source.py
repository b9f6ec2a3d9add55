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
* ``modbus_tcp`` — LIVE acquisition over real sockets: a dependency-free
  MODBUS-TCP function-3 client written from the public spec (pymodbus is
  not installed, and not needed), one persistent connection per bus sweep.
  Exercised end-to-end against an in-process TCP server in
  tests/test_modbus_live.py.

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


# --- live MODBUS-TCP transport ------------------------------------------------
#
# The reference gets this from pymodbus (modbus.py:37-56: ModbusTcpClient +
# read_holding_registers, one blocking socket per read).  pymodbus is not
# installed here, and is not needed: MODBUS-TCP function 3 is a tiny public
# wire format (MODBUS Application Protocol v1.1b + MBAP framing), so the live
# transport is implemented directly on a plain socket — and improves on the
# reference by holding ONE connection per bus sweep instead of a socket per
# register read.  Exercised end-to-end against a real in-process TCP server
# in tests/test_modbus_live.py.


class ModbusProtocolError(IOError):
    """Raised on MODBUS exception responses and MBAP framing violations."""


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ModbusProtocolError(f"peer closed mid-frame ({len(buf)}/{n} bytes)")
        buf += chunk
    return buf


class ModbusTcpClient:
    """Minimal MODBUS-TCP client (read-holding-registers, function 3).

    One persistent connection, sequential transactions with echo-checked
    transaction ids; exception responses (function | 0x80) raise
    :class:`ModbusProtocolError` carrying the device's exception code, the
    same surface the reference maps pymodbus errors through
    (modbus.py:50-56)."""

    def __init__(self, host: str, port: int, timeout: float = 5.0):
        import socket

        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._tid = 0
        self.broken = False

    def _fail(self, msg: str) -> None:
        """Framing violation: the byte stream is (or may be) desynchronized —
        a later transaction could consume this frame's remainder as its own
        response.  Mark the connection broken and close it so every
        subsequent call fails fast instead of returning stale registers.
        (Device EXCEPTION responses do NOT come here: they are well-framed,
        the stream stays in sync, and polling continues — the reference's
        error-row semantics.)"""
        self.broken = True
        try:
            self._sock.close()
        except OSError:
            pass
        raise ModbusProtocolError(msg)

    def read_holding_registers(self, unit: int, address: int, count: int) -> list[int]:
        import struct

        if self.broken:
            raise ModbusProtocolError("connection marked broken by a prior framing error")
        self._tid = (self._tid + 1) % 65536
        req = struct.pack(">HHHBBHH", self._tid, 0, 6, unit, 3, address, count)
        try:
            self._sock.sendall(req)
            hdr = _recv_exact(self._sock, 7)
        except OSError as e:
            # dead socket (BrokenPipe/ConnectionReset) or peer closed
            # mid-frame (_recv_exact's ModbusProtocolError is an IOError):
            # both are definitionally desyncs — mark broken so the sweep's
            # reconnect path engages instead of the next channel dying on
            # an uncaught transport error
            self._fail(f"transport failure mid-transaction: {e}")
        rtid, proto, length, runit = struct.unpack(">HHHB", hdr)
        if rtid != self._tid or proto != 0:
            self._fail(
                f"MBAP mismatch: tid {rtid} (sent {self._tid}), protocol {proto}"
            )
        if length < 3:
            # length counts unit id + PDU; a function-3 PDU is >= 2 bytes
            # (func + byte count / exception code) — anything shorter cannot
            # be indexed and is a framing violation, not an IndexError
            self._fail(f"MBAP length {length} too short for a PDU")
        try:
            body = _recv_exact(self._sock, length - 1)
        except OSError as e:
            self._fail(f"transport failure mid-frame: {e}")
        func = body[0]
        if func == 0x83:
            raise ModbusProtocolError(f"device exception code {body[1]} (unit {runit})")
        if func != 3 or body[1] != 2 * count:
            self._fail(
                f"malformed response: function {func}, byte count {body[1]}"
            )
        if len(body) < 2 + 2 * count:
            # the byte-count FIELD said 2*count but the MBAP length did not
            # deliver that many bytes — unpacking would raise struct.error
            # and leave the stream desynchronized (the declared-vs-delivered
            # mismatch ADVICE r9 flagged)
            self._fail(
                f"MBAP length {length} delivers {len(body) - 2} data bytes, "
                f"byte-count field declared {2 * count}"
            )
        return list(struct.unpack(f">{count}H", body[2 : 2 + 2 * count]))

    def close(self) -> None:
        self._sock.close()

    def __enter__(self) -> "ModbusTcpClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def read_live_modbus(
    host: str, port: int, unit: int, address: int, count: int, timeout: float = 5.0
) -> list[int]:
    """One-shot live register read (the reference's socket-per-read shape)."""
    with ModbusTcpClient(host, port, timeout=timeout) as c:
        return c.read_holding_registers(unit, address, count)


def _live_poll_rows(host: str, port: int, bus_id: int, poll_ts: int, tick: int):
    """One live poll sweep over a bus: every enabled func-3 channel, read
    over ONE connection (the per-bus sweep the reference runs per thread,
    daq-3i.py:341-345, minus its per-read reconnects).  The channel list is
    resolved BEFORE connecting, so a bus with nothing to poll never costs a
    connect (or a connect timeout when that idle bus is also offline).

    Error side-channel (bus.py:85-101, modbus.py:48-55): a failed read —
    device exception OR framing violation — yields the channel's row with
    NULL registers instead of killing the sweep; downstream these NULLs
    decode to NULL and land in the dead-letter aggregate
    (op_error_handling).  A framing violation additionally desynchronized
    the connection (the client closed it), so the sweep reconnects once
    for the remaining channels."""
    todo = [
        c for c in channels_rows()
        if c[9] and c[2] == bus_id and c[7] == 3
    ]
    if not todo:
        return
    client = ModbusTcpClient(host, port)
    try:
        for c in todo:
            cid, _name, _cbus, device_id, address, _t, _conv, _func, fmt = c[:9]
            count = FORMAT_REGS.get(fmt, 1)
            regs: list[int] | None
            try:
                regs = client.read_holding_registers(device_id, address, count)
            except ModbusProtocolError:
                regs = None  # dead-letter row; polling continues
                if client.broken:
                    client.close()
                    client = ModbusTcpClient(host, port)
            yield (cid, bus_id, device_id, address, fmt, regs, poll_ts + tick, tick)
    finally:
        client.close()


class _LiveBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "")
        self.port = int(options["port"]) if "port" in options else None
        self.poll_ts = int(options.get("poll_ts", 0))
        self.ticks = int(options.get("ticks", 1))

    def partitions(self) -> list[InputPartition]:
        return [_BusPartition(b[0]) for b in buses_rows() if b[6] and b[2] == 1]

    def read(self, partition: _BusPartition) -> Iterator[tuple]:
        # the bus dim carries each device's (ip, port); the `host` and
        # `port` options each INDEPENDENTLY override every bus (test rigs,
        # NAT'd gateways, port-forwarded devices at their dim IPs)
        bus = next(b for b in buses_rows() if b[0] == partition.bus_id)
        host = self.host or bus[3]
        port = self.port if self.port is not None else bus[4]
        for tick in range(self.ticks):
            yield from _live_poll_rows(host, port, partition.bus_id, self.poll_ts, tick)


class _LiveStreamReader(SimpleDataSourceStreamReader):
    """The reference's actual operating mode — a polling daemon — as a
    streaming source: one live sweep over every enabled TCP bus per
    micro-batch, tick as the offset.  Replay (readBetweenOffsets) re-polls
    the device, so a real deployment gets at-least-once register reads and
    the sink must be idempotent on (channel_id, tick) — the standard caveat
    for any non-replayable physical source (the streaming pipeline's MERGE
    sink already is)."""

    def __init__(self, options: dict):
        self.host = options.get("host", "")
        self.port = int(options["port"]) if "port" in options else None
        self.poll_ts = int(options.get("poll_ts", 0))

    def _sweep(self, tick: int) -> Iterator[tuple]:
        for b in buses_rows():
            if not (b[6] and b[2] == 1):
                continue
            host = self.host or b[3]
            port = self.port if self.port is not None else b[4]
            yield from _live_poll_rows(host, port, b[0], self.poll_ts, tick)

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        tick = int(start["tick"])
        return iter(list(self._sweep(tick))), {"tick": tick + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for tick in range(int(start["tick"]), int(end["tick"])):
            yield from self._sweep(tick)


class ModbusTcpDataSource(DataSource):
    """spark.read/readStream.format("modbus_tcp") — LIVE acquisition over
    real sockets.

    Identical schema, partitioning (one input partition per bus) and row
    contract as ``modbus_sim``; only the transport differs.  Register with
    ``spark.dataSource.register(ModbusTcpDataSource)`` and point it at a
    device (or at tests/test_modbus_live.py's in-process server, which
    serves the reference simulator's register map)."""

    @classmethod
    def name(cls) -> str:
        return "modbus_tcp"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _LiveBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _LiveStreamReader(self.options)
