"""Golden-vector tests for the register decode kernel (FIXTURES.md §A.7).

Three implementations must agree: numpy bit-cast (ground truth), the pure
Catalyst column expression, and the DuckDB oracle SQL rendering.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
import pytest

from daq_3i_spark.functions.decode import decode_col, decode_numpy, decode_sql_duckdb


def _f32_regs(value: float, *, rwords: bool = False, rbytes: bool = False, skip: bool = False):
    """Encode a float as two uint16 words, default layout: byte-order big
    within word, word order little (regs[0] = low word)."""
    (u,) = struct.unpack("<I", struct.pack("<f", value))
    lo, hi = u & 0xFFFF, u >> 16
    if rbytes:
        bswap = lambda r: ((r & 0xFF) << 8) | (r >> 8)  # noqa: E731
        lo, hi = bswap(lo), bswap(hi)
    if rwords:
        words = [hi, lo]
    else:
        words = [lo, hi]
    if skip:
        words = [words[0], 0xDEAD, words[1]]
    return words


# (format_code, registers, expected) — sign boundaries, word/byte swaps,
# IEEE specials per FIXTURES.md §A.7
GOLDEN = [
    # SINT16 / UINT16 boundaries
    (0, [0], 0.0),
    (0, [1], 1.0),
    (0, [0x7FFF], 32767.0),
    (0, [0x8000], -32768.0),
    (0, [0xFFFF], -1.0),
    (4, [0xFFFF], 65535.0),
    (4, [0x8000], 32768.0),
    # SINT32 word order little: regs[0]=low
    (1, [0xFFFF, 0xFFFF], -1.0),
    (1, [0x0001, 0x0000], 1.0),
    (1, [0xFFFF, 0x7FFF], 2147483647.0),
    (1, [0x0000, 0x8000], -2147483648.0),
    # SINT32_RWORDS: regs[0]=high
    (2, [0x7FFF, 0xFFFF], 2147483647.0),
    (2, [0x8000, 0x0000], -2147483648.0),
    # SKIP2: 3 regs, middle skipped, word order little
    (3, [0x0001, 0xDEAD, 0x0000], 1.0),
    (3, [0xFFFF, 0xBEEF, 0xFFFF], -1.0),
    # UINT32 variants
    (5, [0xFFFF, 0xFFFF], 4294967295.0),
    (5, [0x0002, 0x0001], 65538.0),
    (6, [0x0001, 0x0002], 65538.0),
    # FLOAT: 1.0 = 0x3F800000 -> lo=0x0000 hi=0x3F80
    (7, _f32_regs(1.0), 1.0),
    (7, _f32_regs(-2.5), -2.5),
    (7, _f32_regs(0.0), 0.0),
    (7, _f32_regs(3.14159), struct.unpack("<f", struct.pack("<f", 3.14159))[0]),
    (7, _f32_regs(1e-42), struct.unpack("<f", struct.pack("<f", 1e-42))[0]),  # subnormal
    (7, _f32_regs(float("inf")), None),  # Inf -> NULL
    (7, _f32_regs(float("nan")), None),  # NaN -> NULL
    (8, _f32_regs(-2.5, skip=True), -2.5),
    (9, _f32_regs(1.0, rbytes=True), 1.0),
    (9, _f32_regs(-123.456, rbytes=True), struct.unpack("<f", struct.pack("<f", -123.456))[0]),
    (10, _f32_regs(1.0, rwords=True), 1.0),
    (11, _f32_regs(0.15625, rwords=True, skip=True), 0.15625),
    # ABB REAL32 (word order Big): regs[0]=high
    (12, _f32_regs(1.0, rwords=True), 1.0),
    (12, _f32_regs(-0.5, rwords=True), -0.5),
    # ABB_REAL32_S: signed int from (r1<<16)|r0 (sign extension applied)
    (13, [0xFFFF, 0xFFFF], -1.0),
    (13, [0x0001, 0x0000], 1.0),
    # unknown format -> NULL
    (99, [1, 2], None),
]


def test_decode_numpy_golden():
    fc = np.array([g[0] for g in GOLDEN])
    regs = [g[1] for g in GOLDEN]
    out = decode_numpy(fc, regs)
    for i, (_, _, expected) in enumerate(GOLDEN):
        if expected is None:
            assert math.isnan(out[i]), f"case {i}: expected NULL, got {out[i]}"
        else:
            assert out[i] == expected, f"case {i}: {out[i]} != {expected}"


def test_decode_spark_matches_golden(spark):
    rows = [(i, g[0], g[1]) for i, g in enumerate(GOLDEN)]
    df = spark.createDataFrame(rows, "i int, fc int, regs array<int>")
    got = {
        r["i"]: r["v"]
        for r in df.select("i", decode_col_df().alias("v")).collect()
    }
    for i, (_, _, expected) in enumerate(GOLDEN):
        assert got[i] == pytest.approx(expected) if expected is not None else got[i] is None, (
            f"case {i}: {got[i]} != {expected}"
        )
        if expected is not None:
            assert got[i] == expected, f"case {i}: bit mismatch {got[i]} != {expected}"


def decode_col_df():
    from pyspark.sql import functions as F

    return decode_col(F.col("fc"), F.col("regs"))


def test_decode_duckdb_matches_golden():
    con = duckdb.connect()
    expr = decode_sql_duckdb("fc", "r0", "r1", "r2")
    for i, (fc, regs, expected) in enumerate(GOLDEN):
        r = regs + [0] * (3 - len(regs))
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS fc, ? AS r0, ? AS r1, ? AS r2)",
            [fc, r[0], r[1], r[2]],
        ).fetchone()[0]
        assert got == expected, f"case {i} fmt {fc}: {got} != {expected}"
