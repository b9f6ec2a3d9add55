"""Cross-engine exact float aggregation (the fixed-point sum convention).

Float sums are order-nondeterministic, so every registry op that aggregates a
DOUBLE column computes an EXACT order-insensitive sum and surfaces it as
DOUBLE through a construction that is bit-identical in Spark and DuckDB *by
construction*, not by luck:

    unscaled = FLOOR(x * 1e6 + 0.5)          -- exact 6-decimal fixed point
    sum      = SUM(CAST(unscaled AS BIGINT)) -- exact integer, associative
    result   = CAST(sum AS DOUBLE) / 1e6     -- two correctly-rounded IEEE ops

Every step is an IEEE-754 primitive (multiply, add, floor, int64->double
conversion, divide) that both engines round correctly on identical operands,
so the final doubles agree bit-for-bit regardless of magnitude.

The previous convention — SUM(CAST(x AS DECIMAL(18,6))) cast to DOUBLE — was
only *coincidentally* bit-identical: DuckDB's DECIMAL->DOUBLE cast goes
through a non-correctly-rounded scale division once the unscaled value
exceeds 2^53, so a big-enough sum (q11's global total is ~8e16 unscaled at
sf0.01) could land in the double-rounding gap on regenerated testdata.  The
fixed-point form has no such cliff: int64->double conversion is correctly
rounded at any magnitude the testdata can produce (|sum| < 2^63).

Value-domain note: per-element |x| must stay below ~9.2e12 (int64/1e6) and
the unscaled sum below 2^63.  The shipped testdata tops out around 1e12 per
value and ~8e17 unscaled per sum at sf0.1 — both comfortably inside.  At
true 100 TB scale a production deployment would widen the accumulator to
DECIMAL(38,6); the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point scale: 6 decimal digits (matches the old DECIMAL(18,6) scale)
FX_SCALE = 1e6


def fx_unscaled(col: Column, scale: float = FX_SCALE) -> Column:
    """``col`` quantized to exact fixed point as BIGINT (default 6 decimals).

    Spark's ``floor(double)`` already returns LongType; the arithmetic
    (``* scale + 0.5``) is plain double math, identical to the DuckDB twin.
    The sufficient-statistics ops (trend / seasonal outlier / autocorr)
    pass ``scale=1e3``: milli precision buys the integer headroom their
    squared/cross-multiplied sums need.
    """
    return F.floor(col * F.lit(scale) + F.lit(0.5))


def fx_sum(col: Column) -> Column:
    """Exact order-insensitive sum of a double column, surfaced as DOUBLE."""
    return F.sum(fx_unscaled(col)).cast("double") / F.lit(FX_SCALE)


def fx_unscaled_sql(expr: str, scale: str = "1e6") -> str:
    """DuckDB twin of :func:`fx_unscaled` (explicit BIGINT cast: DuckDB's
    ``floor`` keeps DOUBLE; the cast of an exact-integer double is exact)."""
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"


def fx_sum_sql(expr: str) -> str:
    """DuckDB twin of :func:`fx_sum`.

    The inner ``CAST(SUM(..) AS BIGINT)`` pins DuckDB's HUGEINT sum result
    back to int64 before the int64->double conversion, so both engines run
    the exact same correctly-rounded conversion.  Parenthesized so callers
    can embed it in larger expressions without precedence surprises.
    """
    return (
        f"(CAST(CAST(SUM({fx_unscaled_sql(expr)}) AS BIGINT) AS DOUBLE) / 1e6)"
    )


#: the portable deterministic-sampling LCG — ONE hash convention for every
#: reproducible-sampling op (budget sample, domain mix, weighted Bernoulli):
#: h = ((key % MIX_M) * MIX_A + MIX_C) % MIX_M, thresholded on h % 1_000_000.
#: Shared here so the convention cannot silently fork between modules.
#:
#: The key is pre-reduced mod MIX_M BEFORE the multiply: modular arithmetic
#: makes ((k % M) * A + C) % M identical to (k * A + C) % M for EVERY k, but
#: the pre-reduced product is bounded by (M-1)*A < 2.4e18 < 2^63, so the coin
#: never overflows int64 — the raw form throws under ANSI mode (or silently
#: wraps without it) once key > ~8.4e9, which a ~1e10-document 100 TB corpus
#: reaches.  Identity of the two forms is pinned by tests/test_functions.py.
MIX_A, MIX_C, MIX_M = 1103515245, 12345, 2147483647


def lcg_coin(key: Column) -> Column:
    """The portable sampling coin over a BIGINT ``key``, overflow-free.

    ``((key % MIX_M) * MIX_A + MIX_C) % MIX_M`` — equal to the textbook
    ``(key * MIX_A + MIX_C) % MIX_M`` for every key by modular arithmetic,
    but safe for keys up to the full int64 range (product ≤ (M-1)*A < 2^62).
    """
    return ((key % MIX_M) * MIX_A + MIX_C) % MIX_M


def lcg_coin_sql(expr: str) -> str:
    """DuckDB twin of :func:`lcg_coin` (same pre-reduced form, same bound)."""
    return f"((({expr}) % {MIX_M}) * {MIX_A} + {MIX_C}) % {MIX_M}"
