"""Property-based check of the conversion compiler: for RANDOM arithmetic
programs from the supported grammar, the compiled Spark expression and the
compiled DuckDB expression must agree bit-for-bit (or both be NULL) on
arbitrary inputs — the compiler's two renderings may never drift.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from daq_3i_spark.functions.convert import compile_conversion

# expression grammar: x, int/decimal literals, + - * / %, unary minus, parens
_lit = st.one_of(
    st.integers(min_value=-1000, max_value=1000).map(str),
    st.integers(min_value=-10000, max_value=10000).map(lambda v: f"{v / 10}"),
)
_leaf = st.one_of(st.just("x"), _lit)


def _binop(children):
    return st.tuples(children, st.sampled_from(["+", "-", "*", "/", "%"]), children).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    )


_expr = st.recursive(_leaf, lambda inner: st.one_of(_binop(inner), inner.map(lambda e: f"(-{e})")), max_leaves=8)

_x_vals = st.sampled_from([0.0, 1.0, -1.0, 42.5, -185.22, 4206.42, 1e6, -0.001])


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=40, deadline=None)
@given(expr=_expr, x=_x_vals)
def test_dialects_agree(spark, duck, expr, x):
    program = f"Value = {expr}"
    c = compile_conversion(program)
    assert c is not None, program

    d = duck.execute(
        f"SELECT {c.duckdb_sql.replace('__X__', 'xx')} "
        f"FROM (SELECT CAST(? AS DOUBLE) AS xx)",
        [x],
    ).fetchone()[0]
    s = (
        spark.createDataFrame([(x,)], "x double")
        .select(c.column("x").alias("v"))
        .collect()[0]["v"]
    )
    if d is None or s is None or (isinstance(d, float) and math.isnan(d)):
        # null-on-error must agree (NaN tolerated as the engines' shared
        # representation of 0/0-style results)
        assert (s is None or (isinstance(s, float) and math.isnan(s))) and (
            d is None or (isinstance(d, float) and math.isnan(d))
        ), f"{program} @ x={x}: spark={s!r} duck={d!r}"
    else:
        assert s == d, f"{program} @ x={x}: spark={s!r} duck={d!r} (bit drift)"


@settings(max_examples=60, deadline=None)
@given(expr=_expr, x=_x_vals)
def test_compiled_matches_python_semantics(duck, expr, x):
    """The compiled rendering must agree with the asteval-equivalent numpy
    fallback (Python semantics: floored %, true division) — ADVICE r1 found
    the compiled path rendering truncated MOD while the reference and the
    fallback use Python's floored modulo."""
    import numpy as np

    from daq_3i_spark.functions.convert import _safe_eval_vec

    program = f"Value = {expr}"
    c = compile_conversion(program)
    assert c is not None, program

    d = duck.execute(
        f"SELECT {c.duckdb_sql.replace('__X__', 'xx')} "
        f"FROM (SELECT CAST(? AS DOUBLE) AS xx)",
        [x],
    ).fetchone()[0]
    vals = _safe_eval_vec(program, np.array([x], dtype=np.float64))
    p = None
    if vals is not None and math.isfinite(vals[0]):
        p = float(vals[0])
    if p is None:
        assert d is None or (isinstance(d, float) and math.isnan(d)), (
            f"{program} @ x={x}: python=None duck={d!r}"
        )
    else:
        assert d == p and math.copysign(1, d) == math.copysign(1, p), (
            f"{program} @ x={x}: python={p!r} duck={d!r} (semantic drift)"
        )
