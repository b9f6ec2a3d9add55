"""Conversion-expression compiler — the reference's per-channel scalar UDF.

The reference evaluates user-defined programs of the form ``Value = f(x)``
with a sandboxed asteval interpreter, *re-parsing the expression per sample*
(/root/reference/conversion.py:7-16, invoked from bus.py:113-114).  Errors
yield NULL (conversion.py:13-15).

Here the expression is compiled **once** (driver side) into a native Catalyst
column expression, so per-sample evaluation is JVM-side, vectorized, and
whole-stage-codegen'd — the per-row interpreter disappears entirely.  For
expressions outside the safe arithmetic subset there is an Arrow-vectorized
numpy fallback UDF with the same null-on-error contract.

Supported subset (covers all FIXTURES.md §A.3 expressions): the binary
operators ``+ - * / % **``, unary ``-``/``+``, numeric literals, parentheses,
and the input symbol ``x``.  The program must assign to ``Value``.

Defined divergence: ``x ** p`` with fractional ``p`` and negative ``x`` is
NULL (asteval would produce a complex number the reference's decimal sink
could never store); division by zero is NULL likewise.  Both rules are
rendered identically into the Spark plan and the DuckDB oracle SQL.
"""

from __future__ import annotations

import ast
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_BINOPS = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/", ast.Mod: "%", ast.Pow: "**"}


@dataclass(frozen=True)
class Compiled:
    """A conversion compiled to both dialects (same tree, two renderings)."""

    spark_sql: str  # Spark SQL expression over column name `x`
    duckdb_sql: str  # DuckDB SQL expression over column name `x`

    def column(self, x: str) -> Column:
        return F.expr(self.spark_sql.replace("__X__", f"`{x}`"))


def _parse_program(expr: str) -> ast.expr | None:
    """Parse 'Value = <expr>' -> the RHS AST, or None if malformed."""
    try:
        tree = ast.parse(expr, mode="exec")
    except SyntaxError:
        return None
    if len(tree.body) != 1 or not isinstance(tree.body[0], ast.Assign):
        return None
    assign = tree.body[0]
    if len(assign.targets) != 1:
        return None
    tgt = assign.targets[0]
    if not isinstance(tgt, ast.Name) or tgt.id != "Value":
        return None
    return assign.value


def _const_value(node: ast.expr) -> float | None:
    """Numeric value of a literal (possibly under unary +/-), else None."""
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        inner = _const_value(node.operand)
        if inner is None:
            return None
        return -inner if isinstance(node.op, ast.USub) else inner
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return float(node.value)
    return None


def _fold_xfree(node: ast.expr) -> str | None:
    """Fold an x-free subtree with plain Python arithmetic and render the
    result, or None when the subtree references ``x``.

    Folding with Python (not SQL) arithmetic preserves asteval's literal
    typing: int literals stay int, so ``-0`` is +0.0 while the naive
    rendering ``-CAST(0 AS DOUBLE)`` is -0.0 — a signed-zero drift vs the
    reference found by the hypothesis property test.  Errors (division by
    zero, overflow) and non-finite results fold to NULL, matching the
    null-on-error contract and the numpy fallback's isfinite mask.
    """
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            return None
        if not isinstance(n, _ALLOWED_NODES):
            raise ValueError(f"unsupported node {type(n).__name__}")
        if isinstance(n, ast.Constant) and (
            not isinstance(n.value, (int, float)) or isinstance(n.value, bool)
        ):
            raise ValueError("non-numeric literal")
    try:
        v = float(
            eval(  # noqa: S307 whitelisted AST only
                compile(ast.fix_missing_locations(ast.Expression(body=node)), "<fold>", "eval"),
                {"__builtins__": {}},
                {},
            )
        )
    except Exception:
        return "CAST(NULL AS DOUBLE)"
    if not math.isfinite(v):
        return "CAST(NULL AS DOUBLE)"
    # string cast, not a bare numeric literal: both dialects parse bare
    # literals as DECIMAL first, which drops the sign of -0.0 and (in DuckDB)
    # rounds 17-significant-digit values through a non-correctly-rounded
    # decimal->double path (3*4.1 folded to 12.299999999999999 came back as
    # 12.3); CAST('<repr>' AS DOUBLE) is correctly-rounded strtod in both.
    return f"CAST('{v!r}' AS DOUBLE)"


def _render(node: ast.expr, dialect: str) -> str:
    """Render the AST to SQL text; raises ValueError outside the safe subset.

    Numeric literals are rendered with an explicit DOUBLE cast: bare ``0.3``
    parses as DECIMAL in BOTH SQL dialects, so literal-literal arithmetic
    (e.g. ``1 / 0.3``) would silently run in decimal with different
    precision rules per engine — found by the hypothesis property test.
    """
    folded = _fold_xfree(node)
    if folded is not None:
        return folded
    if isinstance(node, ast.Num):  # py<3.8 compat form of Constant
        return f"CAST({node.n!r} AS DOUBLE)"
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)) and not isinstance(node.value, bool):
            return f"CAST({node.value!r} AS DOUBLE)"
        raise ValueError("non-numeric literal")
    if isinstance(node, ast.Name):
        if node.id == "x":
            return "__X__"  # placeholder substituted with the bound column name
        raise ValueError(f"unknown symbol {node.id}")
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        inner = _render(node.operand, dialect)
        return f"(-{inner})" if isinstance(node.op, ast.USub) else inner
    if isinstance(node, ast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ValueError(f"unsupported operator {node.op}")
        lhs = _render(node.left, dialect)
        rhs = _render(node.right, dialect)
        if op == "**":
            # Render powers with correctly-rounded primitives so Spark (Java
            # Math.pow) and DuckDB (libm pow) cannot diverge by an ulp:
            # x**0.5 -> SQRT, small integer exponents -> repeated multiply.
            # NULL for negative base with fractional exponent (see module doc).
            exp_const = _const_value(node.right)
            if exp_const is not None:
                if exp_const == 0.5:
                    return f"(CASE WHEN ({lhs}) < 0 THEN NULL ELSE SQRT({lhs}) END)"
                if float(exp_const).is_integer() and 0 <= exp_const <= 8:
                    n = int(exp_const)
                    if n == 0:
                        return "CAST(1.0 AS DOUBLE)"
                    return "(" + " * ".join([f"({lhs})"] * n) + ")"
            frac = f"(({rhs}) <> CAST({rhs} AS BIGINT))"
            return f"(CASE WHEN ({lhs}) < 0 AND {frac} THEN NULL ELSE POWER({lhs}, {rhs}) END)"
        if op == "/":
            return f"(CASE WHEN ({rhs}) = 0 THEN NULL ELSE ({lhs}) / ({rhs}) END)"
        if op == "%":
            # Python/asteval floored modulo (result takes the divisor's sign),
            # not SQL's truncated MOD: reproduce CPython float_rem exactly —
            # r = fmod(a, b); r += b when r is nonzero and disagrees with b's
            # sign; zero results carry the divisor's sign (0.0 * b).  Both
            # engines' MOD(double) is truncated fmod, so one template renders
            # identically in Spark and DuckDB, and it now agrees with the
            # numpy fallback (np.mod is floored).
            r = f"MOD({lhs}, {rhs})"
            return (
                f"(CASE WHEN ({rhs}) = 0 THEN NULL "
                f"WHEN {r} = 0 THEN CAST(0.0 AS DOUBLE) * ({rhs}) "
                f"WHEN ({r} < 0) = (({rhs}) < 0) THEN {r} "
                f"ELSE {r} + ({rhs}) END)"
            )
        return f"(({lhs}) {op} ({rhs}))"
    raise ValueError(f"unsupported node {type(node).__name__}")


def compile_conversion(expr: str | None) -> Compiled | None:
    """Compile a 'Value = f(x)' program; None when malformed/unsupported
    (the caller falls back to :func:`convert_fallback_udf` or NULL)."""
    if expr is None:
        return None
    rhs = _parse_program(expr)
    if rhs is None:
        return None
    try:
        return Compiled(
            spark_sql=f"CAST({_render(rhs, 'spark')} AS DOUBLE)",
            duckdb_sql=f"CAST({_render(rhs, 'duckdb')} AS DOUBLE)",
        )
    except ValueError:
        return None


def conversion_to_spark_sql(expr: str | None, x: str) -> str:
    """Spark SQL for the conversion applied to column ``x``; malformed -> NULL."""
    c = compile_conversion(expr)
    if c is None:
        return "CAST(NULL AS DOUBLE)"
    return c.spark_sql.replace("__X__", f"`{x}`")


def conversion_to_duckdb_sql(expr: str | None, x: str) -> str:
    c = compile_conversion(expr)
    if c is None:
        return "CAST(NULL AS DOUBLE)"
    return c.duckdb_sql.replace("__X__", f"({x})")


def convert_case_column(conversions: list[tuple[int, str]], conv_id: Column, x: str) -> Column:
    """One CASE expression dispatching on conversion_id — the whole conversions
    dim folded into the plan as a constant (it is tiny, per the reference)."""
    col = F.lit(None).cast("double")
    expr_col = F.col(x).cast("double")
    for cid, expr in conversions:
        compiled = compile_conversion(expr)
        arm = compiled.column(x) if compiled else F.lit(None).cast("double")
        col = F.when(conv_id == cid, arm).otherwise(col)
    # conversion_id 0 or NULL -> identity (no conversion, daq-3i.py:150-153)
    return F.when(conv_id.isNull() | (conv_id == 0), expr_col).otherwise(col)


def convert_case_duckdb(conversions: list[tuple[int, str]], conv_id: str, x: str) -> str:
    whens = " ".join(
        f"WHEN {cid} THEN {conversion_to_duckdb_sql(expr, x)}" for cid, expr in conversions
    )
    return (
        f"(CASE WHEN {conv_id} IS NULL OR {conv_id} = 0 THEN CAST({x} AS DOUBLE) "
        f"ELSE (CASE {conv_id} {whens} ELSE NULL END) END)"
    )


# --- fallback: vectorized safe evaluator (asteval-equivalent, Arrow-batched) --

_ALLOWED_NODES = (
    ast.Expression,
    ast.BinOp,
    ast.UnaryOp,
    ast.Num,
    ast.Constant,
    ast.Name,
    ast.Load,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.Mod,
    ast.Pow,
    ast.USub,
    ast.UAdd,
)


def _safe_eval_vec(expr: str, x: np.ndarray) -> np.ndarray | None:
    rhs = _parse_program(expr)
    if rhs is None:
        return None
    for node in ast.walk(rhs):
        if not isinstance(node, _ALLOWED_NODES):
            return None
    code = compile(ast.Expression(body=rhs), "<conversion>", "eval")
    with np.errstate(all="ignore"):
        try:
            out = eval(code, {"__builtins__": {}}, {"x": x})  # noqa: S307 whitelisted AST only
        except Exception:
            return None
    if np.isscalar(out):
        out = np.full(len(x), float(out))
    return np.asarray(out, dtype=np.float64)


def convert_fallback_udf(expr: str):
    """Arrow-vectorized fallback for expressions the compiler can't translate.

    Matches the reference's null-on-error contract; evaluation is numpy-wide
    per batch (not per row)."""

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _convert(x: pd.Series) -> pd.Series:
        vals = _safe_eval_vec(expr, x.to_numpy(dtype=np.float64))
        if vals is None:
            return pd.Series([None] * len(x), dtype="float64")
        s = pd.Series(vals)
        return s.where(np.isfinite(vals), None)

    return _convert
