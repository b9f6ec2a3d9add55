"""Time-series joins Spark lacks natively: as-of and range joins.

Neither exists as a built-in Spark operator (DuckDB has ASOF JOIN; kdb/Pandas
have merge_asof).  For a DAQ engine they are the two natural lookups over
``channel_data``:

* **as-of**: "the latest sample at or strictly before time t, per channel" —
  implemented with the union+window trick: tag query rows and data rows,
  sort per key by (ts, tag, id), and carry the last seen data value forward
  with ``last(..., ignorenulls)`` over an unbounded-preceding window.  ONE
  shuffle on the key, no range predicates, no skew beyond the key itself —
  this is the scale-safe formulation (a naive non-equi join would be a
  broadcast nested loop).
* **range**: "all samples inside [start, end) per key" — implemented by
  *bucketing*: explode each interval into the coarse time buckets it covers,
  bucket each sample row, equi-join on (key, bucket), then refine with the
  exact range predicate.  Work scales with interval-length/bucket-width, not
  |left| x |right|; the join stays a hash join on a compound key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    queries: DataFrame,
    data: DataFrame,
    key: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    order_col: str = "id",
) -> DataFrame:
    """For each query row, attach the latest ``data`` row with
    ``data.ts < query.ts`` (strict) for the same key; among equal-ts data
    rows the highest ``order_col`` wins.  NULL values when no earlier sample
    exists.

    ``queries`` columns are preserved; each of ``value_cols`` is added with
    an ``asof_`` prefix.
    """
    q = queries.withColumn("__is_q", F.lit(1)).withColumn("__ord", F.lit(0).cast("long"))
    d = data.select(
        key,
        ts,
        F.lit(0).alias("__is_q"),
        F.col(order_col).cast("long").alias("__ord"),
        *[F.col(c) for c in value_cols],
    )
    for c in queries.columns:
        if c not in (key, ts):
            d = d.withColumn(c, F.lit(None))
    for c in value_cols:
        q = q.withColumn(c, F.lit(None).cast(dict(data.dtypes)[c]))
    unioned = q.select(d.columns).unionByName(d.select(d.columns))

    # sort: ts asc, queries BEFORE data at equal ts (strict <), then arrival
    # order so the newest equal-ts data row wins
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_q").desc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.last(c, ignorenulls=True).over(w))
    return (
        out.filter(F.col("__is_q") == 1)
        .drop("__is_q", "__ord", *value_cols)
    )


def range_join(
    intervals: DataFrame,
    data: DataFrame,
    key: str,
    start: str = "interval_start",
    end: str = "interval_end",
    ts: str = "ts",
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All ``data`` rows with ``start <= ts < end`` per key, via bucketed
    equi-join + exact refine (never a nested-loop range join).

    ``bucket_s`` is the bucket width in seconds; choose it near the typical
    interval length so each interval explodes into O(1) buckets.  Both sides
    bucket arithmetically — floor(epoch_us / width) — so ANY width is safe
    (ADVICE r1: the old date_trunc('hour') data-side bucket silently dropped
    matches for widths coarser than an hour, since the interval side strode
    over hour values the data rows truncated to).
    """
    w_us = int(bucket_s) * 1_000_000
    ivl = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(`{start}`) div {w_us}"),
                F.expr(f"unix_micros(`{end}`) div {w_us}"),
            )
        ),
    )
    d = data.withColumn("__bucket", F.expr(f"unix_micros(`{ts}`) div {w_us}"))
    return (
        ivl.join(d, [key, "__bucket"], how)
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bucket")
    )
