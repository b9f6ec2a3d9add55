"""Distributed exact global ranking — row_number/ntile without the
single-partition window.

``F.row_number().over(Window.orderBy(...))`` (no partitionBy) is exact but
funnels EVERY row through one task: Spark plans ``Exchange SinglePartition``
+ a single-partition sort, and emits the "No Partition Defined for Window
operation" warning.  Over a bounded frame (per-day carries, a confusion
matrix) that is the right plan; over an unbounded dimension (every vocabulary
token, every purchasing user — 1e8-1e9 rows at the 100 TB design point) it
is the classic scale killer: one core sorts the world.

These helpers compute the SAME exact result with the standard two-level
construction (the zipWithIndex idea, kept in DataFrame land):

1. ``repartitionByRange`` on the order key — a distributed sort across P
   range partitions (the same machinery ORDER BY uses, minus the final
   single-partition gather) — the ONLY data-sized shuffle;
2. ``sortWithinPartitions`` + ``monotonically_increasing_id``: mid packs
   (partition_id << 33) | row-position-within-partition, so one projection
   over the sorted partitions yields BOTH the partition stamp and the
   0-based local rank with no window sort and no second exchange (each
   partition must stay under 2^33 rows — 8.6e9, far above any sane
   partition size; asserted nowhere because the range split count P is
   caller-controlled);
3. per-partition row counts -> cumulative offsets (a window over P rows,
   where P is the shuffle partition count — bounded by cluster geometry,
   never by data volume) broadcast-joined back;
4. global rank = local rank + partition offset + 1.

Exactness requires the order to be TOTAL (pass a unique tiebreaker — every
caller here orders by (metric, id)): range boundaries may then split the
data anywhere without changing any row's global position.  The partition-id
stamp is consistent across the count branch and the rank branch because both
consume the same range exchange (Catalyst's ReuseExchange dedups the
identical subtree; even unreused, the range sampler is seeded per input
partition, so identical inputs yield identical boundaries — and the
nondeterministic mid projection sits ABOVE the sort, never reordered past
it).  Pinned by tests/test_ranks.py across skewed multi-partition inputs.

``global_ntile`` reproduces the exact SQL NTILE contract (first ``N % n``
buckets get the extra row) from the global row number plus a one-row count
aggregate — no second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_OFF = "__rank_off"
_CNT = "__rank_cnt"
_MID = "__rank_mid"
_MID_BITS = 33  # monotonically_increasing_id: pid << 33 | row-in-partition


def _ranked(
    df: DataFrame, order: list[Column], alias: str, num_partitions: int | None
) -> tuple[DataFrame, DataFrame]:
    """(df + global row_number ``alias``, per-partition counts frame)."""
    from daq_3i_spark.cache import shared

    spark = df.sparkSession
    # the counts branch and the rank branch both consume the range exchange,
    # but column pruning specializes each branch's scan projection, so the
    # two exchanges canonicalize DIFFERENTLY and ReuseExchange never fires —
    # without a cache the entire upstream plan runs twice (measured: the
    # vocab aggregate's document scan + explode executed 4x).  shared() is
    # the tracked lazy persist (release via cache.release_shared(); a
    # recompute after eviction is order-stable — the mid projection sits
    # above the sort, see module docstring) and sets the AQE conf that lets
    # joins feeding the cache still re-partition (the op_graph_pagerank
    # lesson, measured 9x there).
    p = num_partitions or spark.sparkContext.defaultParallelism
    rp = shared(
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(_MID), _MID_BITS))
    )
    counts = rp.groupBy(_PID).agg(F.count("*").alias(_CNT))
    # offsets: rows in all lower-pid partitions.  The window is global but
    # over exactly P rows (the partition count) — bounded by cluster
    # geometry, not data volume, so the SinglePartition exchange is free.
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    local_rn = F.col(_MID).bitwiseAND((1 << _MID_BITS) - 1)
    ranked = (
        rp.join(F.broadcast(offsets), _PID)
        .withColumn(alias, (local_rn + F.col(_OFF) + 1).cast("long"))
        .drop(_PID, _OFF, _MID)
    )
    return ranked, counts


def global_row_number(
    df: DataFrame,
    order: list[Column],
    alias: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order)`` as a BIGINT column, computed
    with P-way parallelism.  ``order`` must be a total order (unique
    tiebreaker); null keys sort per Spark's default null ordering, same as
    the window form."""
    ranked, _ = _ranked(df, order, alias, num_partitions)
    return ranked


def global_ntile(
    df: DataFrame,
    n: int,
    order: list[Column],
    alias: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order)`` as an INT column, exact SQL
    semantics: with N rows, the first ``N % n`` buckets hold ``N div n + 1``
    rows, the rest ``N div n`` (degenerating to one row per bucket when
    N < n).  N comes from summing the per-partition counts the rank pass
    already produced — a one-row broadcast, not a second data pass."""
    grn = f"__grn_{alias}"
    ranked, counts = _ranked(df, order, grn, num_partitions)
    total = counts.agg(F.sum(_CNT).cast("long").alias("__N"))
    q = F.floor(F.col("__N") / n)  # base bucket size
    r = F.col("__N") % n  # buckets carrying one extra row
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = F.when(
        F.col(grn) <= big, F.ceil(F.col(grn) / (q + 1))
    ).otherwise(r + F.ceil((F.col(grn) - big) / q))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(alias, bucket.cast("int"))
        .drop(grn, "__N")
    )


def global_cumsum(
    df: DataFrame,
    value: Column,
    order: list[Column],
    alias: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`` as a
    BIGINT column — see :func:`global_cumsum_and_total` (this is its thin
    wrapper for callers that don't need the grand total)."""
    out, _ = global_cumsum_and_total(df, value, order, alias, num_partitions)
    return out


def global_cumsum_and_total(
    df: DataFrame,
    value: Column,
    order: list[Column],
    alias: str = "cumsum",
    num_partitions: int | None = None,
    total_alias: str = "total",
) -> tuple[DataFrame, DataFrame]:
    """``sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`` as a
    BIGINT column, computed with P-way parallelism — the running-total twin
    of :func:`global_row_number` (same scale killer: an unpartitioned window
    cumsum funnels the world through one task).  Returns ``(df + alias,
    one-row grand-total frame)`` — the total comes from the P-row
    per-partition totals the pass already aggregates for its offsets, so
    callers needing cumsum AND total (cumulative-share classifiers) don't
    re-run the data pass for one number (the :func:`global_ntile`
    precedent: its N rides the counts frame, never a second scan).

    Same two-level construction: range-partition on the (total) order, a
    per-partition running sum, plus the sum of all lower partitions' totals
    broadcast back.  The local running sum is a partition-LOCAL mapInPandas
    pass (carry state across the partition's Arrow batches) rather than a
    ``Window.partitionBy(pid)`` — the window form would demand hash
    clustering on pid, i.e. a SECOND data-sized exchange of rows the range
    shuffle already placed correctly.  ``value`` must already be integral
    (BIGINT fixed-point by this repo's conventions) so the partial sums are
    exact and order-insensitive; the int64 envelope is the caller's
    (numpy cumsum wraps rather than raises past 2^63).  NULL values
    contribute 0 (coalesced before the pass — the fixed-point conventions
    produce no NULL partials; without the coalesce, Arrow promotes the
    batch to float64/NaN and poisons the rest of the partition).  The one
    divergence from SQL window-SUM semantics: rows before the first
    non-null read 0, not NULL.

    ``order`` MUST be a TOTAL order over the input rows.  With ties, the
    range shuffle's placement of the tied rows (and therefore each tied
    row's per-row cumsum) is nondeterministic and can diverge from an
    oracle's window ``ORDER BY`` — append a unique tie-breaking key (id,
    fingerprint) as the last order column, exactly as both current callers
    do.
    """
    import pyspark.sql.types as T

    from daq_3i_spark.cache import shared

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    val = "__cs_val"
    local = f"__cs_local_{alias}"
    rp = shared(
        df.withColumn(val, F.coalesce(value.cast("long"), F.lit(0)))
        .repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn(_PID, F.spark_partition_id().cast("long"))
    )
    totals = rp.groupBy(_PID).agg(F.sum(val).alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    out_schema = T.StructType(
        rp.schema.fields + [T.StructField(local, T.LongType())]
    )

    def running(batches):
        carried = 0
        for pdf in batches:
            c = pdf[val].to_numpy().cumsum() + carried
            pdf[local] = c
            carried = int(c[-1]) if len(c) else carried
            yield pdf

    out = (
        rp.mapInPandas(running, out_schema)
        .join(F.broadcast(offsets), _PID)
        .withColumn(alias, (F.col(local) + F.col(_OFF)).cast("long"))
        .drop(_PID, _OFF, val, local)
    )
    total = totals.agg(F.sum(_CNT).cast("long").alias(total_alias))
    return out, total


def grouped_cumsum(
    df: DataFrame,
    group: str,
    value: Column,
    order: list[Column],
    alias: str = "cumsum",
    rn_alias: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(value) OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` — and, when ``rn_alias`` is given, ``row_number()`` over the
    SAME window — computed with P-way parallelism instead of one task per
    group.

    ``Window.partitionBy(group)`` plans one task per group value, so a
    skewed group dimension (one web-crawl source holding 60-90% of a
    training corpus) funnels most of the data through one core — the
    module-docstring scale killer one level down.  This kernel is
    :func:`global_cumsum_and_total`'s construction applied WITHIN group:

    1. ``repartitionByRange`` on ``(group, *order)`` — the only data-sized
       shuffle; a hot group spans a RUN of consecutive range partitions
       instead of one hash bucket;
    2. a partition-local per-group running sum/count (mapInPandas, carrying
       per-group state across the partition's Arrow batches — within a
       partition each group is one contiguous run, so the carry is a single
       (key, sum, count) triple);
    3. per-(group, partition) totals -> lower-partition offsets via a
       window over ``<= P`` rows per group (bounded by cluster geometry,
       never by group size) broadcast-joined back on (group, pid).

    Output values are bit-identical to the window form provided ``(group,
    *order)`` is a TOTAL order (unique tiebreaker — see
    :func:`global_cumsum_and_total` on why ties break exactness).  ``value``
    must be integral (BIGINT fixed-point); NULLs contribute 0; ``group``
    must be non-null.  Rows keep all input columns; column order is NOT
    preserved (callers select explicitly, per repo convention).
    """
    import pyspark.sql.types as T

    from daq_3i_spark.cache import shared

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    val = "__gcs_val"
    local = f"__gcs_local_{alias}"
    lrn = f"__gcs_lrn_{alias}"
    noff = "__gcs_noff"
    ncnt = "__gcs_n"
    rp = shared(
        df.withColumn(val, F.coalesce(value.cast("long"), F.lit(0)))
        .repartitionByRange(p, F.col(group), *order)
        .sortWithinPartitions(F.col(group), *order)
        .withColumn(_PID, F.spark_partition_id().cast("long"))
    )
    totals = rp.groupBy(group, _PID).agg(
        F.sum(val).alias(_CNT), F.count("*").alias(ncnt)
    )
    # offsets: this group's totals in all lower-pid partitions.  The window
    # partitions by GROUP over the (group, pid) census — <= P rows per
    # group, so even the hottest source's offset rollup is cluster-geometry
    # sized, and the whole census (<= P + #groups rows) broadcasts.
    w_off = (
        Window.partitionBy(group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group,
        _PID,
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
        F.coalesce(F.sum(ncnt).over(w_off), F.lit(0)).alias(noff),
    )
    out_schema = T.StructType(
        rp.schema.fields
        + [T.StructField(local, T.LongType()), T.StructField(lrn, T.LongType())]
    )

    def running(batches):
        # within a sorted partition each group is ONE contiguous run, so the
        # only cross-batch state is the last row's (key, cumsum, count); a
        # batch's leading rows continue that run iff their key matches
        first, carry_key, carry_sum, carry_n = True, None, 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                pdf[local] = pdf[val].astype("int64")
                pdf[lrn] = pdf[val].astype("int64")
                yield pdf
                continue
            by = pdf.groupby(group, sort=False)
            cs = by[val].cumsum()
            rn = by.cumcount() + 1
            if not first:
                cont = (pdf[group] == carry_key).to_numpy()
                cs = cs + cont * carry_sum
                rn = rn + cont * carry_n
            pdf[local] = cs.astype("int64")
            pdf[lrn] = rn.astype("int64")
            carry_key = pdf[group].iloc[-1]
            carry_sum = int(pdf[local].iloc[-1])
            carry_n = int(pdf[lrn].iloc[-1])
            first = False
            yield pdf

    out = (
        rp.mapInPandas(running, out_schema)
        .join(F.broadcast(offsets), [group, _PID])
        .withColumn(alias, (F.col(local) + F.col(_OFF)).cast("long"))
    )
    if rn_alias is not None:
        out = out.withColumn(
            rn_alias, (F.col(lrn) + F.col(noff)).cast("long")
        )
    return out.drop(_PID, _OFF, noff, val, local, lrn)
