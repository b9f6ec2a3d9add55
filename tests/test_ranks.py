"""operators/ranks.py — distributed global row_number/ntile must be
bit-identical to the single-partition window form on every input shape:
uniform, heavily skewed (range boundaries land inside tie-free runs of
near-equal metric values), tiny (N < n buckets), and with more requested
partitions than rows (empty range partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from daq_3i_spark.operators.ranks import global_ntile, global_row_number


def _mkdf(spark, n, skew=False):
    df = spark.range(n).select(F.col("id").alias("k"))
    # metric with heavy ties when skewed: many rows share the same metric so
    # global position depends entirely on the tiebreaker crossing partition
    # boundaries — the case a broken two-level construction gets wrong
    metric = (F.col("k") % 7) if skew else F.pmod(F.col("k") * 2654435761, 1000003)
    return df.withColumn("m", metric.cast("long")).repartition(8, "k")


@pytest.mark.parametrize("n,skew,parts", [
    (1000, False, 16),
    (1000, True, 16),
    (5, False, 16),     # more range partitions than rows
    (1, False, 4),
    (997, True, 3),     # few partitions, prime N
])
def test_global_row_number_matches_window(spark, n, skew, parts):
    df = _mkdf(spark, n, skew)
    order = [F.col("m").desc(), F.col("k").asc()]
    got = {
        r["k"]: r["rn"]
        for r in global_row_number(df, order, "rn", parts).collect()
    }
    want = {
        r["k"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,nt,parts", [
    (1000, 5, 16),
    (1003, 5, 16),   # N % n != 0: first 3 buckets carry the extra row
    (3, 5, 8),       # N < n: one row per bucket, buckets 4-5 empty
    (1, 5, 4),
    (640, 7, 5),
])
def test_global_ntile_matches_window(spark, n, nt, parts):
    df = _mkdf(spark, n, skew=True)
    order = [F.col("m").desc(), F.col("k").asc()]
    got = {
        r["k"]: r["b"]
        for r in global_ntile(df, nt, order, "b", parts).collect()
    }
    want = {
        r["k"]: r["b"]
        for r in df.withColumn("b", F.ntile(nt).over(Window.orderBy(*order))).collect()
    }
    assert got == want


def test_rank_is_parallel_not_single_partition(spark):
    """The data-frame window must be partitioned (by the range-partition
    stamp); the only SinglePartition exchange allowed is the one over the
    P-row offsets frame."""
    df = _mkdf(spark, 1000)
    out = global_row_number(df, [F.col("m").asc(), F.col("k").asc()], "rn", 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__rank_pid" in plan  # the big sort is keyed by partition stamp
    # exactly one SinglePartition exchange: the bounded offsets cumsum
    assert plan.count("Exchange SinglePartition") <= 1


def test_shared_cache_tracks_and_releases(spark):
    """cache.shared() contract: lazy (no jobs at mark time), materialized
    once by the first action, and release_shared() empties the tracker and
    uncaches the frame (the ADVICE r9 CacheManager-leak fix)."""
    import pyspark.sql.functions as F

    from daq_3i_spark.cache import _LIVE, release_shared, shared

    release_shared()  # clean slate whatever earlier tests left behind
    df = shared(spark.range(1000).select(F.col("id") % 7))
    assert len(_LIVE) == 1
    assert df.storageLevel.useMemory  # marked for caching...
    assert not df._jdf.queryExecution().executedPlan().toString().startswith(
        "CollectLimit"
    )
    assert df.count() == 1000  # ...materialized by the first action
    n = release_shared()
    assert n == 1 and not _LIVE
    assert not df.storageLevel.useMemory  # uncached, not just untracked


@pytest.mark.parametrize("n,skew,parts", [
    (1000, False, 16),
    (1000, True, 16),   # heavy ties: boundaries land inside tie runs
    (5, False, 16),     # more range partitions than rows
    (1, False, 4),
    (997, True, 3),
])
def test_global_cumsum_matches_window(spark, n, skew, parts):
    from daq_3i_spark.operators.ranks import global_cumsum

    df = _mkdf(spark, n, skew).withColumn("v", (F.col("k") % 13 + 1).cast("long"))
    order = [F.col("m").desc(), F.col("k").asc()]
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, F.col("v"), order, "cs", parts).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["cs"]
        for r in df.withColumn("cs", F.sum("v").over(w).cast("long")).collect()
    }
    assert got == want


def test_global_cumsum_null_values_contribute_zero(spark):
    """NULL values must not poison the running sum (Arrow promotes an int64
    batch with nulls to float64/NaN; un-coalesced, cumsum NaN-poisons the
    rest of the partition and the carry crashes).  Contract: nulls
    contribute 0."""
    from daq_3i_spark.operators.ranks import global_cumsum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, None), (5, 1)],
        "k long, v long",
    )
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, F.col("v"), [F.asc("k")], "cs", 3).collect()
    }
    assert got == {1: 10, 2: 10, 3: 15, 4: 15, 5: 16}


def _mk_sourced(spark, n, hot=False):
    """(doc_id, source, v) fixture; hot=True puts ~90% of rows in ONE source
    — the real training-corpus shape (one web crawl dominates) that makes
    Window.partitionBy(source) a single-task funnel."""
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    if hot:
        src = F.when(F.col("doc_id") % 10 < 9, F.lit("crawl")).otherwise(
            F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
        )
    else:
        src = F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string"))
    return (
        df.withColumn("source", src)
        .withColumn("v", (F.col("doc_id") % 13 + 1).cast("long"))
        .withColumn("h", F.pmod(F.col("doc_id") * 2654435761, 1000003))
        .repartition(8, "doc_id")
    )


@pytest.mark.parametrize("n,hot,parts", [
    (1000, False, 16),
    (1000, True, 16),   # 90% of rows in one source
    (5, False, 16),     # more range partitions than rows
    (1, False, 4),
    (997, True, 3),
])
def test_grouped_cumsum_matches_window(spark, n, hot, parts):
    """grouped_cumsum must be bit-identical to the per-group window form —
    including the row_number branch — on uniform and hot-source shapes."""
    from daq_3i_spark.operators.ranks import grouped_cumsum

    df = _mk_sourced(spark, n, hot)
    order = [F.col("h").asc(), F.col("doc_id").asc()]
    got = {
        r["doc_id"]: (r["cs"], r["rn"])
        for r in grouped_cumsum(
            df, "source", F.col("v"), order, "cs", rn_alias="rn",
            num_partitions=parts,
        ).collect()
    }
    w = Window.partitionBy("source").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]: (r["cs"], r["rn"])
        for r in df.withColumn("cs", F.sum("v").over(wf).cast("long"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .collect()
    }
    assert got == want


def test_grouped_cumsum_carries_across_arrow_batches(spark):
    """The partition-local running pass carries per-group state across the
    partition's Arrow batches; force tiny batches so every partition spans
    many and a broken carry (or a group run crossing a batch boundary)
    shows up as a value mismatch."""
    from daq_3i_spark.operators.ranks import grouped_cumsum

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = _mk_sourced(spark, 500, hot=True)
        order = [F.col("doc_id").asc()]
        got = {
            r["doc_id"]: r["cs"]
            for r in grouped_cumsum(
                df, "source", F.col("v"), order, "cs", num_partitions=4
            ).collect()
        }
        wf = (
            Window.partitionBy("source")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["doc_id"]: r["cs"]
            for r in df.withColumn("cs", F.sum("v").over(wf).cast("long")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_grouped_cumsum_hot_source_spans_many_tasks(spark):
    """The scale property itself: with 90% of rows in one source, the
    data-sized exchange must be a RANGE partitioning over (source, order)
    — the hot source spans a run of partitions — and the only window in
    the plan is the <= P-row per-(group, pid) offset rollup, never a
    data-sized ORDER BY window."""
    import re

    from daq_3i_spark.operators.ranks import grouped_cumsum

    df = _mk_sourced(spark, 2000, hot=True)
    out = grouped_cumsum(
        df, "source", F.col("v"), [F.col("doc_id").asc()], "cs",
        num_partitions=16,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(source" in plan, "data shuffle is not range-keyed"
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "offset rollup window missing"
    assert all("__rank_pid" in s for s in specs), (
        "a window orders by a data column — the single-task-per-source form"
    )
    # and the hot source really does span several range partitions
    rp = (
        df.repartitionByRange(16, F.col("source"), F.col("doc_id"))
        .select("source", F.spark_partition_id().alias("pid"))
        .filter(F.col("source") == "crawl")
        .select("pid")
        .distinct()
        .count()
    )
    assert rp > 4, f"hot source landed in only {rp} range partitions"


from hypothesis import given, settings
from hypothesis import strategies as st

# (group id 0-3 with group 0 over-weighted ~70%, value, unique-ish key) —
# hypothesis explores tie patterns, empty groups, and single-row groups the
# parametrized fixtures can't enumerate
_gcs_rows = st.lists(
    st.tuples(
        st.sampled_from([0, 0, 0, 0, 0, 0, 0, 1, 2, 3]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=15, deadline=None)
@given(rows=_gcs_rows, parts=st.sampled_from([2, 5, 16]))
def test_grouped_cumsum_property_matches_window(spark, rows, parts):
    """Property form of the grouped_cumsum contract: for ANY skewed group
    assignment, value pattern, and partition count, cumsum AND row_number
    equal the per-group window form exactly (doc_id = list index keeps the
    order total)."""
    from daq_3i_spark.operators.ranks import grouped_cumsum

    data = [(i, f"g{g}", v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, v long").repartition(4)
    order = [F.col("doc_id").asc()]
    got = {
        r["doc_id"]: (r["cs"], r["rn"])
        for r in grouped_cumsum(
            df, "source", F.col("v"), order, "cs", rn_alias="rn",
            num_partitions=parts,
        ).collect()
    }
    w = Window.partitionBy("source").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]: (r["cs"], r["rn"])
        for r in df.withColumn("cs", F.sum("v").over(wf).cast("long"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .collect()
    }
    assert got == want
