"""Bucketing for co-located joins — the 100 TB join strategy.

At scale, repeatedly joining big fact tables on the same key should not pay
a shuffle every query: writing both sides bucketed by the join key lets the
join consume the existing bucketing (zero Exchange in the plan).  This test
proves the property end-to-end on the orders⋈lineitem join: same results,
no shuffle in the bucketed plan.

(The registry ops read the driver's plain parquet, so bucketing lives here
as the documented scale recipe rather than a queries() entry — saveAsTable
needs a warehouse, which tests control and the driver harness may not.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed):
    from daq_3i_spark.sources.tables import load_table

    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    # disable auto-broadcast so the join strategy decision is about bucketing,
    # not table size (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        n_exchanges = plan.count("Exchange")
        # only the final single-key aggregate may shuffle; the join must not
        # (unbucketed baseline shuffles both join inputs: >= 3 exchanges)
        assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan}"

        po = load_table(spark, sf_dir, "orders")
        pl = load_table(spark, sf_dir, "lineitem")
        baseline = (
            po.join(pl, po["o_orderkey"] == pl["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        b_plan = baseline._jdf.queryExecution().executedPlan().toString()
        assert b_plan.count("Exchange") >= 3, "baseline should shuffle both sides"

        assert sorted(joined.collect()) == sorted(baseline.collect())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
