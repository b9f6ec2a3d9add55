"""op_sql_surface (SURVEY §2.8) — the full relational surface over the
TPC-H-ish star schema + JSON access on events.props.

The reference has no query language at all; this module is the "everything
Spark gives for free" inventory the new engine exposes: multi-way joins with
broadcast dims, semi/anti joins, grouping sets (rollup/cube), set ops,
ranking/analytic windows, scalar subqueries, conditional pivots, JSON
extraction.  Each query is written identically for Catalyst and DuckDB.

Float-aggregate convention (see functions/numeric.py): revenue-style sums
are exact 6-decimal fixed-point BIGINT sums surfaced as DOUBLE through
correctly-rounded IEEE primitives only — bit-identical across engines by
construction; averages divide two such exact quantities as doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daq_3i_spark.functions.numeric import fx_sum, fx_sum_sql as FX, fx_unscaled
from daq_3i_spark.plans.registry import register
from daq_3i_spark.sources.tables import load_events, load_table, spread



# --- TPC-H Q1: scan-heavy groupBy with many aggregates -------------------------


@register(
    "op_sql_q1",
    f"""SELECT l_returnflag, l_linestatus,
       {FX('l_quantity')} AS sum_qty,
       {FX('l_extendedprice')} AS sum_base_price,
       {FX('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {FX('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {FX('l_quantity')} / COUNT(*) AS avg_qty,
       {FX('l_extendedprice')} / COUNT(*) AS avg_price,
       {FX('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 analog: wide hash aggregate with partial (map-side) combine; "
    "the scan reads only the 7 referenced columns",
)
def op_sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        fx_sum(F.col("l_quantity")).alias("sum_qty"),
        fx_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        fx_sum(disc_price).alias("sum_disc_price"),
        fx_sum(charge).alias("sum_charge"),
        (fx_sum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
        (fx_sum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
        (fx_sum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- TPC-H Q3 analog: 3-way join + top-k ---------------------------------------


@register(
    "op_sql_q3_topk",
    f"""SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       {FX('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    doc="TPC-H Q3 analog: selective dim filters pushed below the joins, "
    "customer side broadcast, global top-k (TakeOrderedAndProject); "
    "deterministic tie-break on o_orderkey",
)
def op_sql_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fx_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5 analog: 6-way join ------------------------------------------------


@register(
    "op_sql_q5_region",
    f"""SELECT n.n_name,
       {FX('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name""",
    doc="TPC-H Q5 analog: 6-way join; region/nation/supplier/customer broadcast, "
    "fact-side joins shuffle on the join keys with AQE free to re-plan",
)
def op_sql_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(fx_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- semi / anti joins ----------------------------------------------------------


@register(
    "op_sql_semi_anti",
    """SELECT c.c_custkey,
       EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_orders
    FROM customer c""",
    doc="semi + anti join in one: EXISTS flag per customer (Spark: left_semi / "
    "left_anti composed as an existence join)",
)
def op_sql_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", F.col("o_custkey").isNotNull().alias("has_orders")
    )


@register(
    "op_sql_setops",
    """SELECT n_nationkey, 'both' AS side FROM (
         SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
         INTERSECT
         SELECT DISTINCT s_nationkey FROM supplier)
       UNION ALL
       SELECT n_nationkey, 'customer_only' AS side FROM (
         SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
         EXCEPT
         SELECT DISTINCT s_nationkey FROM supplier)""",
    doc="set algebra: INTERSECT / EXCEPT / UNION ALL over nation keys",
)
def op_sql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    sn = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = cn.intersect(sn).select("n_nationkey", F.lit("both").alias("side"))
    conly = cn.exceptAll(sn).select("n_nationkey", F.lit("customer_only").alias("side"))
    return both.unionAll(conly)


# --- grouping sets: rollup / cube ----------------------------------------------


@register(
    "op_sql_rollup",
    f"""SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       {FX('l_quantity')} AS sum_qty,
       COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    doc="hierarchical subtotals (ROLLUP) with GROUPING() disambiguation",
)
def op_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(load_table(spark, sf_dir, "lineitem"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        fx_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")


@register(
    "op_sql_cube",
    f"""SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n,
       {FX('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    doc="full cross-dimensional subtotals (CUBE)",
)
def op_sql_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.count("*").alias("n"),
        fx_sum(F.col("o_totalprice")).alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "sum_price")


# --- ranking / analytic windows -------------------------------------------------


@register(
    "op_sql_window_rank",
    """WITH t AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             lag(o_orderkey) OVER w AS prev_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk, prev_order
      FROM t WHERE rn <= 3""",
    doc="ranking + analytic window family (row_number/rank/dense_rank/lag), "
    "top-3 orders per customer",
)
def op_sql_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "op_sql_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(CAST(SUM(CAST(FLOOR((l_quantity) * 1e6 + 0.5) AS BIGINT))
         OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
         / 1e6 AS running_qty
    FROM lineitem WHERE l_suppkey <= 5""",
    doc="running aggregate over an ordered frame (cumulative quantity per "
    "supplier).  Runs on the grouped_cumsum kernel (operators/ranks.py, "
    "r13) — range shuffle on (supplier, order key) + partition-local sums "
    "+ <=P-row offset rollup — instead of Window.partitionBy(l_suppkey), "
    "which put each of the 5 suppliers' ENTIRE lineitem history (SF-scaled) "
    "through one task; integer cumsum is associative, so the two forms are "
    "bit-identical and the window-SQL oracle is unchanged",
)
def op_sql_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.ranks import grouped_cumsum

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    cs = grouped_cumsum(
        li,
        "l_suppkey",
        fx_unscaled(F.col("l_quantity")),
        [
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        alias="__cs",
    )
    return cs.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("__cs").cast("double") / F.lit(1e6)).alias("running_qty"),
    )


# --- scalar subquery ------------------------------------------------------------


@register(
    "op_sql_scalar_subquery",
    f"""SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (
      SELECT {FX('p_retailprice')} / COUNT(*) FROM part)""",
    doc="uncorrelated scalar subquery: parts pricier than the mean "
    "(mean via exact fixed-point sum for cross-engine determinism)",
)
def op_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    mean = p.agg((fx_sum(F.col("p_retailprice")) / F.count("*")).alias("m"))
    return (
        p.crossJoin(F.broadcast(mean))
        .filter(F.col("p_retailprice") > F.col("m"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


# --- conditional pivot ----------------------------------------------------------


@register(
    "op_sql_pivot",
    """SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY o_orderpriority""",
    doc="pivot as conditional aggregation (status columns per priority)",
)
def op_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


# --- JSON access ----------------------------------------------------------------


@register(
    "op_sql_json",
    f"""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS n,
       {FX('value')} AS sum_value
    FROM events GROUP BY 1""",
    doc="JSON property extraction on events.props (get_json_object) + aggregate",
)
def op_sql_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), fx_sum(F.col("value")).alias("sum_value"))
    )


# --- distinct / approx aggregates ----------------------------------------------


@register(
    "op_sql_distinct_agg",
    """SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag""",
    doc="multi-column distinct aggregation (expand + two-phase aggregate in Spark)",
)
def op_sql_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(load_table(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


# --- TPC-H Q13 analog: outer-join + distribution of counts ---------------------


@register(
    "op_sql_q13_distribution",
    """WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count""",
    doc="TPC-H Q13 analog: outer join preserved through an aggregate, then a "
    "second aggregate over the counts (customers with zero orders land in "
    "c_count=0) — two shuffles, both map-side combined",
)
def op_sql_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- TPC-H Q18 analog: HAVING over a grouped sum --------------------------------


@register(
    "op_sql_having_bigorders",
    f"""SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {FX('l.l_quantity')} AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING {FX('l.l_quantity')} > 150""",
    doc="TPC-H Q18 analog: grouped exact fixed-point sum with a HAVING filter — the "
    "filter applies post-aggregate (cannot push down), everything else is "
    "one hash aggregate after the join",
)
def op_sql_having_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fx_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


# --- correlated EXISTS ----------------------------------------------------------


@register(
    "op_sql_exists",
    """SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)""",
    doc="correlated EXISTS subquery — Catalyst rewrites it to a left-semi "
    "join with the predicate pushed into the subquery scan",
)
def op_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_tbls = {n: load_table(spark, sf_dir, n) for n in ("supplier", "lineitem")}
    spark_tbls["supplier"].createOrReplaceTempView("v_supplier")
    spark_tbls["lineitem"].createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """SELECT s.s_suppkey, s.s_name, s.s_acctbal
        FROM v_supplier s
        WHERE EXISTS (SELECT 1 FROM v_lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)"""
    )


# --- explicit GROUPING SETS ------------------------------------------------------


@register(
    "op_sql_grouping_sets",
    f"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           {FX('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))""",
    doc="explicit GROUPING SETS (beyond rollup/cube): three grouping "
    "combinations in one Expand + single aggregate pass over the scan",
)
def op_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS BIGINT))
                 AS DOUBLE) / 1e6 AS total
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))"""
    )


# --- TPC-H Q16 analog: NOT IN + count distinct -----------------------------------


@register(
    "op_sql_notin_countdistinct",
    """SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand, p.p_type""",
    doc="TPC-H Q16 analog: null-aware NOT IN (anti join) feeding a "
    "count-distinct aggregate — distinct expands to a two-phase aggregate "
    "on (group, suppkey) then (group)",
)
def op_sql_notin_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    for n in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"v_{n}")
    return spark.sql(
        """SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM v_lineitem l JOIN v_part p ON p.p_partkey = l.l_partkey
        WHERE l.l_suppkey NOT IN (
          SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 0
        )
        GROUP BY p.p_brand, p.p_type"""
    )


# --- multiset set algebra: INTERSECT ALL / EXCEPT ALL ----------------------------


@register(
    "op_sql_setops_all",
    """WITH b AS (
      SELECT l_partkey FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
    ), m AS (
      SELECT l_partkey FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'MACHINERY'
    ),
    common AS (SELECT l_partkey FROM b INTERSECT ALL SELECT l_partkey FROM m),
    surplus AS (SELECT l_partkey FROM b EXCEPT ALL SELECT l_partkey FROM m)
    SELECT 'common' AS kind, l_partkey AS p_partkey,
           CAST(count(*) AS BIGINT) AS n
    FROM common GROUP BY 2
    UNION ALL
    SELECT 'building_only' AS kind, l_partkey AS p_partkey,
           CAST(count(*) AS BIGINT) AS n
    FROM surplus GROUP BY 2""",
    doc="MULTISET set algebra — the ALL variants op_sql_setops' "
    "distinct-input algebra never exercises: per part, how many order "
    "lines do the BUILDING and MACHINERY segments share (INTERSECT ALL "
    "keeps min(multiplicity) copies) and how many are BUILDING surplus "
    "(EXCEPT ALL subtracts multiplicities) — the demand-overlap view a "
    "merchandiser reads as 'contested vs segment-exclusive volume'.  "
    "Multiplicities are exact integers with identical bag semantics in "
    "both engines.  Plan: each segment side is one broadcast-dim "
    "(customer filter) join pipeline; Spark plans intersectAll/"
    "exceptAll as count-replicating aggregates on the partkey shuffle "
    "— no row explosion beyond the true multiplicities; the final "
    "census aggregates reuse the same key",
)
def op_sql_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def seg(name: str):
        c = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == name)
            .select("c_custkey")
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == F.col("c_custkey"))
            .select("l_partkey")
        )

    b, m = seg("BUILDING"), seg("MACHINERY")
    common = (
        b.intersectAll(m)
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.lit("common").alias("kind"), F.col("l_partkey").alias("p_partkey"), "n")
    )
    surplus = (
        b.exceptAll(m)
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.lit("building_only").alias("kind"),
            F.col("l_partkey").alias("p_partkey"),
            "n",
        )
    )
    return common.unionAll(surplus)
