"""op_sql_* batch 3 — structural analogs for the four TPC-H patterns the
slimmed star schema could not host verbatim (no partsupp, no l_shipmode /
l_commitdate / l_receiptdate): Q2 (correlated-min supplier selection),
Q12 (late-shipment priority counts), Q20 (double-nested semi-join supplier
qualification) and Q21 (EXISTS + NOT EXISTS self-join on the fact).  With
these the registry covers the full 22-query TPC-H pattern sweep — every
query either verbatim (on the shipped columns) or as a documented analog
that keeps the original's join/subquery/aggregation SHAPE.

Substitutions, applied consistently:

* ``partsupp`` -> the (l_partkey, l_suppkey) pairs observed in ``lineitem``
  (the fact table IS the part-supplier relationship here);
* ``ps_supplycost`` -> MIN(l_extendedprice / l_quantity) per pair: an exact,
  order-insensitive aggregate of a correctly-rounded elementwise division,
  so it is bit-identical across engines with no fixed-point detour;
* "shipped late" (no commit/receipt dates) -> l_shipdate more than N days
  after o_orderdate.

Determinism: the conventions of plans/registry.py (fixed-point BIGINT sums
for float aggregates, identical aliases, driver sorts before hashing); every
LIMIT is preceded by a total order with a unique key suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daq_3i_spark.functions.numeric import fx_unscaled, fx_unscaled_sql
from daq_3i_spark.plans.registry import register
from daq_3i_spark.sources.tables import load_table


# --- TPC-H Q2: min-cost supplier per part (correlated MIN subquery) ----------


@register(
    "op_sql_q2_mincost",
    """WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'LARGE'
      GROUP BY 1, 2
    ), pmin AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY 1
    )
    SELECT s.s_acctbal, s.s_name, n.n_name,
           c.l_partkey AS p_partkey, c.unit_cost
    FROM cost c
    JOIN pmin m ON c.l_partkey = m.l_partkey AND c.unit_cost = m.min_cost
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p_partkey, s.s_suppkey
    LIMIT 100""",
    doc="TPC-H Q2 analog (partsupp := lineitem pairs, supplycost := min unit "
    "price): cheapest supplier(s) per LARGE part via the correlated-MIN "
    "pattern, realized as per-part min + exact double-equality join back "
    "(both mins aggregate the same correctly-rounded divisions, so equality "
    "is safe); part filter broadcast into the fact scan BEFORE the pair agg "
    "— the correlated subquery only ranges over the part's own suppliers, "
    "so pre-filtering is semantics-preserving and prunes 5/6 of the fact",
)
def op_sql_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # per-part minimum as a window over the SAME shuffle: cost is already
    # hash-partitioned by (l_partkey, l_suppkey); Catalyst still needs a
    # re-shuffle on l_partkey alone, so groupBy+join and window are one
    # exchange either way — the window keeps the plan single-branch (no
    # self-join re-scan of the aggregate)
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
            "s_suppkey",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
        .drop("s_suppkey")
    )


# --- TPC-H Q12: late shipments by priority class -----------------------------


@register(
    "op_sql_q12_lateships",
    """SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag""",
    doc="TPC-H Q12 analog (no shipmode/receiptdate: 'late' := shipped >60 "
    "days after order date, classes := l_returnflag): conditional priority "
    "counts over one year of late lines.  The year filter is pushed to the "
    "fact scan; the late predicate is a post-join filter (compares columns "
    "of both sides); counts are exact integer sums — timestamp + fixed "
    "day-interval arithmetic is identical in both engines",
)
def op_sql_q12_lateships(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# --- TPC-H Q20: qualified suppliers via nested semi-joins --------------------


@register(
    "op_sql_q20_dominant",
    f"""WITH pq AS (
      SELECT l_suppkey, l_partkey,
             SUM({fx_unscaled_sql('l_quantity')}) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ), dom AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, q, SUM(q) OVER (PARTITION BY l_partkey) AS t FROM pq
      ) WHERE 2 * q > t
    )
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name LIKE 'NATION\\_1%' ESCAPE '\\')""",
    doc="TPC-H Q20 analog (availqty test := dominant supplier — shipped more "
    "than half a PROMO part's 1997 volume): the double-nested IN chain "
    "becomes two semi-joins (dominant-supplier set, nation set), the "
    "correlated half-of-total threshold a window sum over the pair "
    "aggregate's own shuffle; quantity compare is exact fixed-point BIGINT "
    "(2*q > t), never floats",
)
def op_sql_q20_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    pq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(fx_unscaled(F.col("l_quantity"))).alias("q"))
    )
    dom = (
        pq.withColumn("t", F.sum("q").over(Window.partitionBy("l_partkey")))
        .filter(2 * F.col("q") > F.col("t"))
        .select("l_suppkey")
        .distinct()
    )
    # startswith, not LIKE: the '_' in the fixture prefix is a literal
    # underscore, and an unescaped LIKE '_' is a single-char wildcard
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").startswith("NATION_1")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey, "semi")
        .join(dom, F.col("s_suppkey") == dom.l_suppkey, "semi")
        .select("s_suppkey", "s_name")
    )


# --- TPC-H Q21: suppliers who kept orders waiting ----------------------------


@register(
    "op_sql_q21_waiting",
    """WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1, 2
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 10""",
    doc="TPC-H Q21 analog ('late' := shipped >90 days after order date on a "
    "finished order): sole-late-supplier detection in multi-supplier orders "
    "— the EXISTS becomes a left-semi join against the fact, the NOT EXISTS "
    "a left-anti join against the late set itself (equi on orderkey + "
    "inequality residual, so both stay hash-joinable); top-10 with unique "
    "suppkey tie-break",
)
def op_sql_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1, l2 = late.alias("l1"), li.alias("l2")
    l3 = late.alias("l3")
    waited = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "semi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        waited.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


# --- window-function breadth -------------------------------------------------


@register(
    "op_sql_window_suite",
    """SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           percent_rank() OVER w AS pr,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    doc="the window-function breadth sweep in one deterministic query: "
    "lag/lead, percent_rank (an exact small-integer ratio — portable), "
    "ntile, first_value, and full-frame last_value per customer order "
    "history, ordered by (date, orderkey) so every rank is total.  One "
    "shuffle on o_custkey serves all six functions (Spark collapses "
    "same-partitioning windows into one Window operator); partition sizes "
    "are orders-per-customer — bounded at any corpus scale",
)
def op_sql_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.percent_rank().over(w).alias("pr"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
    )


# --- RANGE-frame window: event-anchored trailing moving average ---------------


def _window_range_oracle() -> str:
    from daq_3i_spark.sources.daq_dims import dims_cte_sql

    return f"""WITH {dims_cte_sql()},
    b AS (
      SELECT channel_id, id, epoch_us(ts) AS ts_us,
             CAST(FLOOR((value) * 1e3 + 0.5) AS BIGINT) AS y
      FROM channel_data
    )
    SELECT channel_id, id, ts_us,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(CAST(sum(y) OVER w AS BIGINT) AS DOUBLE)
             / (CAST(count(*) OVER w AS DOUBLE) * 1e3) AS avg_1h
    FROM b
    WINDOW w AS (PARTITION BY channel_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""


@register(
    "op_sql_window_range",
    _window_range_oracle(),
    doc="the RANGE-frame window pattern (the registry's tumbling/sliding ops "
    "are bucket-aligned; this is the per-row, event-anchored form): each "
    "sample's trailing 1-hour moving average over its own channel — the "
    "'what was this sensor averaging over the last hour AS OF this "
    "reading' query a bucket window cannot answer without losing "
    "anchor alignment.  The frame is defined by ORDER-VALUE bounds "
    "(epoch-micros BIGINT), so timestamp ties get identical frames in "
    "both engines (peers are included by value, not position) and the "
    "result is order-insensitive by construction.  Exactness: milli "
    "fixed-point BIGINT sums (values <1e6 x 3600 one-hertz samples "
    "x 1e3 scale < 2^62), ONE correctly-rounded double division per "
    "row.  Plan: one shuffle on channel_id, one Window operator "
    "serving both frame aggregates (Spark collapses same-frame "
    "functions); the range frame runs as a single per-partition "
    "sort + sliding two-pointer pass — linear, spill-safe, and at "
    "100 TB the partition unit is a channel (bound history per "
    "channel by rollup/retention before this op if a single channel's "
    "full history exceeds an executor's sort budget)",
)
def op_sql_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.sources.daq_dims import channel_data_df

    cd = channel_data_df(spark, sf_dir)
    b = cd.select(
        "channel_id",
        "id",
        F.unix_micros("ts").alias("ts_us"),
        fx_unscaled(F.col("value"), scale=1e3).alias("y"),
    )
    w = (
        Window.partitionBy("channel_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    n = F.count("*").over(w).cast("bigint")
    return b.select(
        "channel_id",
        "id",
        "ts_us",
        n.alias("n_1h"),
        (
            F.sum("y").over(w).cast("double")
            / (n.cast("double") * F.lit(1e3))
        ).alias("avg_1h"),
    )
