"""Relational core: scans, filters, joins, aggregations (TPC-H-flavored).

These exercise the engine surface SURVEY.md §2.9 requires: inner/semi/anti
joins (broadcast for small dims), group-by aggregation, distinct,
rollup/cube, top-k with total order.

Scale notes: region/nation/supplier are classic broadcast dims -- the
`broadcast()` hints keep the big fact scans shuffle-free on the dim side;
fact-fact joins (orders x lineitem) shuffle once on the join key and AQE
handles skew. Filters are expressed directly on scan columns so Catalyst
pushes them into the parquet reader (verified via explain in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import (
    load,
    money_sum,
    money_sum_sql,
    query,
)

# --- Q1-style pricing summary -------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty,
       {money_sum_sql('l_extendedprice')} AS sum_base_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {money_sum_sql('l_quantity')} / COUNT(*) AS avg_qty,
       {money_sum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
       {money_sum_sql('l_discount', 6)} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan aggregate with map-side partial combine."""
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("sum_charge"),
        (money_sum(F.col("l_quantity")) / cnt).alias("avg_qty"),
        (money_sum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
        (money_sum(F.col("l_discount"), 6) / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# --- Q3-style shipping priority (join + top-k with total order) ---------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark, sf_dir):
    """Fact-fact join + broadcast dim filter + deterministic top-10."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        t["orders"]
        .filter(F.col("o_orderdate") < cutoff)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- Q5-style local supplier revenue ------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("q5_local_supplier_revenue", _Q5_ORACLE)
def q5_local_supplier_revenue(spark, sf_dir):
    """Six-way join; all dims broadcast, facts shuffle once on orderkey."""
    t = load(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- Q6-style forecast revenue (pure pushed-down filter + scalar agg) ---------

_Q6_ORACLE = f"""
SELECT {money_sum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark, sf_dir):
    """Every predicate reaches the parquet scan (PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q10-style returned-item customer ranking ---------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       n_name
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", _Q10_ORACLE)
def q10_returned_revenue(spark, sf_dir):
    """Returned-items revenue per customer; deterministic top-20."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- distinct / rollup / cube -------------------------------------------------


@query(
    "agg_distinct_suppliers",
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_distinct_suppliers(spark, sf_dir):
    """Multi-distinct aggregation (expand + two-phase shuffle in Spark)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "rollup_flag_status",
    f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_flag_status(spark, sf_dir):
    """ROLLUP grouping sets (subtotals + grand total with NULL markers)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_status_priority",
    f"""
SELECT o_orderstatus, o_orderpriority,
       {money_sum_sql('o_totalprice')} AS total, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark, sf_dir):
    """CUBE over two low-cardinality dims."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        money_sum(F.col("o_totalprice")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


# --- semi / anti joins --------------------------------------------------------


@query(
    "semi_join_active_customers",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def semi_join_active_customers(spark, sf_dir):
    """LEFT SEMI join (EXISTS)."""
    t = load(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_customers_without_orders",
    """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers_without_orders(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS)."""
    t = load(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "subquery_above_avg_parts",
    """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
""",
)
def subquery_above_avg_parts(spark, sf_dir):
    """Uncorrelated scalar subquery -> broadcast scalar join + filter.

    The one-row aggregate broadcasts against the scan (no driver-side
    collect: the plan stays fully lazy, the right shape at 100 TB).
    The comparison reuses the engines' native AVG double -- safe because
    it's a filter threshold over well-separated values, and both engines
    see identical input doubles.
    """
    p = load(spark, sf_dir, "part")["part"]
    avg_price = p.agg(F.avg("p_retailprice").alias("_avg"))
    return (
        p.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("_avg"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@query(
    "left_outer_order_counts",
    """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       COALESCE({ms}, 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""".format(ms=money_sum_sql("o_totalprice")),
)
def left_outer_order_counts(spark, sf_dir):
    """LEFT OUTER join preserving order-less customers, then aggregate."""
    t = load(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )
