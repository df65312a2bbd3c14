"""Extended relational coverage: the remaining TPC-H query shapes.

The synthetic corpus (TESTDATA.md) omits some TPC-H columns (no partsupp
table, no l_commitdate/l_shipmode, no c_phone), so each query keeps the
*shape* -- the operator composition TPC-H exercises -- re-targeted at the
columns that exist. Together with relational.py this covers: correlated
EXISTS with non-equi conditions (Q4), nation-pair multi-joins with year
rollups (Q7), market-share conditional aggregation (Q8), profit by
nation/year (Q9), conditional class counts (Q12), promo revenue ratio
(Q14), top-revenue-supplier via window max (Q15), correlated per-group
average threshold (Q17), having-filtered in-subquery (Q18), disjunctive
OR-of-ANDs join pushdown (Q19), and anti-join + scalar-subquery customer
analysis (Q22).

Scale notes: every dim side is broadcast; fact-fact joins shuffle once on
the orderkey; conditional aggregation (Q8/Q12/Q14) is a single pass --
no self-joins; Q15/Q17 use window functions over one shuffle instead of
re-scanning to compute the max/avg.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import (
    load,
    money_sum,
    money_sum_sql,
    query,
)

_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q4_late_ship_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q4_late_ship_priority(spark, sf_dir):
    """Q4 shape: correlated EXISTS with a non-equi date condition ->
    left-semi join carrying both the equi key and the range predicate."""
    t = load(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t["lineitem"]
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_nation_pair_volume",
    f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {money_sum_sql(_REV_SQL)} AS revenue
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY sn.n_name, cn.n_name, l_year
""",
)
def q7_nation_pair_volume(spark, sf_dir):
    """Q7 shape: bidirectional nation-pair revenue by ship year; both
    nation lookups broadcast, the pair filter applied post-join."""
    t = load(spark, sf_dir)
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(money_sum(_rev()).alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND({_REV_SQL} * 10000) AS BIGINT) AS v,
         sn.n_name AS supp_nation
  FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'PROMO'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
             / SUM(v), 6) AS mkt_share
FROM vol GROUP BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """Q8 shape: one nation's revenue share of PROMO parts per year --
    conditional aggregation in a single pass over the joined facts."""
    t = load(spark, sf_dir)
    promo = t["part"].filter(F.col("p_type") == "PROMO")
    v = F.round(_rev() * 10000).cast("long")
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", v).otherwise(0)).cast(
                    "double"
                )
                / F.sum(v),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_profit_by_nation_year",
    f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {money_sum_sql(f'{_REV_SQL} - l_quantity * 10')} AS profit
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
)
def q9_profit_by_nation_year(spark, sf_dir):
    """Q9 shape: profit (revenue minus a per-unit cost stand-in, since the
    corpus has no ps_supplycost) by supplier nation and order year."""
    t = load(spark, sf_dir)
    red = t["part"].filter(F.col("p_name").like("%red%"))
    profit = _rev() - F.col("l_quantity") * 10
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(money_sum(profit).alias("profit"))
    )


@query(
    "q12_priority_ship_classes",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
""",
)
def q12_priority_ship_classes(spark, sf_dir):
    """Q12 shape (shipmode -> returnflag): conditional priority-class
    counts in one aggregation pass, no pivot or self-join."""
    t = load(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    f"""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(ROUND({_REV_SQL} * 10000) AS BIGINT)
                              ELSE 0 END)
             / SUM(CAST(ROUND({_REV_SQL} * 10000) AS BIGINT)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q14_promo_revenue_ratio(spark, sf_dir):
    """Q14 shape: promo share of one month's revenue; part dim broadcast,
    ratio of two exact integer sums for cross-engine determinism."""
    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    v = F.round(_rev() * 10000).cast("long")
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", v).otherwise(0))
                / F.sum(v),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {money_sum_sql(_REV_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark, sf_dir):
    """Q15 shape: quarter revenue per supplier, keep the max.

    The max is a 1-row aggregate broadcast back against the revenue
    frame (the scalar-subquery pattern, mirroring the oracle's MAX
    subquery) -- NOT a global rank window, which would sort every
    supplier's aggregate onto one partition at scale."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_rev()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("__mx")
    ).drop("__mx")
    return (
        F.broadcast(top)
        .join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    f"""
SELECT {money_sum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = part.p_partkey)
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Q17 shape: correlated per-part average threshold via a window
    average over partkey -- one shuffle, no re-join of lineitem.

    Safe cross-engine: quantities are integer-valued doubles, so sum and
    count are exact and the 0.2*avg threshold is bit-identical."""
    t = load(spark, sf_dir, "lineitem", "part")
    brand = t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn("avg_qty", F.avg("l_quantity").over(w))
    return flagged.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (money_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
    )


@query(
    "q18_large_volume_customers",
    f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {money_sum_sql('l_quantity')} AS total_qty
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
""",
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING-filtered in-subquery -> aggregate once, semi-join
    the qualifying orderkeys back (broadcast: the qualifier set is tiny)."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 180)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(
            F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
            F.col("o_orderkey") == F.col("bk"),
            "left_semi",
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
    )


@query(
    "q19_disjunctive_brand_revenue",
    f"""
SELECT {money_sum_sql(_REV_SQL)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
""",
)
def q19_disjunctive_brand_revenue(spark, sf_dir):
    """Q19 shape: OR-of-ANDs spanning both join sides. Catalyst extracts
    the per-side common disjuncts (brand/size to the part scan, quantity
    to the lineitem scan) so both scans stay filtered despite the OR."""
    t = load(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & (q >= 10)
            & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & (q >= 20)
            & (q <= 40)
        )
    )
    return j.filter(clause).agg(money_sum(_rev()).alias("revenue"))


@query(
    "q22_idle_rich_customers",
    """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_custkey % 7 AS BIGINT) AS cust_group,
       COUNT(*) AS numcust,
       SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cust_group
""",
)
def q22_idle_rich_customers(spark, sf_dir):
    """Q22 shape (cntrycode -> custkey bucket): above-average balance and
    no recent orders -- scalar subquery threshold + anti join, then
    aggregate. (Every customer in the corpus has *some* order, so the
    anti join is against the recent-order subset.)

    The AVG threshold compares doubles computed from identical inputs in
    both engines; acctbal sums use the exact-integer cents pattern."""
    t = load(spark, sf_dir, "customer", "orders")
    c = t["customer"]
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .drop("_ab")
        .join(
            t["orders"].filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_custkey") % 7).cast("long").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0).alias(
                "totacctbal"
            ),
        )
    )


@query(
    "sql_grouping_sets",
    f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def sql_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS through the spark.sql entry path (the SQL
    API twin of rollup/cube): one Expand node, single aggregation pass."""
    load(spark, sf_dir, "lineitem")["lineitem"].createOrReplaceTempView("lineitem")
    # 10000.0 would parse as DECIMAL in Spark SQL (decimal division result);
    # cast to DOUBLE to match the DataFrame-API / DuckDB double semantics
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) / CAST(10000 AS DOUBLE)
                 AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "sql_group_by_all",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
""",
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL (Spark 3.4+/4 SQL ergonomics, DuckDB-native too):
    the grouping key set is inferred as every non-aggregate select
    item — the oracle runs the IDENTICAL syntax, so this certifies the
    inference rule agrees across engines, not just the aggregate."""
    load(spark, sf_dir, "orders")["orders"].createOrReplaceTempView(
        "orders_gba"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders_gba
        GROUP BY ALL
        """
    )


@query(
    "sql_identifier_parameterized",
    """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def sql_identifier_parameterized(spark, sf_dir):
    """Parameterized SQL with the IDENTIFIER() clause (Spark 4): the
    table AND grouping column arrive as NAMED PARAMETERS, not string
    interpolation — injection-safe templating for the multi-tenant
    'same query over N tables' pattern (the reference's per-station
    config templating, F5, lifted to SQL). The oracle is the resolved
    plain query."""
    load(spark, sf_dir, "orders")["orders"].createOrReplaceTempView(
        "orders_idf"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS status,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM IDENTIFIER(:tbl) GROUP BY IDENTIFIER(:col)
        """,
        args={"tbl": "orders_idf", "col": "o_orderstatus"},
    )


@query(
    "sql_lateral_column_alias",
    """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS dollars,
       (CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) * 110 // 100
         AS with_tax
FROM orders WHERE o_orderkey % 1000 = 7
""",
)
def sql_lateral_column_alias(spark, sf_dir):
    """LATERAL COLUMN ALIASES (Spark 3.4+): a select item references a
    SIBLING alias (`dollars` built from `cents`, `with_tax` from
    `dollars`) instead of repeating the expression — the oracle spells
    the expansion out, certifying Spark's alias resolution produces the
    identical integer arithmetic chain."""
    load(spark, sf_dir, "orders")["orders"].createOrReplaceTempView(
        "orders_lca"
    )
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               cents DIV 100 AS dollars,
               dollars * 110 DIV 100 AS with_tax
        FROM orders_lca WHERE o_orderkey % 1000 = 7
        """
    )
