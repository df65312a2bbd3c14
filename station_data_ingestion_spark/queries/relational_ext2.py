"""Final TPC-H query shapes: Q2, Q11, Q16, Q20, Q21.

The corpus has no partsupp table, so a partsupp-like relation is derived
on the fly: the distinct (part, supplier) pairs observed in lineitem with
min(extendedprice/quantity) as the unit-cost stand-in. This preserves
what each query shape exercises -- Q2's correlated min-per-group
subquery, Q11's group-vs-global value share, Q16's excluded-set distinct
count, Q20's doubly nested IN, Q21's multi-supplier exists/not-exists
pair -- while staying fully oracle-checkable.

Scale notes: the derived partsupp aggregates lineitem once (shuffle on
(partkey, suppkey)); min-per-part thresholds use window functions over
the already-shuffled aggregate rather than re-joining; the Q21
exists/not-exists pair is two semi/anti joins on the orderkey, sharing
one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import (
    load,
    money_sum_sql,
    query,
)

_PARTSUPP_SQL = """
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT))
           / SUM(CAST(l_quantity AS BIGINT)) AS ps_unitcost_scaled,
         SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
"""


def _partsupp(t):
    """Derived partsupp: unit cost as exact scaled-integer division.

    Integer sums (quantities are integer-valued, prices exact at 1e-4)
    keep the division operands bit-identical across engines.
    """
    li = t["lineitem"]
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long"))
            / F.sum(F.col("l_quantity").cast("long"))
        ).alias("ps_unitcost_scaled"),
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
    )


@query(
    "q2_min_cost_supplier",
    f"""
WITH {_PARTSUPP_SQL}
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
  JOIN partsupp ON p_partkey = ps_partkey
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND r_name = 'ASIA'
  AND ps_unitcost_scaled = (SELECT MIN(ps2.ps_unitcost_scaled)
                            FROM partsupp ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                                 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                                 JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                            WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: per-part minimum-cost supplier within a region -- the
    correlated min subquery becomes a rank-1 window over partkey."""
    t = load(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = t["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    parts = t["part"].filter(F.col("p_size") == 15)
    ps = (
        _partsupp(t)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    ps = ps.withColumn("min_cost", F.min("ps_unitcost_scaled").over(w)).filter(
        F.col("ps_unitcost_scaled") == F.col("min_cost")
    )
    return ps.join(
        F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey")
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")


@query(
    "q11_important_stock_share",
    f"""
WITH {_PARTSUPP_SQL},
nation_ps AS (
  SELECT ps_partkey,
         SUM(CAST(ROUND(ps_unitcost_scaled * ps_availqty) AS BIGINT)) AS value_scaled
  FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY ps_partkey
)
SELECT ps_partkey, ROUND(value_scaled / 10000, 2) AS part_value
FROM nation_ps
WHERE value_scaled > (SELECT 0.002 * SUM(value_scaled) FROM nation_ps)
""",
)
def q11_important_stock_share(spark, sf_dir):
    """Q11 shape: parts whose stock value exceeds a fraction of the
    nation's total -- group aggregate + global-scalar threshold."""
    t = load(spark, sf_dir)
    nat = t["nation"].filter(F.col("n_name") == "NATION_3")
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    ps = _partsupp(t).join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    # per-addend integer rounding -> exact bigint sums (registry rule 1:
    # a raw double sum varies in the last bits with accumulation order)
    by_part = ps.groupBy("ps_partkey").agg(
        F.sum(
            F.round(F.col("ps_unitcost_scaled") * F.col("ps_availqty")).cast("long")
        ).alias("value_scaled")
    )
    total = by_part.agg(F.sum("value_scaled").alias("_total"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_scaled") > 0.002 * F.col("_total"))
        .select(
            "ps_partkey", F.round(F.col("value_scaled") / 10000, 2).alias("part_value")
        )
    )


@query(
    "q16_supplier_part_counts",
    f"""
WITH {_PARTSUPP_SQL}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """Q16 shape: distinct supplier counts per part group, with an
    excluded supplier set (NOT IN -> anti join on a broadcast set)."""
    t = load(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    return (
        _partsupp(t)
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_stock_suppliers",
    f"""
WITH {_PARTSUPP_SQL}
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > 50
  )
""",
)
def q20_excess_stock_suppliers(spark, sf_dir):
    """Q20 shape: doubly nested IN -- parts by name prefix, partsupp rows
    above a stock threshold, suppliers in a nation. Two stacked semi
    joins, every inner side broadcast."""
    t = load(spark, sf_dir)
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    ps = (
        _partsupp(t)
        .filter(F.col("ps_availqty") > 50)
        .join(
            F.broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("ps_suppkey")
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_3")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(ps), F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q21_waiting_suppliers",
    """
WITH late AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  WHERE l_shipdate > TIMESTAMP '1999-01-01'
),
multi AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) > 1
),
sole_late AS (
  SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey FROM late
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole_late
  JOIN multi ON sole_late.l_orderkey = multi.l_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape (commitdate -> late shipdate): suppliers who were the
    ONLY late shipper on a multi-supplier order. The exists/not-exists
    pair collapses into per-order aggregates sharing one orderkey
    shuffle, then a broadcast supplier lookup."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"]
    late = li.filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    ).select("l_orderkey", "l_suppkey")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nl"),
            F.min("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("nl") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole_late.join(multi, "l_orderkey")
        .join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of customers by order count, keeping
    zero-order customers via the left outer join. (The reference corpus
    has no o_comment column, so Q13's NOT LIKE filter is omitted; the
    shape exercised is the left join + two-level aggregation.)

    Scale: the inner count shuffles on c_custkey; the outer histogram
    aggregates the already-small per-customer counts (partial map-side
    combine makes the second shuffle tiny).
    """
    t = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "agg_stats_moments",
    """
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_qty,
       ROUND(COVAR_SAMP(l_quantity, l_linenumber), 6) AS covar_qty_line,
       ROUND(CORR(l_quantity, l_linenumber), 6) AS corr_qty_line
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats_moments(spark, sf_dir):
    """Statistical aggregates: stddev/covariance/correlation per group.

    Uses the integer-valued columns (quantity, linenumber) so the
    moment sums are exact in both engines; rounding to 6 decimals
    absorbs the last-bit difference of the engines' final division
    order. (corr/covar can't use the scaled-bigint trick -- squared
    price terms overflow int64 -- hence the integer-column choice.)
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    q, ln = F.col("l_quantity"), F.col("l_linenumber")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(q), 6).alias("avg_qty"),
        F.round(F.stddev_samp(q), 6).alias("stddev_qty"),
        F.round(F.covar_samp(q, ln), 6).alias("covar_qty_line"),
        F.round(F.corr(q, ln), 6).alias("corr_qty_line"),
    )
