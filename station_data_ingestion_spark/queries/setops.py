"""Set operations + sorts/limits + pivot/unpivot reshape queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, money_sum_sql, query


@query(
    "setop_union_buyers",
    """
SELECT o_custkey AS custkey, 'early' AS cohort FROM orders
WHERE o_orderdate < TIMESTAMP '1996-01-01'
UNION ALL
SELECT o_custkey AS custkey, 'late' AS cohort FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
""",
)
def setop_union_buyers(spark, sf_dir):
    """UNION ALL of two labeled cohorts."""
    o = load(spark, sf_dir, "orders")["orders"]
    early = o.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey"), F.lit("early").alias("cohort")
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey"), F.lit("late").alias("cohort")
    )
    return early.unionAll(late)


@query(
    "setop_intersect_repeat_buyers",
    """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
""",
)
def setop_intersect_repeat_buyers(spark, sf_dir):
    """INTERSECT (distinct) of two cohorts."""
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "setop_except_lapsed_buyers",
    """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
""",
)
def setop_except_lapsed_buyers(spark, sf_dir):
    """EXCEPT (distinct): early buyers who never came back."""
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # EXCEPT DISTINCT semantics


@query(
    "sort_topn_expensive_orders",
    """
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
)
def sort_topn_expensive_orders(spark, sf_dir):
    """Global top-N: Spark runs TakeOrderedAndProject, no full sort."""
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "unpivot_lineitem_measures",
    """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
WHERE l_orderkey % 100 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS val
FROM lineitem WHERE l_orderkey % 100 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS val FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def unpivot_lineitem_measures(spark, sf_dir):
    """unpivot (wide->long), the reference's core reshape [R1/R2] applied
    to the fact table; oracle is the portable UNION ALL form."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .withColumnsRenamed(
            {"l_quantity": "quantity", "l_extendedprice": "extendedprice", "l_discount": "discount"}
        )
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["quantity", "extendedprice", "discount"],
            variableColumnName="measure",
            valueColumnName="val",
        )
    )


@query(
    "pivot_status_by_priority",
    f"""
SELECT o_orderpriority,
       {money_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS total_f,
       {money_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS total_o,
       {money_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS total_p
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark, sf_dir):
    """pivot (long->wide): totals per status column, per priority row."""
    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 10000).cast("long")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(cents))
        # a (priority, status) cell with NO rows is NULL after pivot (the
        # agg never runs for it); the oracle's conditional SUM yields 0
        .na.fill(0, ["F", "O", "P"])
    )
    return piv.select(
        "o_orderpriority",
        (F.col("F") / 10000.0).alias("total_f"),
        (F.col("O") / 10000.0).alias("total_o"),
        (F.col("P") / 10000.0).alias("total_p"),
    )


@query(
    "setop_except_all_multiset",
    """
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'P'),
b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT o_custkey, COUNT(*) AS n
FROM (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
GROUP BY o_custkey
""",
)
def setop_except_all_multiset(spark, sf_dir):
    """EXCEPT ALL multiset semantics: each row's multiplicity is
    max(count_a - count_b, 0) — bag difference, not set difference
    (exceptAll vs except). Counted per key so the multiset itself is
    what the gate hashes."""
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_orderstatus") != "P").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b).groupBy("o_custkey").agg(F.count("*").alias("n"))


@query(
    "sort_multi_key_mixed_order",
    """
SELECT o_orderkey, o_orderpriority, CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 50
""",
)
def sort_multi_key_mixed_order(spark, sf_dir):
    """Mixed-direction multi-key top-k (ASC, DESC, ASC tiebreak) — one
    TakeOrderedAndProject, never a full sort; the unique key tiebreak
    makes the LIMIT deterministic cross-engine."""
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("price").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
    )
