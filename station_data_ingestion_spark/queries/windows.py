"""Window functions: ranking, running totals, lag/lead, top-k per group.

Scale notes: every window partitions on a high-cardinality key (custkey,
brand) so the shuffle spreads evenly; none partition on a constant (the
classic single-partition window trap). Top-k per group uses row_number +
filter -- Spark pushes a per-partition top-k (WindowGroupLimit) down the
sort at execution.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "window_topk_parts_per_brand",
    """
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part) WHERE rk <= 3
""",
)
def window_topk_parts_per_brand(spark, sf_dir):
    """Top-3 priciest parts per brand (total order via p_partkey tiebreak)."""
    p = load(spark, sf_dir, "part")["part"]
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@query(
    "window_running_customer_spend",
    """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
           AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
)
def window_running_customer_spend(spark, sf_dir):
    """Running total per customer (exact-integer accumulation for
    cross-engine determinism) + order sequence number."""
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        (F.sum(F.round(F.col("o_totalprice") * 10000).cast("long")).over(wsum) / 10000.0).alias(
            "running_spend"
        ),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_lag_order_gap",
    """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
""",
)
def window_lag_order_gap(spark, sf_dir):
    """LAG: days between consecutive orders of each customer."""
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@query(
    "window_rank_dense_ntile",
    """
SELECT s_suppkey, s_acctbal,
       RANK() OVER (ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC, s_suppkey) AS bal_rank,
       DENSE_RANK() OVER (ORDER BY CAST(s_acctbal >= 0 AS INT) DESC) AS sign_dense,
       NTILE(4) OVER (ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC, s_suppkey) AS quartile
FROM supplier
""",
)
def window_rank_dense_ntile(spark, sf_dir):
    """rank / dense_rank / ntile on a global (small-table) window."""
    s = load(spark, sf_dir, "supplier")["supplier"]
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    w_rank = Window.orderBy(cents.desc(), F.col("s_suppkey"))
    w_sign = Window.orderBy((F.col("s_acctbal") >= 0).cast("int").desc())
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w_rank).alias("bal_rank"),
        F.dense_rank().over(w_sign).alias("sign_dense"),
        F.ntile(4).over(w_rank).alias("quartile"),
    )


@query(
    "window_range_frame_trailing_spend",
    """
SELECT o_orderkey,
       SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
         / 10000.0 AS trailing30_spend
FROM orders
""",
)
def window_range_frame_trailing_spend(spark, sf_dir):
    """RANGE frame over event time: per customer, total order value in
    the trailing 30 days (inclusive of ties on the same timestamp --
    RANGE, not ROWS). Spark's rangeBetween takes the ORDER BY value's
    numeric distance, so the timestamp is ordered as epoch seconds;
    exact-integer money sums keep the division bit-identical.

    Scale: one shuffle on o_custkey; the frame is evaluated with a
    sliding aggregate over each sorted partition, no re-scan per row.
    """
    o = load(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        # o_orderdate is TIMESTAMP_NTZ; the session tz is pinned UTC
        # (session.py), so the epoch-second order value is tz-safe.
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    spend = F.sum(F.round(F.col("o_totalprice") * 10000).cast("long")).over(w)
    return o.select(
        "o_orderkey", (spend / 10000.0).alias("trailing30_spend")
    )


@query(
    "window_rank_null_ordering",
    """
WITH x AS (
  SELECT event_id, event_type,
         NULLIF(TRY_CAST(props->>'$.k' AS BIGINT) % 7, 0) AS k
  FROM events WHERE event_id % 50 = 0
)
SELECT event_id, event_type, k,
       RANK() OVER (PARTITION BY event_type
                    ORDER BY k ASC NULLS FIRST, event_id) AS rk_nf,
       RANK() OVER (PARTITION BY event_type
                    ORDER BY k DESC NULLS LAST, event_id) AS rk_nl
FROM x
""",
)
def window_rank_null_ordering(spark, sf_dir):
    """Null-ordering semantics pinned EXPLICITLY on both engines: Spark
    defaults to NULLS FIRST for ASC while DuckDB defaults to NULLS LAST,
    so any nullable sort key in a window/sort must state its null
    position or ranks silently diverge. Nulls are planted
    deterministically (k % 7 == 0 -> null) since the corpus extraction
    itself is never null."""
    e = load(spark, sf_dir, "events")["events"].filter(F.col("event_id") % 50 == 0)
    k = F.nullif(F.get_json_object("props", "$.k").cast("long") % 7, F.lit(0))
    x = e.select("event_id", "event_type", k.alias("k"))
    w_nf = Window.partitionBy("event_type").orderBy(
        F.col("k").asc_nulls_first(), F.col("event_id")
    )
    w_nl = Window.partitionBy("event_type").orderBy(
        F.col("k").desc_nulls_last(), F.col("event_id")
    )
    return x.select(
        "event_id",
        "event_type",
        "k",
        F.rank().over(w_nf).alias("rk_nf"),
        F.rank().over(w_nl).alias("rk_nl"),
    )


@query(
    "window_topk_two_phase",
    """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey
         ) AS rk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, cents, rk FROM ranked WHERE rk <= 5
""",
)
def window_topk_two_phase(spark, sf_dir):
    """Grouped top-k via the two-phase partial operator
    (operators/topk.py): per-partition Arrow pass discards
    non-contenders BEFORE the exchange (survivors <= partitions x
    groups x k instead of every row), final window ranks the sliver —
    result identical to the full row_number window, which is exactly
    what the oracle computes."""
    from station_data_ingestion_spark.operators.topk import grouped_topk

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return grouped_topk(
        o,
        group_cols=["o_orderpriority"],
        order_cols=[("cents", True), ("o_orderkey", False)],
        k=5,
    )


@query(
    "window_range_exclude_current",
    """
SELECT event_id,
       CAST(SUM(cents) OVER (
         PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND 3600 FOLLOWING
         EXCLUDE CURRENT ROW
       ) AS BIGINT) AS neighbor_cents
FROM (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 10000) AS BIGINT) AS cents
  FROM events
)
""",
)
def window_range_exclude_current(spark, sf_dir):
    """RANGE frame with EXCLUDE CURRENT ROW — a frame modifier Spark
    lacks — emulated as (range sum - own value), with the empty-frame
    corner made exact: when the current row is its frame's ONLY row the
    result must be NULL (DuckDB's native EXCLUDE semantics), not 0, so
    the emulation guards on the frame count. Peers at the same ordering
    value stay included on both engines (EXCLUDE CURRENT ROW, not
    EXCLUDE GROUP)."""
    e = load(spark, sf_dir, "events")["events"].select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 10000).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, 3600)
    )
    in_frame = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        F.when(
            in_frame > 1, F.sum("cents").over(w) - F.col("cents")
        ).alias("neighbor_cents"),
    )


@query(
    "window_count_distinct_frame",
    """
SELECT event_id, user_id,
       COUNT(DISTINCT event_type)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS n_types_so_far
FROM events
""",
)
def window_count_distinct_frame(spark, sf_dir):
    """Running DISTINCT count over a window frame — Spark has no
    COUNT(DISTINCT) OVER (DuckDB does, which makes the oracle honestly
    independent). Emulated scalably: flag each (user, event_type)'s
    FIRST occurrence with one row_number window, then a running SUM of
    flags over the user's timeline — two windows on the same
    high-cardinality user_id partitioning (one shuffle, AQE reuses the
    exchange), never a per-row set state like size(collect_set) OVER,
    whose per-row set copies go quadratic on hot keys at scale."""
    ev = load(spark, sf_dir, "events")["events"]
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_run).alias("n_types_so_far"),
    )
