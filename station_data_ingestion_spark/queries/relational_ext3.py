"""Aggregate/window/semantics breadth: round-4 surface widening.

Families the registry did not yet cover, each a thin veneer over Spark
built-ins with a DuckDB oracle twin:

- ordered string aggregation (listagg), exact percentile interpolation
- correlation / covariance / least-squares regression aggregates
- FILTER-clause conditional aggregation (count_if / sum-where)
- NOT IN subquery semantics vs anti-join (the null-semantics trap)
- percent_rank / cume_dist and first/last/nth_value window functions

Determinism: string aggs are explicitly sorted; float statistics are
rounded (6dp) to absorb accumulation-order drift; everything else is
integer-exact. [reference: none — SURVEY §2.9 marks the general query
surface as engine-provided.]
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "agg_listagg_sorted",
    """
SELECT r.r_name AS region,
       COUNT(*) AS n_nations,
       string_agg(n.n_name, '|' ORDER BY n.n_name) AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def agg_listagg_sorted(spark, sf_dir):
    """Ordered string aggregation: collect_list -> array_sort ->
    array_join is the distributed listagg (collect order is
    partition-dependent; the sort makes it deterministic)."""
    t = load(spark, sf_dir, "nation", "region")
    return (
        t["nation"]
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
        )
    )


@query(
    "agg_exact_percentiles",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       ROUND(MAX(o_totalprice), 4) AS mx
FROM orders GROUP BY o_orderpriority
""",
)
def agg_exact_percentiles(spark, sf_dir):
    """EXACT percentile_cont (linear interpolation) — both engines use
    the same definition, so values agree to float precision; rounded to
    absorb the last bit. approx_percentile is the 100 TB path (its exact
    twin here is the oracle anchor)."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.round(F.max("o_totalprice"), 4).alias("mx"),
    )


@query(
    "agg_corr_regression",
    """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_vh,
       ROUND(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh,
       ROUND(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
       ROUND(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 4) AS intercept
FROM events GROUP BY event_type
""",
)
def agg_corr_regression(spark, sf_dir):
    """Statistical aggregates: corr / covar_samp / least-squares
    regression. Partial-aggregable (sums of products), so they scale as
    one map-side-combined shuffle; 6dp rounding absorbs the
    accumulation-order drift inherent to float sums."""
    e = load(spark, sf_dir, "events")["events"]
    h = F.hour("ts").cast("double")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.corr("value", h), 6).alias("corr_vh"),
        F.round(F.covar_samp("value", h), 4).alias("covar_vh"),
        F.round(F.regr_slope(F.col("value"), h), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), h), 4).alias("intercept"),
    )


@query(
    "agg_filtered_conditional",
    """
SELECT n.n_name AS nation,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'P') AS n_p,
       SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
           FILTER (WHERE o.o_orderpriority = '1-URGENT') / 100.0
           AS urgent_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_filtered_conditional(spark, sf_dir):
    """FILTER-clause aggregation == sum(when(...)): one pass computes
    every conditional branch — the Spark idiom that replaces N filtered
    self-joins with zero extra shuffles."""
    t = load(spark, sf_dir, "orders", "customer", "nation")
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )

    def cnt(status):
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    urgent = F.sum(
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.round(F.col("o_totalprice") * 100).cast("long"),
        )
    ) / 100.0
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        cnt("F").alias("n_f"),
        cnt("O").alias("n_o"),
        cnt("P").alias("n_p"),
        urgent.alias("urgent_revenue"),
    )


@query(
    "setop_not_in_vs_antijoin",
    """
SELECT n.n_name AS nation, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders
                          WHERE o_orderstatus = 'P')
GROUP BY n.n_name
""",
)
def setop_not_in_vs_antijoin(spark, sf_dir):
    """NOT IN compiled as LEFT ANTI join — valid ONLY because o_custkey
    is non-null in the subquery; with nullable values NOT IN yields
    empty (three-valued logic) while anti-join does not. The docstring
    is the contract: the engine's NOT IN path null-checks before
    choosing the anti-join plan (here guaranteed by the key column)."""
    t = load(spark, sf_dir, "customer", "orders", "nation")
    p_buyers = (
        t["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey")
    )
    return (
        t["customer"]
        .join(p_buyers, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "window_percent_rank_cume_dist",
    """
SELECT s_suppkey, n_name AS nation,
       ROUND(s_acctbal, 2) AS acctbal,
       ROUND(percent_rank() OVER w, 6) AS pr,
       ROUND(cume_dist() OVER w, 6) AS cd
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal)
""",
)
def window_percent_rank_cume_dist(spark, sf_dir):
    """Relative-rank window functions per nation partition; both engines
    share the textbook definitions ((rank-1)/(n-1), rank_le/n), so values
    agree exactly even under acctbal ties."""
    t = load(spark, sf_dir, "supplier", "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal")
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            F.col("n_name").alias("nation"),
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
    )


@query(
    "window_first_last_nth_value",
    """
SELECT p_brand,
       p_partkey,
       first_value(p_name) OVER w AS cheapest,
       last_value(p_name) OVER w AS priciest,
       nth_value(p_name, 2) OVER w AS runner_up
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_last_nth_value(spark, sf_dir):
    """first/last/nth_value with an explicit full-partition frame (the
    default frame stops at CURRENT ROW, silently making last_value a
    no-op — the classic window-frame trap). Order includes the unique
    p_partkey so ties can't flip results between engines."""
    p = load(spark, sf_dir, "part")["part"]
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return p.select(
        "p_brand",
        "p_partkey",
        F.first("p_name").over(w).alias("cheapest"),
        F.last("p_name").over(w).alias("priciest"),
        F.nth_value("p_name", 2).over(w).alias("runner_up"),
    )


@query(
    "profile_orders_columns",
    """
SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
       MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_totalprice_cents', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
       CAST(CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate), strftime(MIN(o_orderdate), '%Y-%m-%d'),
       strftime(MAX(o_orderdate), '%Y-%m-%d')
FROM orders
""",
)
def profile_orders_columns(spark, sf_dir):
    """Table profiling (the ANALYZE/Deequ shape): per-column null count,
    exact distinct count, and type-appropriate min/max — computed in ONE
    aggregation pass then unpivoted with stack(), where the oracle reads
    the table five times. Strings are compared raw; doubles as integer
    cents; dates formatted — so every cell is engine-exact."""
    o = load(spark, sf_dir, "orders")["orders"]
    agg = o.agg(
        F.count("*").alias("n"),
        *[
            x
            for c in (
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice", "o_orderdate",
            )
            for x in (
                F.count(c).alias(f"nn_{c}"),
                F.count_distinct(c).alias(f"nd_{c}"),
            )
        ],
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        F.min("o_orderpriority").alias("mn_pr"),
        F.max("o_orderpriority").alias("mx_pr"),
        F.round(F.min("o_totalprice") * 100).cast("long").cast("string").alias("mn_tp"),
        F.round(F.max("o_totalprice") * 100).cast("long").cast("string").alias("mx_tp"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn_dt"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx_dt"),
    )
    stack = """stack(5,
        'o_orderkey', n, n - nn_o_orderkey, nd_o_orderkey, mn_key, mx_key,
        'o_orderstatus', n, n - nn_o_orderstatus, nd_o_orderstatus, mn_st, mx_st,
        'o_orderpriority', n, n - nn_o_orderpriority, nd_o_orderpriority, mn_pr, mx_pr,
        'o_totalprice_cents', n, n - nn_o_totalprice, nd_o_totalprice, mn_tp, mx_tp,
        'o_orderdate', n, n - nn_o_orderdate, nd_o_orderdate, mn_dt, mx_dt
    ) as (col, n_rows, n_null, n_distinct, min_s, max_s)"""
    return agg.selectExpr(stack)


@query(
    "join_bloom_prefiltered_lineitems",
    """
WITH p AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM lineitem l JOIN p ON l.l_orderkey = p.o_orderkey
""",
)
def join_bloom_prefiltered_lineitems(spark, sf_dir):
    """Bloom-filter semi-join pre-filter (operators/bloom.py): lineitem
    rows stream through a broadcast Bloom filter of the 'P'-order keys
    before the exact join, so at scale the exchange carries candidates
    only. False positives are removed by the real join — the oracle IS
    the plain join."""
    from station_data_ingestion_spark.operators.bloom import bloom_semi_join

    t = load(spark, sf_dir, "lineitem", "orders")
    big = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    small = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_orderkey").alias("okey"))
        .distinct()
    )
    return bloom_semi_join(big, small, on="okey", how="inner").agg(
        F.count("*").alias("n_items"),
        F.sum("cents").alias("cents"),
    )


@query(
    "agg_median_absolute_deviation",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       ROUND(MIN(med.m), 4) AS median_v,
       ROUND(quantile_cont(ABS(e.value - med.m), 0.5), 4) AS mad
FROM events e JOIN med ON e.event_type = med.event_type
GROUP BY e.event_type
""",
)
def agg_median_absolute_deviation(spark, sf_dir):
    """Robust statistics: median absolute deviation — the two-pass
    median-of-residuals shape (per-group median joined back, then a
    second exact percentile). Both passes shuffle on the same group key;
    identical interpolation definitions keep it engine-exact at 4dp."""
    e = load(spark, sf_dir, "events")["events"]
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    return (
        e.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("m"), 4).alias("median_v"),
            F.round(
                F.expr("percentile(abs(value - m), 0.5)"), 4
            ).alias("mad"),
        )
    )


@query(
    "agg_value_histogram",
    """
WITH b AS (
  SELECT event_type,
         CASE WHEN value < 0 THEN 0
              WHEN value >= 250 THEN 11
              ELSE CAST(FLOOR(value / 25.0) AS INT) + 1 END AS bucket
  FROM events
)
SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY event_type, bucket
""",
)
def agg_value_histogram(spark, sf_dir):
    """Equi-width histogram: 10 buckets over [0, 250) plus the 0/11
    under/overflow buckets, stated as explicit floor arithmetic (this
    DuckDB build lacks width_bucket; explicit edges also remove any
    ambiguity about boundary ownership). One map-side-combined
    shuffle."""
    e = load(spark, sf_dir, "events")["events"]
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 250, 11)
        .otherwise(F.floor(F.col("value") / 25.0).cast("int") + 1)
    )
    return e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


@query(
    "agg_mode_deterministic",
    """
WITH c AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment AS mode_seg, n AS mode_n
FROM (SELECT c_nationkey, c_mktsegment, n,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY n DESC, c_mktsegment) AS rk
      FROM c) WHERE rk = 1
""",
)
def agg_mode_deterministic(spark, sf_dir):
    """Mode with a DETERMINISTIC tie-break (smallest value among the
    most frequent) — plain mode() is free to pick any tied value, which
    can never pass a cross-engine gate. count -> argmin over
    (-n, value): two shuffles on the same key."""
    c = load(spark, sf_dir, "customer")["customer"]
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    return counts.groupBy("c_nationkey").agg(
        F.min_by(
            "c_mktsegment", F.struct(-F.col("n"), F.col("c_mktsegment"))
        ).alias("mode_seg"),
        F.max("n").alias("mode_n"),
    )


@query(
    "window_ratio_to_report",
    """
WITH rev AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name
)
SELECT nation, region, cents,
       ROUND(CAST(cents AS DOUBLE)
             / SUM(cents) OVER (PARTITION BY region), 8) AS region_share
FROM rev
""",
)
def window_ratio_to_report(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue via
    a window SUM over the aggregated (25-row) frame — the numerator
    aggregation did the heavy lifting, so the window input is dimension-
    sized. Integer cents make the shares engine-exact before rounding."""
    t = load(spark, sf_dir, "orders", "customer", "nation", "region")
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "nation",
        "region",
        "cents",
        F.round(F.col("cents").cast("double") / F.sum("cents").over(w), 8).alias(
            "region_share"
        ),
    )


@query(
    "agg_multi_distinct",
    """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def agg_multi_distinct(spark, sf_dir):
    """Multiple DISTINCT aggregates over different columns in one query
    — the planner's Expand shape (each row replicated per distinct
    group): one logical pass instead of three self-joined subqueries."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
        F.count_distinct(F.to_date("o_orderdate")).alias("n_days"),
        F.count("*").alias("n_orders"),
    )


@query(
    "join_full_outer_coalesced",
    """
WITH buyers AS (
  SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
),
rich AS (
  SELECT c_custkey AS k, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal > 7500
)
SELECT COALESCE(b.k, r.k) AS custkey,
       COALESCE(b.n_orders, 0) AS n_orders,
       COALESCE(r.cents, -1) AS cents,
       CAST(b.k IS NOT NULL AS INT) + 2 * CAST(r.k IS NOT NULL AS INT)
           AS presence
FROM buyers b FULL OUTER JOIN rich r ON b.k = r.k
""",
)
def join_full_outer_coalesced(spark, sf_dir):
    """FULL OUTER as a surface query (the merge uses it internally):
    coalesced key + presence bitmap distinguishes left-only/right-only/
    both — nulls made explicit so the gate hash is well-defined."""
    t = load(spark, sf_dir, "orders", "customer")
    buyers = (
        t["orders"].groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )
    rich = (
        t["customer"].filter(F.col("c_acctbal") > 7500)
        .select(
            F.col("c_custkey").alias("rk"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
    )
    j = buyers.join(rich, F.col("k") == F.col("rk"), "full_outer")
    return j.select(
        F.coalesce("k", "rk").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("cents", F.lit(-1)).alias("cents"),
        (
            F.col("k").isNotNull().cast("int")
            + 2 * F.col("rk").isNotNull().cast("int")
        ).alias("presence"),
    )


@query(
    "agg_bool_and_or",
    """
SELECT n.n_name AS nation,
       CAST(bool_and(c.c_acctbal > 0) AS INT) AS all_positive,
       CAST(bool_or(c.c_acctbal > 9000) AS INT) AS any_rich,
       CAST(bool_and(c.c_mktsegment IS NOT NULL) AS INT) AS seg_complete,
       COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_bool_and_or(spark, sf_dir):
    """Boolean aggregates (every/any): the A3 all-complete AND-reduce
    [reference: utils/all_complete.py:4-12] generalized to grouped
    table-level assertions; cast to int for the gate hash."""
    t = load(spark, sf_dir, "customer", "nation")
    j = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.bool_and(F.col("c_acctbal") > 0).cast("int").alias("all_positive"),
        F.bool_or(F.col("c_acctbal") > 9000).cast("int").alias("any_rich"),
        F.bool_and(F.col("c_mktsegment").isNotNull()).cast("int").alias(
            "seg_complete"
        ),
        F.count("*").alias("n_customers"),
    )


@query(
    "agg_winsorized_mean",
    """
WITH p AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.05), 4) AS lo,
         ROUND(quantile_cont(value, 0.95), 4) AS hi
  FROM events GROUP BY event_type
),
c AS (
  SELECT e.event_type,
         CAST(ROUND(LEAST(GREATEST(e.value, p.lo), p.hi) * 10000) AS BIGINT)
           AS scaled
  FROM events e JOIN p USING (event_type)
)
SELECT event_type, COUNT(*) AS n,
       SUM(scaled) / 10000.0 AS win_total,
       ROUND(SUM(scaled) / (10000.0 * COUNT(*)), 6) AS win_mean
FROM c GROUP BY event_type
""",
)
def agg_winsorized_mean(spark, sf_dir):
    """Winsorized mean per event type: clip at the exact P5/P95 (rounded
    to 4dp so the clip thresholds are bit-identical across engines —
    raw interpolated quantiles can differ in the last ulp), then the
    scaled-integer mean. The percentile aggregation is per-group (one
    shuffle) and the thresholds broadcast back onto the fact rows."""
    e = load(spark, sf_dir, "events")["events"]
    p = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("hi"),
    )
    clipped = e.join(F.broadcast(p), "event_type").select(
        "event_type",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
            * 10000
        )
        .cast("long")
        .alias("scaled"),
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum("scaled") / 10000.0).alias("win_total"),
        F.round(F.sum("scaled") / (10000.0 * F.count("*")), 6).alias(
            "win_mean"
        ),
    )


@query(
    "agg_equidepth_histogram",
    """
WITH t AS (
  SELECT NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT bucket, COUNT(*) AS n, MIN(cents) AS lo, MAX(cents) AS hi
FROM t GROUP BY 1
""",
)
def agg_equidepth_histogram(spark, sf_dir):
    """Equi-depth (NTILE) histogram WITHOUT the global single-partition
    window the SQL formulation implies: the global rank comes from the
    distributed two-phase prefix sum (operators/prefix_sum.py) over the
    (price, key) total order, and NTILE's exact bucket arithmetic
    (first n%k buckets take ceil(n/k) rows) is applied per row. The
    oracle IS the NTILE window — same buckets, but the engine never
    funnels the table through one task."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ranked = ordered_prefix_sum(
        o, ["price", "o_orderkey"], F.lit(1), out_col="rank"
    )
    n = o.count()
    k = 8
    q, m = n // k, n % k
    r0 = F.col("rank") - 1  # 0-based rank
    big_span = m * (q + 1)
    bucket = F.when(
        r0 < big_span, F.floor(r0 / (q + 1)) + 1
    ).otherwise(F.floor((r0 - big_span) / q) + m + 1)
    return (
        ranked.select(bucket.cast("long").alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )


@query(
    "join_null_safe_equality",
    """
WITH keyed AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE o_custkey % 50 END AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
agg AS (
  SELECT k, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
  FROM keyed GROUP BY k
),
dim AS (SELECT DISTINCT k FROM keyed)
SELECT d.k, a.n, a.cents
FROM dim d JOIN agg a ON d.k IS NOT DISTINCT FROM a.k
""",
)
def join_null_safe_equality(spark, sf_dir):
    """Null-safe equality join (eqNullSafe / IS NOT DISTINCT FROM): a
    NULL key must join the NULL group instead of silently dropping —
    the semantic corner where a plain equi-join loses rows. Still a
    hash-joinable condition on both engines (null-safe equality is an
    equi-join key, not a filter)."""
    o = load(spark, sf_dir, "orders")["orders"]
    keyed = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 50)
        .alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    agg = keyed.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("cents").alias("cents")
    )
    dim = keyed.select("k").distinct()
    return dim.alias("d").join(
        agg.alias("a"), F.col("d.k").eqNullSafe(F.col("a.k"))
    ).select(F.col("d.k").alias("k"), "n", "cents")


@query(
    "join_reciprocal_best_match",
    """
WITH spend AS (
  SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS spend_cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), ranked AS (
  SELECT custkey, partkey, spend_cents,
         ROW_NUMBER() OVER (PARTITION BY custkey
                            ORDER BY spend_cents DESC, partkey) AS rc,
         ROW_NUMBER() OVER (PARTITION BY partkey
                            ORDER BY spend_cents DESC, custkey) AS rp
  FROM spend
)
SELECT custkey, partkey, spend_cents FROM ranked WHERE rc = 1 AND rp = 1
""",
)
def join_reciprocal_best_match(spark, sf_dir):
    """Reciprocal best match (mutual top-1): customer-part pairs where
    the part is the customer's biggest spend AND the customer is the
    part's biggest buyer — the matching primitive behind dedupe-linkage
    and recommender reciprocity. Two ROW_NUMBER windows over ONE
    aggregated spend table (never a join of two ranked copies);
    deterministic tiebreak by key. Integer cents throughout."""
    t = load(spark, sf_dir, "orders", "lineitem")
    spend = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents")
        )
    )
    rc = Window.partitionBy("custkey").orderBy(
        F.col("spend_cents").desc(), "partkey"
    )
    rp = Window.partitionBy("partkey").orderBy(
        F.col("spend_cents").desc(), "custkey"
    )
    return (
        spend.withColumn("rc", F.row_number().over(rc))
        .withColumn("rp", F.row_number().over(rp))
        .filter((F.col("rc") == 1) & (F.col("rp") == 1))
        .select("custkey", "partkey", "spend_cents")
    )


_LATERAL_SQL = """
SELECT c_custkey AS custkey, t.o_orderkey AS orderkey,
       t.price_cents AS price_cents
FROM {cust}, LATERAL (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
           AS price_cents
  FROM {ords} WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
) t
"""


@query(
    "join_lateral_topk_orders",
    _LATERAL_SQL.format(cust="customer", ords="orders"),
    doc="Correlated LATERAL subquery with per-group ORDER BY + LIMIT "
    "(top-2 orders per customer); DuckDB LATERAL oracle.",
)
def join_lateral_topk_orders(spark, sf_dir: str):
    """Top-2 orders per customer via a correlated LATERAL subquery —
    the SQL surface users reach for before they learn window tricks.
    Spark 4.x DECORRELATES this (no per-row re-execution): the plan is
    a row_number window partitioned by o_custkey, a rn <= 2 filter,
    then one hash join back to customer — semantically identical to
    window_topk_parts_per_brand's hand-written form. Honest scale
    note: the decorrelation currently funnels the LIMIT's ORDER BY
    through a global range sort of the fact side before the window,
    one exchange more than the hand-written top-k; this query
    certifies the SQL surface, window_topk_two_phase is the 100 TB
    path. Total order (price DESC, orderkey ASC) makes the pick
    deterministic; money is emitted in integer cents."""
    t = load(spark, sf_dir, "customer", "orders")
    t["customer"].createOrReplaceTempView("customer_lat")
    t["orders"].createOrReplaceTempView("orders_lat")
    return spark.sql(_LATERAL_SQL.format(cust="customer_lat", ords="orders_lat"))


@query(
    "sort_pareto_frontier_parts",
    """
WITH p AS (
  SELECT p_partkey,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT p.p_partkey AS partkey, p.price_cents, p.size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_cents <= p.price_cents AND q.size >= p.size
    AND (q.price_cents < p.price_cents OR q.size > p.size)
)
""",
    doc="Skyline / Pareto frontier (min price, max size) via two-phase "
    "bucket run-max — never an all-pairs dominance join; quadratic "
    "NOT EXISTS oracle.",
)
def sort_pareto_frontier_parts(spark, sf_dir: str):
    """Skyline query: parts not dominated on (price low, size high) —
    the multi-objective shortlist every catalog/procurement pipeline
    wants. The textbook formulation is an all-pairs dominance anti-join
    (the oracle's quadratic NOT EXISTS); the distributed plan instead
    uses the order-statistics identity: a part survives iff its size
    beats the MAX size among all strictly-cheaper parts AND ties the
    MAX size at its own price. Strictly-cheaper max = GREATEST of (a) a
    run-max over per-price-BUCKET maxima (the only global window, over
    a ~25-row aggregated series bounded by the price range, not the
    part count) and (b) a bucket-partitioned RANGE window for cheaper
    parts in the same bucket. Everything over raw parts is partitioned
    by bucket or price, so the plan holds at any row count."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part")["part"].select(
        F.col("p_partkey").alias("partkey"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    p = p.withColumn("bucket", F.expr("price_cents div 5000"))
    bmax = p.groupBy("bucket").agg(F.max("size").alias("bmx"))
    prev = bmax.select(
        "bucket",
        F.max("bmx")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("prev_runmax"),
    )
    within = (
        Window.partitionBy("bucket")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same = Window.partitionBy("price_cents")
    scored = (
        p.join(F.broadcast(prev), "bucket")
        .withColumn("cheaper_in_bucket", F.max("size").over(within))
        .withColumn("same_price_max", F.max("size").over(same))
        .withColumn(
            "cheaper_max",
            F.coalesce(
                F.greatest("prev_runmax", "cheaper_in_bucket"), F.lit(-1)
            ),
        )
    )
    return scored.filter(
        (F.col("size") > F.col("cheaper_max"))
        & (F.col("size") == F.col("same_price_max"))
    ).select("partkey", "price_cents", "size")


@query(
    "pivot_dynamic_discovered",
    """
SELECT o_orderpriority AS prio,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS f_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS o_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS p_cents
FROM orders GROUP BY o_orderpriority
""",
    doc="Dynamic pivot: column set DISCOVERED at plan time (no values "
    "list) — the extra distinct pass users pay for; oracle spells the "
    "CASE columns out.",
)
def pivot_dynamic_discovered(spark, sf_dir):
    """PIVOT with RUNTIME column discovery: no values list, so Spark
    runs a distinct pass over the pivot column to learn the output
    schema before the real aggregation (two jobs — the documented cost
    of dynamic pivot; the static-values variant pivot_status_by_priority
    skips the extra pass and is the 100 TB recommendation). Discovered
    columns are asserted against the expected status set so a corpus
    change fails loudly, then renamed to the oracle's fixed aliases."""
    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    piv = (
        o.select(F.col("o_orderpriority").alias("prio"), "o_orderstatus", cents.alias("c"))
        .groupBy("prio")
        .pivot("o_orderstatus")  # no values: discovery pass
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long"))
    )
    got = sorted(c for c in piv.columns if c != "prio")
    if got != ["F", "O", "P"]:
        raise RuntimeError(f"discovered pivot columns changed: {got}")
    return piv.select(
        "prio",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("f_cents"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("o_cents"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("p_cents"),
    )


@query(
    "sql_relational_division",
    """
WITH segs AS (SELECT COUNT(DISTINCT c_mktsegment) AS k FROM customer),
cov AS (
  SELECT c_nationkey AS nk, COUNT(DISTINCT c_mktsegment) AS got
  FROM customer GROUP BY 1
)
SELECT n.n_name AS nation, CAST(cov.got AS BIGINT) AS n_segments
FROM cov JOIN nation n ON n.n_nationkey = cov.nk
WHERE cov.got = (SELECT k FROM segs)
""",
)
def sql_relational_division(spark, sf_dir):
    """RELATIONAL DIVISION (the 'FOR ALL' query SQL never got a keyword
    for): nations whose customer base spans EVERY market segment. The
    set-containment join compiles to the standard count-distinct
    reformulation — per-divisor-group distinct count equals the
    divisor's cardinality — which is one aggregation plus a one-row
    broadcast, instead of the textbook double-NOT-EXISTS whose nested
    anti-joins explode at scale."""
    t = load(spark, sf_dir, "customer", "nation")
    k = (
        t["customer"]
        .agg(F.countDistinct("c_mktsegment").alias("k"))
    )
    cov = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.countDistinct("c_mktsegment").alias("got")
    )
    return (
        cov.crossJoin(F.broadcast(k))
        .filter(F.col("got") == F.col("k"))
        .join(
            F.broadcast(t["nation"]),
            F.col("nk") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("got").cast("long").alias("n_segments"),
        )
    )


@query(
    "sql_correlated_exists_counts",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT') THEN 1 ELSE 0 END)
            AS BIGINT) AS with_urgent,
       CAST(SUM(CASE WHEN NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END) AS BIGINT) AS never_ordered
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def sql_correlated_exists_counts(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS per nation: customers with at
    least one urgent order, and customers who never ordered. The
    Spark plan is what EXISTS should decorrelate to — one LEFT SEMI
    and one LEFT ANTI join on the customer key (each a single shuffle,
    no per-row subquery) — flag columns from the two joins feed one
    aggregation; the oracle keeps the literal correlated form so
    DuckDB's decorrelation independently certifies the rewrite."""
    t = load(spark, sf_dir, "customer", "nation", "orders")
    c = t["customer"].select("c_custkey", "c_nationkey")
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    with_urgent = c.join(
        urgent, c["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_nationkey").withColumn("flag_u", F.lit(1))
    never = c.join(
        t["orders"].select("o_custkey"),
        c["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_nationkey").withColumn("flag_n", F.lit(1))
    flags = (
        c.join(with_urgent.select("c_custkey", "flag_u"), "c_custkey", "left")
        .join(never.select("c_custkey", "flag_n"), "c_custkey", "left")
    )
    return (
        flags.join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.coalesce(F.col("flag_u"), F.lit(0)))
            .cast("long")
            .alias("with_urgent"),
            F.sum(F.coalesce(F.col("flag_n"), F.lit(0)))
            .cast("long")
            .alias("never_ordered"),
        )
    )
