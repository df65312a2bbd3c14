"""Data-quality audit queries: the assertion shapes a pipeline runs
before trusting a snapshot — referential integrity, key uniqueness,
per-partition completeness. Complements profile_orders_columns (which
describes; these judge).

All counts are integer-exact; every check is a single anti-join or
aggregation on the natural key — at 100 TB these are the same one-shuffle
shapes as the production joins they guard.

[reference: the reference's runtime invariant checks are its only QA —
multi-match RecordKeyException src/modules/ingestion_handler.py:193-195,
date validation src/driver.py:132-134; this module is that idea
generalized to table-level audits.]
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "dq_referential_orphans",
    """
SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'orders->customer', COUNT(*)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'customer->nation', COUNT(*)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_nationkey IS NULL
""",
)
def dq_referential_orphans(spark, sf_dir):
    """Referential-integrity audit: orphan counts along the fact->dim
    chain, each one LEFT ANTI join (no row materializes unless broken).
    Zero counts are the expected PASS — the query certifies the check
    machinery, a real pipeline alerts on nonzero."""
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "nation")

    def orphans(child, parent, ck, pk, label):
        n = (
            child.join(parent, F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )
        return n

    return (
        orphans(t["lineitem"], t["orders"], "l_orderkey", "o_orderkey",
                "lineitem->orders")
        .unionByName(
            orphans(t["orders"], t["customer"], "o_custkey", "c_custkey",
                    "orders->customer"))
        .unionByName(
            orphans(t["customer"], t["nation"], "c_nationkey", "n_nationkey",
                    "customer->nation"))
    )


@query(
    "dq_duplicate_composite_keys",
    """
WITH d AS (
  SELECT user_id, ts, COUNT(*) AS n FROM events
  GROUP BY user_id, ts HAVING COUNT(*) > 1
)
SELECT COUNT(*) AS n_dup_keys,
       COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n_dup_rows,
       COALESCE(CAST(MAX(n) AS BIGINT), 0) AS worst_key_rows
FROM d
""",
)
def dq_duplicate_composite_keys(spark, sf_dir):
    """Key-uniqueness audit on the (user_id, ts) composite — the same
    groupBy-count>1 probe the merge's multi-match guard runs
    [reference: src/modules/ingestion_handler.py:193-195], surfaced as
    a standalone check with volume and worst-case columns."""
    e = load(spark, sf_dir, "events")["events"]
    d = (
        e.groupBy("user_id", "ts")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    return d.agg(
        F.count("*").alias("n_dup_keys"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_dup_rows"),
        F.coalesce(F.max("n"), F.lit(0)).alias("worst_key_rows"),
    )


@query(
    "dq_daily_completeness",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       COUNT(*) AS n_types_present,
       CAST(5 - COUNT(*) AS INT) AS n_types_missing,
       CAST(MIN(n) AS BIGINT) AS thinnest_type_rows
FROM daily GROUP BY d
""",
)
def dq_daily_completeness(spark, sf_dir):
    """Completeness audit: per day, how many of the 5 event types
    reported and the thinnest type's row count — the gap detector a
    station-data operator runs on sensor feeds (the reference handles
    gaps by re-ingesting months [reference: utils/task.sh:1-16]; this
    makes them visible first)."""
    e = load(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    return daily.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_types_present"),
        (F.lit(5) - F.count("*")).cast("int").alias("n_types_missing"),
        F.min("n").alias("thinnest_type_rows"),
    )


@query(
    "dq_key_skew_profile",
    """
WITH counts AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
),
topk AS (
  SELECT cnt FROM counts ORDER BY cnt DESC, o_custkey LIMIT 10
)
SELECT (SELECT COUNT(*) FROM counts) AS n_keys,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM counts) AS total_rows,
       (SELECT MAX(cnt) FROM counts) AS max_cnt,
       (SELECT MIN(cnt) FROM counts) AS min_cnt,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM topk) AS top10_rows,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM topk) * 10000
         // (SELECT CAST(SUM(cnt) AS BIGINT) FROM counts)
         AS top10_share_bp
""",
)
def dq_key_skew_profile(spark, sf_dir):
    """Join/agg-key skew diagnosis — the pre-flight check before
    choosing salting or AQE skew handling at scale: per-key counts
    folded to n_keys / max / min / top-10 mass (share in integer basis
    points, so the hash compare is float-free)."""
    o = load(spark, sf_dir, "orders")["orders"]
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    top10 = counts.orderBy(
        F.col("cnt").desc(), "o_custkey"
    ).limit(10).agg(F.sum("cnt").alias("top10_rows"))
    overall = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
    )
    return (
        overall.crossJoin(F.broadcast(top10))
        .withColumn(
            "top10_share_bp",
            (F.col("top10_rows") * 10000 / F.col("total_rows")).cast("long"),
        )
        .select(
            "n_keys", "total_rows", "max_cnt", "min_cnt",
            "top10_rows", "top10_share_bp",
        )
    )


@query(
    "dq_benford_first_digit",
    """
WITH digits AS (
  SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
         AS digit
  FROM orders
), counts AS (
  SELECT digit, COUNT(*) AS cnt FROM digits GROUP BY digit
)
SELECT digit, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 10000 // SUM(cnt) OVER () AS BIGINT) AS share_bp,
       CAST(FLOOR(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 10000)
            AS BIGINT) AS benford_bp
FROM counts
""",
)
def dq_benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit on order totals: observed
    first-significant-digit shares vs the Benford expectation, both in
    integer basis points (fabricated or capped financial data diverges
    hard from Benford — a standard forensic DQ probe). One narrow
    scan + a 9-row aggregate; the window total never shuffles data."""
    orders = load(spark, sf_dir, "orders")["orders"]
    counts = (
        orders.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.select(
        "digit",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("cnt * 10000 div sum(cnt) over ()").cast("long").alias(
            "share_bp"
        ),
        F.floor(
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            * 10000
        )
        .cast("long")
        .alias("benford_bp"),
    )


@query(
    "dq_schema_drift_versions",
    """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, 0 AS half,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 2 = 0
), v2_new AS (
  SELECT o_orderkey, o_orderstatus, 1 AS half,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 2 = 1
),
cols(col) AS (VALUES ('o_orderkey'), ('o_orderstatus'), ('half'), ('cents'),
               ('priority')),
s1 AS (
  SELECT 'o_orderkey' AS col, COUNT(*) AS n, COUNT(o_orderkey) AS nn FROM v1
  UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus) FROM v1
  UNION ALL SELECT 'half', COUNT(*), COUNT(half) FROM v1
  UNION ALL SELECT 'cents', COUNT(*), COUNT(cents) FROM v1
),
s2 AS (
  SELECT 'o_orderkey' AS col, COUNT(*) AS n, COUNT(o_orderkey) AS nn
  FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2_new)
  UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus)
  FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2_new)
  UNION ALL SELECT 'half', COUNT(*), COUNT(half)
  FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2_new)
  UNION ALL SELECT 'cents', COUNT(*), COUNT(cents)
  FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2_new)
  UNION ALL SELECT 'priority', COUNT(*), COUNT(priority)
  FROM (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2_new)
)
SELECT c.col,
       CASE WHEN s1.col IS NULL THEN 'added' ELSE 'kept' END AS status,
       CAST(COALESCE(s1.nn * 10000 // s1.n, -1) AS BIGINT) AS nonnull_bp_v1,
       CAST(s2.nn * 10000 // s2.n AS BIGINT) AS nonnull_bp_v2
FROM cols c
LEFT JOIN s1 ON s1.col = c.col
JOIN s2 ON s2.col = c.col
""",
)
def dq_schema_drift_versions(spark, sf_dir):
    """Schema + completeness drift audit between two snapshot versions:
    which columns appeared, and how each column's non-null rate moved —
    the pre-flight check before retraining on a refreshed corpus
    (silent schema evolution + creeping null rates are the classic
    upstream regression). v1 = even orders with planted NULL cents; v2
    appends odd orders carrying a NEW priority column via schema
    evolution. One narrow aggregate pass per version over the REAL
    snapshot store (time travel supplies v1); integer basis points; -1
    marks 'column absent at v1'."""
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable
    from station_data_ingestion_spark.queries.snapshot_q import _tmpdir

    o = load(spark, sf_dir, "orders")["orders"]
    v1df = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(0).alias("half"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.lit(None).cast("long")
        ).otherwise(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("cents"),
    )
    v2df = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(1).alias("half"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("priority"),
    )
    t = SnapshotTable(
        spark,
        _tmpdir(prefix="dq_drift_") + "/orders_drift",
        partition_cols=("half",),
        stat_cols=(),
    )
    t.commit_overwrite_partitions(v1df)
    v1 = t.latest_version()
    # schema-evolution append: new column arrives in new files only
    t.commit_overwrite_partitions(v2df)

    def stats(df):
        rows = []
        n = F.count(F.lit(1))
        for c in df.columns:
            rows.append(
                df.agg(
                    F.lit(c).alias("col"),
                    n.alias("n"),
                    F.count(c).alias("nn"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    s1 = stats(t.read(version=v1)).select(
        "col", F.expr("nn * 10000 div n").alias("bp1")
    )
    s2 = stats(t.read()).select(
        "col", F.expr("nn * 10000 div n").alias("bp2")
    )
    return s2.join(s1, "col", "left").select(
        "col",
        F.when(F.col("bp1").isNull(), F.lit("added"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.coalesce("bp1", F.lit(-1)).cast("long").alias("nonnull_bp_v1"),
        F.col("bp2").cast("long").alias("nonnull_bp_v2"),
    )


@query(
    "dq_psi_price_drift",
    """
WITH base AS (
  SELECT o_orderstatus AS st,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2500000 AS b
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
rc AS (SELECT b, COUNT(*) AS n_ref FROM base WHERE st = 'F' GROUP BY b),
cc AS (SELECT b, COUNT(*) AS n_cur FROM base WHERE st = 'O' GROUP BY b),
tot AS (
  SELECT (SELECT SUM(n_ref) FROM rc) AS tr,
         (SELECT SUM(n_cur) FROM cc) AS tc
)
SELECT rc.b AS bucket, CAST(rc.n_ref AS BIGINT) AS n_ref,
       CAST(cc.n_cur AS BIGINT) AS n_cur,
       ROUND((rc.n_ref * 1.0 / tot.tr - cc.n_cur * 1.0 / tot.tc)
             * LN((rc.n_ref * 1.0 / tot.tr) / (cc.n_cur * 1.0 / tot.tc)),
             6) AS psi_term
FROM rc JOIN cc ON rc.b = cc.b CROSS JOIN tot
""",
)
def dq_psi_price_drift(spark, sf_dir):
    """POPULATION STABILITY INDEX audit — the standard drift monitor a
    training pipeline runs between a reference and a current slice
    (here: order prices of finished vs open orders): fixed-width
    25k-cent buckets (deterministic — no cross-engine percentile-edge
    ambiguity), per-bucket reference/current shares, and the PSI term
    (p - q) * ln(p / q) rounded to 6 dp. Buckets present in only one
    population are excluded (the standard epsilon-free convention; the
    inner join makes it explicit). One scan, two grouped counts, a
    broadcast of the two totals — no percentile pass at all, so the
    plan is a pair of partial aggregates at any scale."""
    o = load(spark, sf_dir, "orders")["orders"].filter(
        F.col("o_orderstatus").isin("F", "O")
    ).select(
        "o_orderstatus",
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2500000"
        ).alias("b"),
    )
    rc = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    )
    cc = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
    )
    tot = rc.agg(F.sum("n_ref").alias("tr")).crossJoin(
        cc.agg(F.sum("n_cur").alias("tc"))
    )
    p = F.col("n_ref") / F.col("tr")
    q = F.col("n_cur") / F.col("tc")
    return (
        rc.join(cc, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("b").alias("bucket"),
            "n_ref",
            "n_cur",
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


@query(
    "dq_k_anonymity_audit",
    """
WITH fine AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY 1, 2
),
coarse AS (
  SELECT n.n_regionkey, c.c_mktsegment, COUNT(*) AS n
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT 'nation_segment' AS level,
       CAST(COUNT(*) FILTER (WHERE n < 10) AS BIGINT) AS violating_groups,
       CAST(COALESCE(SUM(n) FILTER (WHERE n < 10), 0) AS BIGINT)
         AS rows_at_risk,
       CAST(MIN(n) AS BIGINT) AS min_group
FROM fine
UNION ALL
SELECT 'region_segment',
       CAST(COUNT(*) FILTER (WHERE n < 10) AS BIGINT),
       CAST(COALESCE(SUM(n) FILTER (WHERE n < 10), 0) AS BIGINT),
       CAST(MIN(n) AS BIGINT)
FROM coarse
""",
)
def dq_k_anonymity_audit(spark, sf_dir):
    """K-ANONYMITY privacy audit (k=10): a released row is
    re-identifiable when its quasi-identifier combination matches
    fewer than k individuals. The audit counts violating groups, the
    rows at risk, and the worst group size at TWO generalization
    levels — (nation, segment) and the coarsened (region, segment) —
    quantifying how much the standard remedy (attribute generalization
    up the nation->region hierarchy) buys. Pure integer grouped
    counts: two partial aggregates and a broadcast dimension join, no
    floats anywhere."""
    t = load(spark, sf_dir, "customer", "nation")
    c, n = t["customer"], t["nation"]

    def audit(df, keys, level):
        g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        return g.agg(
            F.lit(level).alias("level"),
            F.count(F.when(F.col("n") < 10, 1))
            .cast("long")
            .alias("violating_groups"),
            F.coalesce(
                F.sum(F.when(F.col("n") < 10, F.col("n"))), F.lit(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.min("n").cast("long").alias("min_group"),
        )

    fine = audit(c, ["c_nationkey", "c_mktsegment"], "nation_segment")
    coarse = audit(
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c["c_nationkey"] == F.col("n_nationkey"),
        ),
        ["n_regionkey", "c_mktsegment"],
        "region_segment",
    )
    return fine.unionByName(coarse)


@query(
    "dq_outlier_iqr_fences",
    """
WITH x AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), fences AS (
  SELECT grp,
         quantile_cont(cents, 0.25) AS q1,
         quantile_cont(cents, 0.75) AS q3
  FROM x GROUP BY grp
)
SELECT x.grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(f.q3 - f.q1, 1) AS iqr_cents,
       CAST(SUM(CASE WHEN x.cents < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR x.cents > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MAX(CASE WHEN x.cents > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN x.cents END) AS BIGINT) AS max_outlier_cents
FROM x JOIN fences f ON f.grp = x.grp
GROUP BY x.grp, f.q1, f.q3
""",
)
def dq_outlier_iqr_fences(spark, sf_dir):
    """Tukey IQR outlier audit per return flag: exact quartiles on
    integer cents (both engines share the percentile_cont
    interpolation definition; fences 1.5×IQR stay exact binary
    fractions), then one broadcast of the 3-row fence table back over
    the fact scan to count fence-breakers. The classic pre-training
    data-quality gate for numeric columns — at 100 TB the fences would
    come from approx_percentile and this exact twin is the oracle
    anchor (same contract as agg_exact_percentiles)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    x = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    fences = x.groupBy("grp").agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        x.join(F.broadcast(fences), "grp")
        .groupBy("grp", "q1", "q3")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    (F.col("cents") < lo) | (F.col("cents") > hi), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max(F.when(F.col("cents") > hi, F.col("cents")))
            .cast("long")
            .alias("max_outlier_cents"),
        )
        .select(
            "grp",
            "n",
            F.round(iqr, 1).alias("iqr_cents"),
            "n_outliers",
            "max_outlier_cents",
        )
    )


@query(
    "dq_order_lineitem_reconciliation",
    """
WITH li AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                        * 100) AS BIGINT)) AS li_cents
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_cents,
         li_cents
  FROM orders LEFT JOIN li ON l_orderkey = o_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN li_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_childless,
       CAST(SUM(CASE WHEN li_cents IS NOT NULL
                      AND ABS(o_cents - li_cents) <= 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reconciled,
       CAST(SUM(CASE WHEN li_cents IS NOT NULL
                      AND ABS(o_cents - li_cents) > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatched,
       CAST(MAX(CASE WHEN li_cents IS NOT NULL
                     THEN ABS(o_cents - li_cents) END) AS BIGINT)
         AS max_abs_diff_cents
FROM j
""",
)
def dq_order_lineitem_reconciliation(spark, sf_dir):
    """CROSS-TABLE reconciliation audit — the classic header/detail
    integrity check: does o_totalprice equal the lineitem-derived
    charge sum (extendedprice * (1+tax) * (1-discount))? Per-row
    charges round to EXACT cents before summing (both engines apply
    the identical IEEE product then one half-away round, so the bigint
    sums are order-independent); reconciliation tolerates 1 cent of
    header-side rounding. One shuffle on orderkey for the detail
    aggregation, one equi-join; counts and the max divergence are all
    exact integers."""
    t = load(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 + F.col("l_tax"))
                * (1 - F.col("l_discount"))
                * 100
            ).cast("long")
        ).alias("li_cents")
    )
    j = t["orders"].join(
        li, F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
        "li_cents",
    )
    diff = F.abs(F.col("o_cents") - F.col("li_cents"))
    has = F.col("li_cents").isNotNull()
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).cast("long").alias("n_childless"),
        F.sum(F.when(has & (diff <= 1), 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.sum(F.when(has & (diff > 1), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.max(F.when(has, diff)).cast("long").alias("max_abs_diff_cents"),
    )


@query(
    "dq_observe_single_pass_metrics",
    """
WITH tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS scanned_rows,
         CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS null_qty,
         CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS min_price_cents,
         CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS max_price_cents
  FROM lineitem
),
agg AS (
  SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_returnflag
)
SELECT agg.flag, agg.n, agg.cents,
       tot.scanned_rows, tot.null_qty, tot.min_price_cents,
       tot.max_price_cents
FROM agg, tot
""",
    doc="Observation API: DQ counters (row count, null count, value "
    "bounds) collected IN the same pass as the business aggregate — "
    "no second scan; oracle recomputes both.",
)
def dq_observe_single_pass_metrics(spark, sf_dir):
    """IN-FLIGHT data-quality metrics via Spark's Observation API: the
    business aggregate (revenue by return flag) executes ONCE, and the
    observe() node riding the same scan collects the DQ counters a
    pipeline wants alongside every run — rows scanned, nulls in a
    critical column, value bounds — through accumulators, with ZERO
    additional passes (at 100 TB a separate profiling query doubles
    the scan bill; observe() makes profiling free). The observed
    values are attached to every output row so the oracle audits both
    the aggregate and the metrics; a metrics drift (e.g. the observe
    node silently detaching from the scan after an optimizer change)
    is a gate red."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    obs = Observation("dq_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("scanned_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long"))
        .cast("long")
        .alias("null_qty"),
        F.min(cents).cast("long").alias("min_price_cents"),
        F.max(cents).cast("long").alias("max_price_cents"),
    )
    agg_rows = (
        observed.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("cents"),
        )
        .collect()  # the ONE action: business result + metrics together
    )
    m = obs.get
    out = [
        (
            r["flag"],
            r["n"],
            r["cents"],
            m["scanned_rows"],
            m["null_qty"],
            m["min_price_cents"],
            m["max_price_cents"],
        )
        for r in agg_rows
    ]
    return spark.createDataFrame(
        out,
        "flag string, n bigint, cents bigint, scanned_rows bigint, "
        "null_qty bigint, min_price_cents bigint, max_price_cents bigint",
    )


@query(
    "dq_freshness_lag_by_type",
    """
WITH m AS (SELECT MAX(ts) AS mx FROM events),
p AS (SELECT event_type, MAX(ts) AS mt, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type)
SELECT event_type, n AS n_events,
       CAST(epoch_us(mx) - epoch_us(mt) AS BIGINT) AS lag_micros
FROM p, m
""",
    doc="Per-stream freshness lag vs the corpus high-watermark in "
    "exact epoch microseconds — the staleness SLO audit.",
)
def dq_freshness_lag_by_type(spark, sf_dir):
    """FRESHNESS audit: how far does each event stream trail the
    corpus high-watermark? Exact epoch-microsecond arithmetic (never
    minute/day 'differences', whose boundary-crossing semantics differ
    between engines) over two tiny aggregates — a per-type max and a
    one-row global max broadcast. The canary for a dead upstream
    partition or a stuck consumer; at 100 TB it is one map-side-
    combined pass."""
    e = load(spark, sf_dir, "events")["events"]
    m = e.agg(F.max("ts").alias("mx"))
    p = e.groupBy("event_type").agg(
        F.max("ts").alias("mt"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return p.crossJoin(F.broadcast(m)).select(
        "event_type",
        "n_events",
        (F.unix_micros("mx") - F.unix_micros("mt"))
        .cast("long")
        .alias("lag_micros"),
    )


@query(
    "dq_expectation_suite_report",
    """
WITH v AS (
  SELECT
    COUNT(*) AS n_rows,
    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS v_key_nn,
    COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
      - COUNT(DISTINCT o_orderkey) AS v_key_uq,
    COUNT(CASE WHEN o_orderstatus IS NOT NULL
               AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
      AS v_status,
    COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, TRUE) THEN 1 END)
      AS v_price,
    COUNT(CASE WHEN o_orderpriority IS NOT NULL
               AND NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END)
      AS v_prio,
    COUNT(CASE WHEN NOT COALESCE(o_orderdate >= DATE '1990-01-01', TRUE)
               THEN 1 END) AS v_date
  FROM orders
), rows_out AS (
  SELECT 'orderkey_not_null' AS rule, 'not_null' AS kind, v_key_nn AS nv, n_rows FROM v
  UNION ALL SELECT 'orderkey_unique', 'unique', v_key_uq, n_rows FROM v
  UNION ALL SELECT 'status_domain', 'in_set', v_status, n_rows FROM v
  UNION ALL SELECT 'price_positive', 'custom', v_price, n_rows FROM v
  UNION ALL SELECT 'priority_format', 'regex', v_prio, n_rows FROM v
  UNION ALL SELECT 'date_floor', 'custom', v_date, n_rows FROM v
)
SELECT rule, kind, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(nv AS BIGINT) AS n_violations, nv = 0 AS passed
FROM rows_out
""",
)
def dq_expectation_suite_report(spark, sf_dir):
    """DECLARATIVE EXPECTATION SUITE (Great-Expectations / DLT-style
    data contract): six rules — not-null, key uniqueness, value domain,
    custom predicate, regex format, date floor — compiled into ONE
    aggregation pass (conditional counts + count_distinct riding a
    single scan; the per-rule report rows fan out from the one result
    row via stack(), a pure projection). NULL handling follows SQL
    CHECK: unknown passes everything except not_null. At 100 TB the
    suite costs exactly one map-side-combined scan no matter how many
    rules the contract grows."""
    from station_data_ingestion_spark.operators.expectations import (
        evaluate_expectations,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    rules = [
        {"name": "orderkey_not_null", "kind": "not_null", "col": "o_orderkey"},
        {"name": "orderkey_unique", "kind": "unique", "cols": ["o_orderkey"]},
        {
            "name": "status_domain",
            "kind": "in_set",
            "col": "o_orderstatus",
            "values": ["O", "F", "P"],
        },
        {
            "name": "price_positive",
            "kind": "custom",
            "expr": "o_totalprice > 0",
        },
        {
            "name": "priority_format",
            "kind": "regex",
            "col": "o_orderpriority",
            "pattern": "^[1-5]-",
        },
        {
            "name": "date_floor",
            "kind": "custom",
            "expr": "o_orderdate >= DATE '1990-01-01'",
        },
    ]
    return evaluate_expectations(o, rules)


_FD_ORACLE = """
WITH denorm AS (
  SELECT o_custkey, c_name, c_nationkey,
         CAST(o_orderdate AS DATE) AS od
  FROM orders JOIN customer ON o_custkey = c_custkey
),
fd1 AS (
  SELECT 'o_custkey->c_name' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(*) FILTER (WHERE nv > 1) AS BIGINT) AS n_violating
  FROM (SELECT o_custkey, COUNT(DISTINCT c_name) AS nv
        FROM denorm GROUP BY 1)
),
fd2 AS (
  SELECT 'o_custkey->c_nationkey' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(*) FILTER (WHERE nv > 1) AS BIGINT) AS n_violating
  FROM (SELECT o_custkey, COUNT(DISTINCT c_nationkey) AS nv
        FROM denorm GROUP BY 1)
),
fd3 AS (
  SELECT 'o_custkey->order_date' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(*) FILTER (WHERE nv > 1) AS BIGINT) AS n_violating
  FROM (SELECT o_custkey, COUNT(DISTINCT od) AS nv
        FROM denorm GROUP BY 1)
)
SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
"""


@query(
    "dq_functional_dependency_audit",
    _FD_ORACLE,
    doc="Functional-dependency audit over a denormalized join: keys "
    "whose dependent takes >1 distinct value violate the FD.",
)
def dq_functional_dependency_audit(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY audit — the denormalization-drift check:
    in a flattened orders x customer frame, `o_custkey -> c_name` and
    `-> c_nationkey` MUST hold (violations mean the join or an SCD
    backfill corrupted the denorm), while `-> order_date` is expected
    to fail for any repeat customer — auditing a known-false FD keeps
    the checker honest (an auditor that never fires is untested). One
    pass per FD over the same shuffled key: countDistinct per key,
    count of keys with >1. At 100 TB each FD is one map-side-combined
    aggregation; the three share the join scan."""
    t = load(spark, sf_dir, "orders", "customer")
    denorm = (
        t["orders"]
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("od"))
        .join(
            t["customer"].select(
                F.col("c_custkey"), "c_name", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    def fd(name, dep):
        per_key = denorm.groupBy("o_custkey").agg(
            F.countDistinct(dep).alias("nv")
        )
        return per_key.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.count(F.when(F.col("nv") > 1, 1)).cast("long").alias(
                "n_violating"
            ),
        )
    return (
        fd("o_custkey->c_name", "c_name")
        .unionByName(fd("o_custkey->c_nationkey", "c_nationkey"))
        .unionByName(fd("o_custkey->order_date", "od"))
    )
