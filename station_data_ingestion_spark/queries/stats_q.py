"""Statistical-modeling queries: closed-form regression under the gate.

The distributed-OLS operator (operators/linreg.py) is certified two
independent ways: the two-feature fit against DuckDB running the SAME
closed form spelled out in SQL (Cramer's rule over covariances), and the
single-feature fit against DuckDB's NATIVE ``regr_slope`` /
``regr_intercept`` / ``regr_r2`` aggregates — an implementation we
didn't write, so a shared algebra bug can't self-certify. Measured
cross-engine agreement is ~1e-11 absolute on sf0.01 (stable one-pass
covariance sketches on both sides); results round to 6 decimals, seven
orders of magnitude above the drift.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.operators.linreg import fit_ols, ols_terms_df
from station_data_ingestion_spark.queries.registry import load, query


@query(
    "stats_ols_two_feature",
    """
WITH s AS (
  SELECT covar_pop(l_quantity, l_quantity)      AS c11,
         covar_pop(l_quantity, l_discount)      AS c12,
         covar_pop(l_discount, l_discount)      AS c22,
         covar_pop(l_quantity, l_extendedprice) AS c1y,
         covar_pop(l_discount, l_extendedprice) AS c2y,
         var_pop(l_extendedprice)               AS vy,
         avg(l_quantity) AS m1, avg(l_discount) AS m2,
         avg(l_extendedprice) AS my
  FROM lineitem
), b AS (
  SELECT (c22*c1y - c12*c2y) / (c11*c22 - c12*c12) AS b1,
         (c11*c2y - c12*c1y) / (c11*c22 - c12*c12) AS b2, *
  FROM s
)
SELECT 'intercept' AS term, ROUND(my - b1*m1 - b2*m2, 6) AS value FROM b
UNION ALL SELECT 'l_discount', ROUND(b2, 6) FROM b
UNION ALL SELECT 'l_quantity', ROUND(b1, 6) FROM b
UNION ALL SELECT 'r2', ROUND((b1*c1y + b2*c2y) / vy, 6) FROM b
""",
)
def stats_ols_two_feature(spark, sf_dir):
    """Multiple linear regression l_extendedprice ~ l_quantity +
    l_discount by distributed normal equations: ONE codegen aggregation
    pass emits the covariance matrix (k(k+1)/2 + 2k + 2 scalars, map-side
    partials), the driver solves k x k. No per-step scans, no Python
    workers, driver state O(k^2) — row count never touches anything but
    the single scan. Oracle: the same closed form in SQL (Cramer)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    fit = fit_ols(li, "l_extendedprice", ["l_quantity", "l_discount"])
    return ols_terms_df(spark, fit)


@query(
    "stats_ols_single_native",
    """
SELECT 'intercept' AS term,
       ROUND(regr_intercept(n_chars, n_words), 6) AS value FROM d
UNION ALL SELECT 'n_words', ROUND(regr_slope(n_chars, n_words), 6) FROM d
UNION ALL SELECT 'r2', ROUND(regr_r2(n_chars, n_words), 6) FROM d
""".replace(
        "FROM d",
        "FROM (SELECT n_chars, "
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_words "
        "FROM documents) d",
    ),
)
def stats_ols_single_native(spark, sf_dir):
    """Single-feature fit (document char count ~ word count, a
    near-perfectly-linear pair) certified against DuckDB's NATIVE
    regr_slope/regr_intercept/regr_r2 — an independent implementation,
    not our own algebra restated. Word count is derived identically on
    both sides (separator count + 1) so the regression inputs match
    exactly."""
    d = load(spark, sf_dir, "documents")["documents"].select(
        "n_chars",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_words"),
    )
    fit = fit_ols(d, "n_chars", ["n_words"])
    return ols_terms_df(spark, fit)


@query(
    "events_time_decay_topk",
    """
WITH ref AS (SELECT MAX(ts) AS t1 FROM events),
d AS (
  SELECT user_id,
         CAST(ROUND(value * POW(0.5,
             (epoch_us(t1) - epoch_us(ts)) / 604800000000.0) * 10000)
           AS BIGINT) AS du
  FROM events, ref
),
s AS (
  SELECT user_id, SUM(du) AS score_e4 FROM d GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(score_e4 AS BIGINT) AS score_e4
FROM s ORDER BY score_e4 DESC, user_id LIMIT 20
""",
)
def events_time_decay_topk(spark, sf_dir):
    """Exponential TIME-DECAY engagement score (half-life 7 days against
    the corpus's newest event): the recency weighting every feature
    store / recommender maintains. One scan, one groupBy shuffle; the
    reference instant is a single-row broadcast, never a window. Each
    term is rounded to 1e-4 units BEFORE the sum (integer addition is
    associative; pow agrees cross-engine to ~1 ulp, eight orders below
    the rounding unit), then top-20 with a total order."""
    ev = load(spark, sf_dir, "events")["events"]
    ref = ev.agg(F.max("ts").alias("t1"))
    scored = (
        ev.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.round(
                F.col("value")
                * F.pow(
                    F.lit(0.5),
                    (F.unix_micros("t1") - F.unix_micros("ts"))
                    / 604800000000.0,
                )
                * 10000
            )
            .cast("long")
            .alias("du"),
        )
        .groupBy("user_id")
        .agg(F.sum("du").alias("score_e4"))
    )
    return (
        scored.orderBy(F.col("score_e4").desc(), "user_id")
        .limit(20)
        .select(
            F.col("user_id").cast("long"),
            F.col("score_e4").cast("long"),
        )
    )


@query(
    "events_twap_daily",
    """
WITH e AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         epoch_us(date_trunc('day', ts)) + 86400000000 AS day_end,
         epoch_us(ts) AS us, event_id,
         CAST(ROUND(value * 10000) AS BIGINT) AS v4
  FROM events
),
w AS (
  SELECT event_type, day, v4,
         COALESCE(
           LEAD(us) OVER (PARTITION BY event_type, day ORDER BY us, event_id),
           day_end) - us AS dur
  FROM e
)
SELECT event_type, day,
       CAST(SUM(v4 * dur) // SUM(dur) AS BIGINT) AS twap_e4
FROM w GROUP BY event_type, day
""",
)
def events_twap_daily(spark, sf_dir):
    """TIME-WEIGHTED average (TWAP): each observation holds until the
    next one of its (event_type, day) series, the last until midnight —
    the standard irregular-time-series average (finance TWAP, sensor
    duty cycle). ENTIRELY integer-exact: weights are epoch-microsecond
    gaps (bigint), values pre-scaled to 1e-4 units, and the final mean
    is integer division — zero float accumulation anywhere, so the
    result is bit-identical on any engine or partitioning. One window
    shuffle on (event_type, day), one aggregation."""
    ev = load(spark, sf_dir, "events")["events"]
    from pyspark.sql import Window

    e = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        (
            F.unix_micros(F.date_trunc("day", "ts")) + 86400000000
        ).alias("day_end"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    dur = (
        e.withColumn(
            "dur",
            F.coalesce(F.lead("us").over(w), F.col("day_end")) - F.col("us"),
        )
    )
    return dur.groupBy("event_type", "day").agg(
        F.expr("sum(v4 * dur) div sum(dur)").cast("long").alias("twap_e4")
    )


@query(
    "agg_mode_mad_lineitem",
    """
WITH li AS (
  SELECT l_returnflag AS grp, l_quantity AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
mc AS (SELECT grp, qty, COUNT(*) AS c FROM li GROUP BY grp, qty),
md AS (
  SELECT grp, qty FROM (
    SELECT grp, qty,
           ROW_NUMBER() OVER (PARTITION BY grp ORDER BY c DESC, qty) AS rn
    FROM mc) WHERE rn = 1
),
med AS (SELECT grp, median(cents) AS m FROM li GROUP BY grp),
mad AS (
  SELECT li.grp, median(ABS(cents - m)) AS mad
  FROM li JOIN med ON li.grp = med.grp GROUP BY li.grp
)
SELECT md.grp AS grp, CAST(md.qty AS BIGINT) AS mode_qty,
       CAST(ROUND(mad.mad) AS BIGINT) AS mad_cents
FROM md JOIN mad ON md.grp = mad.grp
""",
)
def agg_mode_mad_lineitem(spark, sf_dir):
    """Robust statistics per group: MODE with an explicit deterministic
    tiebreak (count desc, value asc — native mode() tiebreaks are
    engine-unspecified, so both sides spell the argmax out) and MEDIAN
    ABSOLUTE DEVIATION in integer cents (medians of integers are exact
    k or k+.5 doubles; rounding them is engine-stable). Two aggregation
    passes for the MAD (median, then median of deviations) — the
    textbook shape; the mode is one count shuffle + a per-group top-1
    window over the (grp, value) COUNTS, never the raw rows."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    mc = li.groupBy("grp", "qty").agg(F.count(F.lit(1)).alias("c"))
    md = (
        mc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(F.col("c").desc(), "qty")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("grp", F.col("qty").cast("long").alias("mode_qty"))
    )
    med = li.groupBy("grp").agg(F.expr("percentile(cents, 0.5)").alias("m"))
    mad = (
        li.join(med, "grp")
        .select("grp", F.abs(F.col("cents") - F.col("m")).alias("dev"))
        .groupBy("grp")
        .agg(F.round(F.expr("percentile(dev, 0.5)")).cast("long").alias("mad_cents"))
    )
    return md.join(mad, "grp").select("grp", "mode_qty", "mad_cents")


@query(
    "scalars_variant_roundtrip",
    """
SELECT o_orderstatus AS st,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(SUM(EXTRACT(day FROM o_orderdate)) AS BIGINT) AS prio_sum,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
FROM orders GROUP BY o_orderstatus
""",
)
def scalars_variant_roundtrip(spark, sf_dir):
    """Spark 4 VARIANT end-to-end: each order is serialized to nested
    JSON (object, sub-object, array), parsed into a VARIANT column, and
    every output value is recovered ONLY through typed variant_get path
    extraction (object field, nested field, array index) — the oracle
    computes the same aggregates from the base columns, so any fidelity
    loss in the serialize->parse->extract pipeline (type coercion,
    array ordering, null handling) fails the gate. VARIANT is the
    engine's semi-structured answer at scale: binary-encoded once,
    path-extracted many times, no per-query string re-parsing, all
    JVM-side."""
    o = load(spark, sf_dir, "orders")["orders"]
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_orderstatus").alias("st"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            ).alias("m"),
            F.array(
                "o_custkey", F.dayofmonth("o_orderdate").cast("long")
            ).alias("a"),
        )
    )
    v = o.select(F.parse_json(j).alias("v"))
    flat = v.select(
        F.try_variant_get("v", "$.m.st", "string").alias("st"),
        F.try_variant_get("v", "$.m.cents", "long").alias("cents"),
        F.try_variant_get("v", "$.a[1]", "long").alias("prio"),
        F.try_variant_get("v", "$.a[0]", "long").alias("cust"),
    )
    return flat.groupBy("st").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum("prio").cast("long").alias("prio_sum"),
        F.sum("cust").cast("long").alias("cust_sum"),
    )


@query(
    "sample_weighted_es_topk",
    """
WITH k AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents,
         LN((CAST(('0x' || SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
                  AS BIGINT) + 0.5) / 281474976710656.0)
           / o_totalprice AS es_key
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, w_cents
FROM k ORDER BY es_key DESC, o_orderkey LIMIT 50
""",
)
def sample_weighted_es_topk(spark, sf_dir):
    """WEIGHTED sampling without replacement (Efraimidis–Spirakis): each
    row draws a deterministic uniform from md5(key) and ranks by
    ln(u)/w — the top-k under that key IS an exact weighted sample, and
    because the draw is a pure function of the row key it is
    reproducible on any engine, partitioning, or retry (the property
    rand() loses on task re-execution at scale). One scan + a top-k
    (TakeOrdered — never a global sort); the log form avoids the
    u^(1/w) near-1.0 double resolution collapse for large weights."""
    o = load(spark, sf_dir, "orders")["orders"]
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / F.lit(281474976710656.0)
    k = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("w_cents"),
        (F.log(u) / F.col("o_totalprice")).alias("es_key"),
    )
    return (
        k.orderBy(F.col("es_key").desc(), "o_orderkey")
        .limit(50)
        .select(F.col("o_orderkey").cast("long"), "w_cents")
    )


@query(
    "geo_haversine_pairs_grid",
    """
WITH s AS (
  SELECT s_suppkey AS k,
         ((s_suppkey * 37) % 1100) / 10.0 - 55.0 AS lat,
         ((s_suppkey * 91) % 3400) / 10.0 - 170.0 AS lon
  FROM supplier
)
SELECT a.k AS a, b.k AS b,
       CAST(ROUND(2 * 6371008.8 * ASIN(SQRT(
         POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
         + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
           * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
       ))) AS BIGINT) AS dist_m
FROM s a JOIN s b ON a.k < b.k
WHERE 2 * 6371008.8 * ASIN(SQRT(
         POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
         + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
           * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
       )) < 250000
""",
)
def geo_haversine_pairs_grid(spark, sf_dir):
    """SPATIAL distance self-join, grid-blocked: all supplier pairs
    within 250 km (haversine), with synthetic deterministic coordinates
    (lat in +-55 so a 5-degree cell is >= 250 km in BOTH axes at every
    latitude in range). Candidates come from a 9-cell neighborhood
    equi-join — each point joins its cell plus 8 neighbors — so the
    work is O(points x local density), never the all-pairs cross join
    the 100-row-friendly ORACLE uses. The blocking is exhaustive by
    construction (cell size >= radius ⇒ any qualifying pair shares a
    cell or touches adjacent ones); the gate would catch a pair the
    grid loses."""
    sup = load(spark, sf_dir, "supplier")["supplier"].select(
        F.col("s_suppkey").alias("k"),
        (((F.col("s_suppkey") * 37) % 1100) / 10.0 - 55.0).alias("lat"),
        (((F.col("s_suppkey") * 91) % 3400) / 10.0 - 170.0).alias("lon"),
    )
    cell = sup.select(
        "k", "lat", "lon",
        F.floor(F.col("lat") / 5).cast("int").alias("cy"),
        F.floor(F.col("lon") / 5).cast("int").alias("cx"),
    )
    # left side explodes to its 9-cell neighborhood; right side stays
    # in its own cell -> every nearby pair meets in exactly one (cy,cx)
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    lhs = (
        cell.withColumn("o", F.explode(offs))
        .select(
            F.col("k").alias("ak"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
            (F.col("cx") + F.col("o.dx")).alias("cx"),
        )
    )
    rhs = cell.select(
        F.col("k").alias("bk"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        "cy",
        "cx",
    )
    cand = lhs.join(rhs, ["cy", "cx"]).filter(F.col("ak") < F.col("bk"))
    dist = 2 * 6371008.8 * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(F.col("blat") - F.col("alat")) / 2), 2)
            + F.cos(F.radians("alat"))
            * F.cos(F.radians("blat"))
            * F.pow(F.sin(F.radians(F.col("blon") - F.col("alon")) / 2), 2)
        )
    )
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") < 250000)
        .select(
            F.col("ak").cast("long").alias("a"),
            F.col("bk").cast("long").alias("b"),
            F.round("dist").cast("long").alias("dist_m"),
        )
        .distinct()
    )


@query(
    "window_percentile_of_peer",
    """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice)
           AS pr,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       ROUND(pr, 6) AS pctl
FROM r WHERE n >= 20 AND pr >= 0.95
""",
)
def window_percentile_of_peer(spark, sf_dir):
    """Percentile-within-peer-group: each order's PERCENT_RANK among
    its customer's orders; returns the top-5% orders of active (>=20
    orders) customers. percent_rank is (rank-1)/(n-1) — an exact small
    rational, engine-stable at any rounding. One window shuffle on
    customer."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    r = o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .alias("n"),
    )
    return (
        r.filter((F.col("n") >= 20) & (F.col("pr") >= 0.95))
        .select(
            F.col("o_orderkey").cast("long"),
            F.round("pr", 6).alias("pctl"),
        )
    )


@query(
    "ts_autocorr_daily_revenue",
    """
WITH d AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), lagged AS (
  SELECT rev,
         LAG(rev, 1) OVER (ORDER BY day) AS rev_1,
         LAG(rev, 7) OVER (ORDER BY day) AS rev_7
  FROM d
)
SELECT CAST(1 AS BIGINT) AS lag, ROUND(corr(rev, rev_1), 6) AS r FROM lagged
UNION ALL
SELECT 7, ROUND(corr(rev, rev_7), 6) FROM lagged
""",
)
def ts_autocorr_daily_revenue(spark, sf_dir):
    """Series AUTOCORRELATION at lags 1 and 7 over the daily revenue
    series — the seasonality screen run before any forecasting model.
    Revenue is integer cents per day (exact, order-independent); the
    lag alignment is a window over the day series (thousands of rows,
    one narrow global window after an aggregation that did the real
    data reduction — the window input is TINY, not the fact table);
    corr is the same stable one-pass sketch both engines share."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    d = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = d.select(
        "rev",
        F.lag("rev", 1).over(w).alias("rev_1"),
        F.lag("rev", 7).over(w).alias("rev_7"),
    )
    one = lagged.agg(
        F.lit(1).cast("long").alias("lag"),
        F.round(F.corr("rev", "rev_1"), 6).alias("r"),
    )
    seven = lagged.agg(
        F.lit(7).cast("long").alias("lag"),
        F.round(F.corr("rev", "rev_7"), 6).alias("r"),
    )
    return one.unionByName(seven)


@query(
    "stats_corr_matrix_lineitem",
    """
SELECT 'quantity~extendedprice' AS pair,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS r FROM lineitem
UNION ALL
SELECT 'quantity~discount', ROUND(corr(l_quantity, l_discount), 6)
FROM lineitem
UNION ALL
SELECT 'extendedprice~tax', ROUND(corr(l_extendedprice, l_tax), 6)
FROM lineitem
""",
)
def stats_corr_matrix_lineitem(spark, sf_dir):
    """Pairwise CORRELATION matrix (the multicollinearity audit that
    pairs with the OLS fit): all pairs in ONE aggregation pass — each
    corr is a merge-able (n, mean, M2, co-moment) sketch, so k(k-1)/2
    pairs ride a single scan with map-side partials, the shape that
    matters when the scan is 100 TB."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    m = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qe"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qd"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("et"),
    )
    return m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity~extendedprice").alias("pair"),
                    F.col("qe").alias("r"),
                ),
                F.struct(
                    F.lit("quantity~discount").alias("pair"),
                    F.col("qd").alias("r"),
                ),
                F.struct(
                    F.lit("extendedprice~tax").alias("pair"),
                    F.col("et").alias("r"),
                ),
            )
        ).alias("x")
    ).select("x.pair", "x.r")


@query(
    "stats_cuped_variance_reduction",
    """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
         AS theta,
       ROUND((n * syy - sy * sy) * 1.0 / (n * (n - 1)), 2) AS var_y,
       ROUND(((n * syy - sy * sy) * 1.0
              - (n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
                / (n * sxx - sx * sx))
             / (n * (n - 1)), 2) AS var_adj,
       ROUND(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
              / (n * sxx - sx * sx)) / (n * syy - sy * sy), 6)
         AS reduction
FROM m
""",
)
def stats_cuped_variance_reduction(spark, sf_dir):
    """CUPED (controlled-experiment variance reduction): per-user
    pre-period spend x (first half of the event window) adjusts the
    experiment metric y (second half) by theta = cov(x,y)/var(x);
    analytically var(y_adj) = var(y) - cov^2/var(x), so ONE pass over
    integer-cents moments (n, Sx, Sy, Sxy, Sxx, Syy — all exact
    BIGINTs) yields theta, both variances, and the relative reduction.
    Every division happens once, on exact integer numerators and
    denominators, so the doubles are bit-identical cross-engine before
    rounding. The same one-pass moment sketch the OLS operator uses —
    at any scale this is a map-side partial aggregate and a one-row
    reduce."""
    e = load(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    pivot = F.lit("2024-01-16").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < pivot, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= pivot, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    # decimal(38,0) moments: the cross products (n*sxx etc.) overflow
    # BIGINT past ~sf0.5; decimals keep them exact (oracle: HUGEINT)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    n, sx, sy = dec("n"), dec("sx"), dec("sy")
    sxy, sxx, syy = dec("sxy"), dec("sxx"), dec("syy")
    cov_num = n * sxy - sx * sy
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    denom = n * (n - 1)
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(cov_num * 1.0 / varx_num, 6).alias("theta"),
        F.round(vary_num * 1.0 / denom, 2).alias("var_y"),
        F.round(
            (vary_num * 1.0 - cov_num * 1.0 * cov_num / varx_num) / denom,
            2,
        ).alias("var_adj"),
        F.round(
            (cov_num * 1.0 * cov_num / varx_num) / vary_num, 6
        ).alias("reduction"),
    )


@query(
    "stats_mann_whitney_u",
    """
WITH g AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is1
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), pv AS (
  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1, COUNT(*) AS c
  FROM g GROUP BY v
), pc AS (
  SELECT v, c1, c, SUM(c) OVER (ORDER BY v) - c AS cum_less FROM pv
), s AS (
  SELECT CAST(SUM(c1 * (2 * cum_less + c + 1)) AS HUGEINT) AS r1x2,
         CAST(SUM(c1) AS HUGEINT) AS n1,
         CAST(SUM(c - c1) AS HUGEINT) AS n2,
         CAST(SUM(c * c * c - c) AS HUGEINT) AS tie
  FROM pc
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND((r1x2 - n1 * (n1 + 1)) / 2.0, 1) AS u1,
       ROUND(((r1x2 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
             / sqrt((n1 * n2 / 12.0)
                    * ((n1 + n2 + 1)
                       - tie * 1.0 / ((n1 + n2) * (n1 + n2 - 1)))),
             6) AS z
FROM s
""",
)
def stats_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test (returned vs non-returned line
    items' quantities) with full tie correction — the nonparametric
    A/B test a heavy-tailed metric needs when the t-test's normality
    assumption fails. Rank statistics are the textbook global-window
    trap; here the joint ranking collapses to the DISTINCT-VALUE frame
    (quantity has a bounded domain) and the exclusive cumulative count
    runs through ordered_prefix_sum (range-partitioned two-phase scan,
    operators/prefix_sum.py) — no single-partition window at any
    corpus size. Doubled average ranks (2*cum_less + c + 1) keep every
    rank an exact INTEGER, so R1, U and the tie term are associative
    integer aggregates; the only doubles are the final two divisions
    and one sqrt (correctly-rounded IEEE on exact inputs =
    bit-identical cross-engine)."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    g = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_quantity").cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is1"),
    )
    pv = g.groupBy("v").agg(
        F.sum("is1").cast("long").alias("c1"),
        F.count(F.lit(1)).alias("c"),
    )
    pc = ordered_prefix_sum(pv, ["v"], "c", out_col="cumc").withColumn(
        "cum_less", F.col("cumc") - F.col("c")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = pc.agg(
        F.sum(
            dec(F.col("c1"))
            * (2 * dec(F.col("cum_less")) + dec(F.col("c")) + 1)
        ).alias("r1x2"),
        dec(F.sum("c1")).alias("n1"),
        dec(F.sum(F.col("c") - F.col("c1"))).alias("n2"),
        F.sum(
            dec(F.col("c")) * dec(F.col("c")) * dec(F.col("c"))
            - dec(F.col("c"))
        ).alias("tie"),
    )
    n1, n2, r1x2, tie = (
        F.col("n1"),
        F.col("n2"),
        F.col("r1x2"),
        F.col("tie"),
    )
    u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
    mean_u = n1 * n2 / 2.0
    var_u = (n1 * n2 / 12.0) * (
        (n1 + n2 + 1) - tie * 1.0 / ((n1 + n2) * (n1 + n2 - 1))
    )
    return s.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round((u1 - mean_u) / F.sqrt(var_u), 6).alias("z"),
    )


@query(
    "stats_anova_oneway_f",
    """
WITH x AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), per_g AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM x GROUP BY grp
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS HUGEINT) AS n_tot,
         CAST(SUM(s) AS HUGEINT) AS s_tot,
         CAST(SUM(ss) AS HUGEINT) AS ss_tot,
         SUM(s * 1.0 * s / n) AS sum_s2_over_n
  FROM per_g
)
SELECT k, CAST(n_tot AS BIGINT) AS n,
       ROUND((sum_s2_over_n - s_tot * 1.0 * s_tot / n_tot)
             / (k - 1)
             / ((ss_tot - sum_s2_over_n) / (n_tot - k)), 6) AS f_stat
FROM tot
""",
)
def stats_anova_oneway_f(spark, sf_dir):
    """One-way ANOVA F statistic: does order priority move the order
    total? SSB/SSW from one pass of per-group exact integer moments
    (n, Σx, Σx²) — the same mergeable-moment shape as OLS/CUPED, so at
    any scale this is a map-side partial aggregate into k rows and a
    one-row reduce. Doubles appear only in the final fixed expression
    over exact decimal moments (identical operation order in both
    engines — deterministic IEEE)."""
    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = o.select(
        F.col("o_orderpriority").alias("grp"), cents.alias("cents")
    ).groupBy("grp").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("cents")).alias("s"),
        F.sum(dec(F.col("cents")) * F.col("cents")).alias("ss"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(F.col("s") * 1.0 * F.col("s") / F.col("n")).alias(
            "sum_s2_over_n"
        ),
    )
    ssb = F.col("sum_s2_over_n") - F.col("s_tot") * 1.0 * F.col(
        "s_tot"
    ) / F.col("n_tot")
    ssw = F.col("ss_tot") - F.col("sum_s2_over_n")
    return tot.select(
        "k",
        F.col("n_tot").cast("long").alias("n"),
        F.round(
            ssb / (F.col("k") - 1) / (ssw / (F.col("n_tot") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@query(
    "stats_welch_ttest",
    """
WITH x AS (
  SELECT event_type AS grp,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM x GROUP BY grp
), w AS (
  SELECT MAX(CASE WHEN grp = 'click' THEN n END) AS n1,
         MAX(CASE WHEN grp = 'click' THEN s END) AS s1,
         MAX(CASE WHEN grp = 'click' THEN ss END) AS ss1,
         MAX(CASE WHEN grp = 'purchase' THEN n END) AS n2,
         MAX(CASE WHEN grp = 'purchase' THEN s END) AS s2,
         MAX(CASE WHEN grp = 'purchase' THEN ss END) AS ss2
  FROM m
), v AS (
  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         s1 * 1.0 / n1 AS m1, s2 * 1.0 / n2 AS m2,
         (ss1 - s1 * 1.0 * s1 / n1) / (n1 - 1) / n1 AS se1,
         (ss2 - s2 * 1.0 * s2 / n2) / (n2 - 1) / n2 AS se2
  FROM w
)
SELECT n1, n2,
       ROUND((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
       ROUND((se1 + se2) * (se1 + se2)
             / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 2) AS df
FROM v
""",
)
def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test (click vs purchase event values)
    with the Welch–Satterthwaite degrees of freedom — the default
    two-sample test when group variances differ. Exact integer moments
    per group (two rows), then one fixed double expression; the
    conditional pivot keeps it a single aggregation pass."""
    e = load(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("event_type").alias("grp"), cents.alias("cents"))
        .groupBy("grp")
        .agg(
            dec(F.count(F.lit(1))).alias("n"),
            dec(F.sum("cents")).alias("s"),
            F.sum(dec(F.col("cents")) * F.col("cents")).alias("ss"),
        )
    )
    pick = lambda g, c: F.max(F.when(F.col("grp") == g, F.col(c)))  # noqa: E731
    w = m.agg(
        pick("click", "n").alias("n1"),
        pick("click", "s").alias("s1"),
        pick("click", "ss").alias("ss1"),
        pick("purchase", "n").alias("n2"),
        pick("purchase", "s").alias("s2"),
        pick("purchase", "ss").alias("ss2"),
    )
    m1 = F.col("s1") * 1.0 / F.col("n1")
    m2 = F.col("s2") * 1.0 / F.col("n2")
    se1 = (
        (F.col("ss1") - F.col("s1") * 1.0 * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    se2 = (
        (F.col("ss2") - F.col("s2") * 1.0 * F.col("s2") / F.col("n2"))
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round((m1 - m2) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            (se1 + se2)
            * (se1 + se2)
            / (
                se1 * se1 / (F.col("n1") - 1)
                + se2 * se2 / (F.col("n2") - 1)
            ),
            2,
        ).alias("df"),
    )


@query(
    "stats_spearman_daily_rank_corr",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS xc,
         CAST(COUNT(*) AS BIGINT) AS yc
  FROM orders GROUP BY o_orderdate
), ranked AS (
  SELECT d,
         2 * (RANK() OVER (ORDER BY xc))
           + (COUNT(*) OVER (PARTITION BY xc)) - 1 AS rx2,
         2 * (RANK() OVER (ORDER BY yc))
           + (COUNT(*) OVER (PARTITION BY yc)) - 1 AS ry2
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(rx2) AS HUGEINT) AS sx,
         CAST(SUM(ry2) AS HUGEINT) AS sy,
         CAST(SUM(rx2 * ry2) AS HUGEINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS HUGEINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS HUGEINT) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND((n * sxy - sx * sy) * 1.0
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
             6) AS rho
FROM m
""",
)
def stats_spearman_daily_rank_corr(spark, sf_dir):
    """Spearman rank correlation between daily revenue and daily order
    count — the monotone-association measure that survives outliers and
    nonlinear scales. Tie-aware: Pearson on AVERAGE ranks (the general
    definition; the 6Σd² shortcut is wrong under ties), with doubled
    ranks (2*cum_less + cnt + 1) keeping every rank an exact integer.
    Both rank transforms run through ordered_prefix_sum over the
    distinct-value frames — the textbook RANK() OVER (ORDER BY …)
    global window never appears, so the same plan ranks a billion-row
    series. Final rho is one IEEE expression over exact decimal
    moments."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).cast("long").alias("xc"),
        F.count(F.lit(1)).cast("long").alias("yc"),
    )

    def rank2(df, col, out):
        """join back doubled average ranks for `col` (exact ints)."""
        pv = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        pc = ordered_prefix_sum(pv, [col], "c", out_col="cumc")
        pc = pc.select(
            col,
            (2 * (F.col("cumc") - F.col("c")) + F.col("c") + 1).alias(out),
        )
        # distinct-value frames are bounded by the series cardinality;
        # broadcast keeps the rank attach shuffle-free
        return df.join(F.broadcast(pc), col)

    ranked = rank2(rank2(daily, "xc", "rx2"), "yc", "ry2")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy = dec("n"), dec("sx"), dec("sy")
    sxy, sxx, syy = dec("sxy"), dec("sxx"), dec("syy")
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(
            (n * sxy - sx * sy)
            * 1.0
            / F.sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
            6,
        ).alias("rho"),
    )


@query(
    "stats_ks_two_sample",
    """
WITH g AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is1
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), pv AS (
  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
         CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
  FROM g GROUP BY v
), cum AS (
  SELECT v, SUM(c1) OVER (ORDER BY v) AS f1,
         SUM(c2) OVER (ORDER BY v) AS f2
  FROM pv
), tot AS (
  SELECT CAST(SUM(c1) AS HUGEINT) AS n1, CAST(SUM(c2) AS HUGEINT) AS n2
  FROM pv
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(MAX(ABS(f1 * n2 - f2 * n1)) * 1.0 / (n1 * n2), 6) AS d_stat,
       ROUND(MAX(ABS(f1 * n2 - f2 * n1)) * 1.0 / (n1 * n2)
             * sqrt(n1 * n2 * 1.0 / (n1 + n2)), 6) AS ks_score
FROM cum CROSS JOIN tot
GROUP BY n1, n2
""",
)
def stats_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test (returned vs non-returned
    quantities): D = max |ECDF1 - ECDF2|, plus the scaled KS score
    sqrt(n1 n2/(n1+n2))·D the asymptotic p-value keys on. The ECDF
    difference collapses to the distinct-value frame with BOTH
    cumulative counts from ONE ordered_prefix_sum pass (a struct-packed
    pair of int64 running sums — no global window anywhere), and
    |F1·n2 - F2·n1| keeps the max EXACT integer math; the only doubles
    are the final division and sqrt. Completes the distributed
    hypothesis-testing family (Mann-Whitney / ANOVA / Welch / chi² /
    KS) on one shared rank-machinery design."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sums,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    g = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_quantity").cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is1"),
    )
    pv = g.groupBy("v").agg(
        F.sum("is1").cast("long").alias("c1"),
        (F.count(F.lit(1)) - F.sum("is1")).cast("long").alias("c2"),
    )
    # ONE range-partitioned scan carries both running sums (the
    # multi-column operator form: one shuffle, one totals collect,
    # one Arrow pass for f1 AND f2)
    cum = ordered_prefix_sums(pv, ["v"], {"f1": "c1", "f2": "c2"})
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = pv.agg(
        F.sum("c1").cast("long").alias("n1t"),
        F.sum("c2").cast("long").alias("n2t"),
    )
    joined = cum.join(F.broadcast(tot))
    n1, n2 = dec("n1t"), dec("n2t")
    gap = F.abs(dec("f1") * n2 - dec("f2") * n1)
    return joined.groupBy("n1t", "n2t").agg(
        F.max(gap).alias("mx")
    ).select(
        F.col("n1t").cast("long").alias("n1"),
        F.col("n2t").cast("long").alias("n2"),
        F.round(F.col("mx") * 1.0 / (n1 * n2), 6).alias("d_stat"),
        F.round(
            F.col("mx")
            * 1.0
            / (n1 * n2)
            * F.sqrt(n1 * n2 * 1.0 / (n1 + n2)),
            6,
        ).alias("ks_score"),
    )


@query(
    "graph_degree_assortativity",
    """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % 5 = 0
),
e0 AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
e AS (
  SELECT a AS src, b AS dst FROM e0
  UNION ALL SELECT b AS src, a AS dst FROM e0
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
de AS (
  SELECT da.d AS x, db.d AS y
  FROM e JOIN deg da ON da.node = e.src JOIN deg db ON db.node = e.dst
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM de
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       ROUND((n * sxy - sx * sy) * 1.0
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
             6) AS assortativity
FROM m
""",
)
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman r): the Pearson correlation of
    endpoint degrees over every directed edge — positive means hubs
    link to hubs (social nets), negative means hubs link to leaves
    (the co-purchase graph here). Two node-id shuffles to attach
    degrees, then one exact-integer moment aggregate; the same
    co-purchase graph the k-core/triangle queries certify, so the
    whole graph family shares one construction."""
    li = (
        load(spark, sf_dir, "lineitem")["lineitem"]
        .filter(F.col("l_partkey") % 5 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e0 = (
        li.alias("a")
        .join(li.alias("b"), F.col("a.o") == F.col("b.o"))
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("a"), F.col("b.p").alias("b"))
        .distinct()
    )
    e = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    de = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("y")), "dst")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = de.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = dec("n"), dec("sx"), dec("sy")
    sxy, sxx, syy = dec("sxy"), dec("sxx"), dec("syy")
    return m.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.round(
            (n * sxy - sx * sy)
            * 1.0
            / F.sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
            6,
        ).alias("assortativity"),
    )


@query(
    "stats_contingency_chi2_cramers_v",
    """
WITH obs AS (
  SELECT r_name, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders, customer, nation, region
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND n_regionkey = r_regionkey
  GROUP BY 1, 2
), rt AS (SELECT r_name, SUM(obs) AS rt FROM obs GROUP BY 1),
ct AS (SELECT o_orderpriority, SUM(obs) AS ct FROM obs GROUP BY 1),
tot AS (
  SELECT SUM(obs) AS n, COUNT(DISTINCT r_name) AS nr,
         COUNT(DISTINCT o_orderpriority) AS nc
  FROM obs
), cells AS (
  SELECT CAST(obs.obs * tot.n - rt.rt * ct.ct AS DOUBLE) *
         CAST(obs.obs * tot.n - rt.rt * ct.ct AS DOUBLE) /
         (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) AS term,
         tot.n AS n, tot.nr AS nr, tot.nc AS nc
  FROM obs
  JOIN rt USING (r_name) JOIN ct USING (o_orderpriority) CROSS JOIN tot
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST((MAX(nr) - 1) * (MAX(nc) - 1) AS BIGINT) AS dof,
       ROUND(SUM(term) / MAX(n), 6) AS chi2,
       ROUND(sqrt(SUM(term) / MAX(n)
             / (MAX(n) * least(MAX(nr) - 1, MAX(nc) - 1))), 6) AS cramers_v
FROM cells
""",
)
def stats_contingency_chi2_cramers_v(spark, sf_dir):
    """R x C contingency analysis (customer region x order priority):
    Pearson chi-square statistic + Cramér's V effect size. One fact
    scan builds the observed table via broadcast dim joins; expected
    counts never materialize — each cell's (obs*N - rt*ct) numerator is
    an EXACT bigint (products stay < 2^53 through ~sf100, so the
    double cast is lossless and both engines square the same IEEE
    value), and the R*C-row totals attach via literal-key broadcast
    equi-joins, never a nested-loop. The cell table is dimension-
    bounded (R*C rows), not fact-bounded — the only full scan is the
    one observed-count aggregation."""
    t = load(spark, sf_dir, "orders", "customer", "nation", "region")
    joined = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    obs = joined.groupBy("r_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("obs")
    )
    rt = obs.groupBy("r_name").agg(F.sum("obs").alias("rt"))
    ct = obs.groupBy("o_orderpriority").agg(F.sum("obs").alias("ct"))
    tot = (
        obs.agg(
            F.sum("obs").alias("n"),
            F.countDistinct("r_name").alias("nr"),
            F.countDistinct("o_orderpriority").alias("nc"),
        )
        .withColumn("_k", F.lit(1))
    )
    cells = (
        obs.join(F.broadcast(rt), "r_name")
        .join(F.broadcast(ct), "o_orderpriority")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
    )
    num = (
        F.col("obs") * F.col("n") - F.col("rt") * F.col("ct")
    ).cast("double")
    term = num * num / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    agg = cells.agg(
        F.sum(term).alias("s"),
        F.max("n").alias("n"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
    )
    chi2 = F.col("s") / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "stats_theil_sen_slope",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS xc
  FROM orders GROUP BY 1
), p AS (
  SELECT (b.xc - a.xc) * 1.0 / date_diff('day', a.d, b.d) AS slope
  FROM daily a JOIN daily b ON b.d > a.d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(slope, 0.5), 6) AS slope_cents_per_day
FROM p
""",
)
def stats_theil_sen_slope(spark, sf_dir):
    """Theil–Sen estimator for the daily-revenue trend: the median of
    all pairwise slopes — the robust line fit that shrugs off the
    outlier days OLS would chase. The pair frame is CALENDAR-bounded:
    TPC-H order dates span ~2.4k days at EVERY scale factor, so the
    broadcast inequality self-join is <=2.4k x 2.4k (~3M slopes)
    whether the fact table holds 15k rows or 15B — the only
    fact-bounded work is the one daily aggregation. Slopes are exact
    bigint cent deltas over exact day counts; the median interpolates
    identically in both engines."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    a = daily.select(F.col("d").alias("d1"), F.col("xc").alias("x1"))
    b = daily.select(F.col("d").alias("d2"), F.col("xc").alias("x2"))
    pairs = a.join(F.broadcast(b), F.col("d2") > F.col("d1"))
    slopes = pairs.select(
        (
            (F.col("x2") - F.col("x1"))
            / F.datediff("d2", "d1").cast("double")
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
            "slope_cents_per_day"
        ),
    )


@query(
    "stats_kendall_tau_daily",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS xc,
         CAST(COUNT(*) AS BIGINT) AS yc
  FROM orders GROUP BY 1
), p AS (
  SELECT CASE WHEN (b.xc - a.xc) * (b.yc - a.yc) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (b.xc - a.xc) * (b.yc - a.yc) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN b.xc = a.xc THEN 1 ELSE 0 END AS tx,
         CASE WHEN b.yc = a.yc THEN 1 ELSE 0 END AS ty
  FROM daily a JOIN daily b ON b.d > a.d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       ROUND((SUM(conc) - SUM(disc)) * 1.0
             / sqrt((COUNT(*) - SUM(tx)) * 1.0 * (COUNT(*) - SUM(ty))),
             6) AS tau_b
FROM p
""",
)
def stats_kendall_tau_daily(spark, sf_dir):
    """Kendall's tau-b between daily revenue and daily order count —
    the rank-concordance companion to the Spearman query, with the
    textbook tie correction (ties in x and y shrink the denominator).
    Concordant/discordant/tied counts are exact integers off the same
    calendar-bounded pair frame as Theil–Sen (<=2.4k days at any SF,
    so the O(n^2) pair join is a constant-size broadcast regardless of
    fact rows); only the final ratio touches floating point."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc"),
        F.count(F.lit(1)).alias("yc"),
    )
    a = daily.select(
        F.col("d").alias("d1"), F.col("xc").alias("x1"), F.col("yc").alias("y1")
    )
    b = daily.select(
        F.col("d").alias("d2"), F.col("xc").alias("x2"), F.col("yc").alias("y2")
    )
    prod = (F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    p = a.join(F.broadcast(b), F.col("d2") > F.col("d1")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("x2") == F.col("x1"), 1).otherwise(0).alias("tx"),
        F.when(F.col("y2") == F.col("y1"), 1).otherwise(0).alias("ty"),
    )
    agg = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conc").alias("c"),
        F.sum("disc").alias("dd"),
        F.sum("tx").alias("tx"),
        F.sum("ty").alias("ty"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("c").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("dd"))
            * 1.0
            / F.sqrt(
                (F.col("n") - F.col("tx"))
                * 1.0
                * (F.col("n") - F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "ts_cusum_changepoint",
    """
WITH d AS (
  SELECT o_orderdate AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), p AS (
  SELECT day,
         SUM(rev) OVER (ORDER BY day) AS pt,
         ROW_NUMBER() OVER (ORDER BY day) AS t
  FROM d
), tot AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(rev) AS HUGEINT) AS tt
  FROM d
), s AS (
  SELECT day,
         ABS(tot.n * CAST(pt AS HUGEINT) - CAST(t AS HUGEINT) * tot.tt)
           AS stat,
         tot.n AS n
  FROM p CROSS JOIN tot
)
SELECT day AS change_day,
       ROUND(CAST(stat AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6)
         AS max_cusum_dollars
FROM s ORDER BY stat DESC, day ASC LIMIT 1
""",
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detector on the daily-revenue series: the day
    t maximizing |sum_{i<=t}(x_i - mean)| — where the level shift
    happened, if any. The statistic is kept EXACT by scaling out the
    fractional mean: |n*P_t - t*T| in decimal(38,0) (P_t = inclusive
    prefix sum via the distributed two-phase scan, never a global
    window over the fact table; t = a prefix count on the same pass
    input). Ties break to the earliest day; the only floats are the
    final rescale back to dollars (/n/100) and rounding. The series is
    calendar-bounded, so the sort-limit is over <=2.6k rows at any
    SF."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sums,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    p = ordered_prefix_sums(
        daily, ["day"], {"pt": F.col("rev"), "t": F.lit(1)}
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rev").cast("decimal(38,0)").alias("tt"),
    ).withColumn("_k", F.lit(1))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = p.withColumn("_k", F.lit(1)).join(F.broadcast(tot), "_k").select(
        "day",
        F.abs(F.col("n") * dec("pt") - dec("t") * F.col("tt")).alias("stat"),
        "n",
    )
    return (
        s.orderBy(F.col("stat").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.round(
                F.col("stat").cast("double")
                / F.col("n").cast("double")
                / 100,
                6,
            ).alias("max_cusum_dollars"),
        )
    )


@query(
    "ts_cross_correlation_lags",
    """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), lags AS (SELECT * FROM (VALUES (0),(1),(2),(3),(7)) AS t(lag)),
j AS (
  SELECT lags.lag, a.rev, b.cnt
  FROM d a CROSS JOIN lags
  JOIN d b ON b.day = a.day + CAST(lags.lag AS INTEGER)
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(corr(rev, cnt), 6) AS r
FROM j GROUP BY 1 ORDER BY 1
""",
)
def ts_cross_correlation_lags(spark, sf_dir):
    """CROSS-correlation between two series — daily revenue x_t against
    daily order count y_{t+k} for k in {0,1,2,3,7} (does today's
    revenue co-move with order volume k days later?). The lag
    alignment is an EQUI-join on the shifted date (explode of 5 lag
    literals, then day+lag = day), never an inequality join or a
    global window; per-lag Pearson r is the shared one-pass co-moment
    sketch. The joined frame is calendar-bounded (<=2.6k days x 5
    lags)."""
    o = load(spark, sf_dir, "orders")["orders"]
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    expanded = d.select(
        "day",
        "rev",
        F.explode(F.array(*[F.lit(k) for k in (0, 1, 2, 3, 7)])).alias("lag"),
    ).withColumn("jday", F.date_add("day", F.col("lag")))
    joined = expanded.join(
        d.select(F.col("day").alias("jday"), "cnt"), "jday"
    )
    return (
        joined.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.corr("rev", "cnt"), 6).alias("r"),
        )
        .select(F.col("lag").cast("long"), "n_days", "r")
        .orderBy("lag")
    )


# One IRLS step in SQL: eta from the incoming betas, sigmoid quantized
# to the 2^-30 grid (ROUND half-away-from-zero in BOTH engines), w/z
# derived from the quantized p, then the five weighted moments rounded
# to integer 2^-20 units and summed as BIGINT (associative => engine-
# and partitioning-independent), and the 2x2 Cramer solve spelled out
# with the exact operation tree operators/logreg.py uses in Python.
_LOGREG_STEP_SQL = """
{p_cte} AS (
  SELECT y, x, eta,
         LEAST(GREATEST(ROUND((1.0 / (1.0 + EXP(-eta))) * 1073741824.0)
                          / 1073741824.0,
                        1.0 / 1048576.0),
               1.0 - 1.0 / 1048576.0) AS p
  FROM {eta_cte}
),
{w_cte} AS (SELECT y, x, eta, p, p * (1.0 - p) AS w FROM {p_cte}),
{z_cte} AS (
  SELECT y, x, w, eta + (y - p) / w AS z FROM {w_cte}
),
{m_cte} AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(w * 1048576.0) AS BIGINT)) AS a00,
         SUM(CAST(ROUND(w * x * 1048576.0) AS BIGINT)) AS a01,
         SUM(CAST(ROUND(w * x * x * 1048576.0) AS BIGINT)) AS a11,
         SUM(CAST(ROUND(w * z * 1048576.0) AS BIGINT)) AS b0,
         SUM(CAST(ROUND(w * x * z * 1048576.0) AS BIGINT)) AS b1
  FROM {z_cte}
),
{d_cte} AS (
  SELECT n, a00 / 1048576.0 AS a00d, a01 / 1048576.0 AS a01d,
         a11 / 1048576.0 AS a11d, b0 / 1048576.0 AS b0d,
         b1 / 1048576.0 AS b1d
  FROM {m_cte}
),
{beta_cte} AS (
  SELECT n,
         (a11d * b0d - a01d * b1d)
           / (a00d * a11d - a01d * a01d) AS bb0,
         (a00d * b1d - a01d * b0d)
           / (a00d * a11d - a01d * a01d) AS bb1
  FROM {d_cte}
)"""


def _logreg_step(i: int, eta_cte: str) -> str:
    return _LOGREG_STEP_SQL.format(
        p_cte=f"p{i}",
        w_cte=f"w{i}",
        z_cte=f"z{i}",
        m_cte=f"m{i}",
        d_cte=f"d{i}",
        beta_cte=f"beta{i}",
        eta_cte=eta_cte,
    )


_LOGREG_ORACLE = (
    """
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         l_quantity / 64.0 AS x
  FROM lineitem
),
s1 AS (SELECT y, x, 0.0 * 1.0 + 0.0 * x AS eta FROM base),
"""
    + _logreg_step(1, "s1")
    + """,
s2 AS (SELECT y, x, bb0 * 1.0 + bb1 * x AS eta FROM base, beta1),
"""
    + _logreg_step(2, "s2")
    + """
SELECT CAST(n AS BIGINT) AS n, ROUND(bb0, 6) AS beta0,
       ROUND(bb1, 6) AS beta1
FROM beta2
"""
)


@query(
    "stats_logreg_irls_newton",
    _LOGREG_ORACLE,
    doc="Logistic regression (intercept + quantity), two exactly-"
    "quantized IRLS steps; the DuckDB oracle replays the identical "
    "algorithm in SQL including the 2x2 Cramer solves.",
)
def stats_logreg_irls_newton(spark, sf_dir):
    """Logistic regression of return probability on quantity via two
    Newton-IRLS steps (operators/logreg.py). Each step is ONE
    distributed aggregation (per-row sigmoid + working weights in
    whole-stage codegen, five moment sums with map-side combine) and a
    2x2 driver solve — so a 100 TB fit is two fact scans, no
    per-iteration shuffle growth, no Python row loops. The oracle
    replays the same quantized algorithm in pure SQL: the sigmoid is
    snapped to a 2^-30 grid and every moment term to integer 2^-20
    units before summation, making the only transcendental (exp)
    contribute one rounding decision per row and everything else exact
    dyadic IEEE arithmetic — cross-engine equality is engineered.
    Feature x = l_quantity/64 (dyadic: division by a power of two is
    exact) keeps the step-1 moments integer-exact with ZERO rounding
    decisions."""
    from station_data_ingestion_spark.operators.logreg import (
        logreg_irls_fit,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
        (F.col("l_quantity") / F.lit(64.0)).alias("x"),
    )
    fit = logreg_irls_fit(base, ["x"], "y", steps=2)
    return spark.range(1).select(
        F.lit(fit["n"]).cast("long").alias("n"),
        F.round(F.lit(fit["betas"][0]), 6).alias("beta0"),
        F.round(F.lit(fit["betas"][1]), 6).alias("beta1"),
    )


@query(
    "stats_brown_forsythe_levene",
    """
WITH li AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
med AS (SELECT grp, median(cents) AS m FROM li GROUP BY grp),
dev AS (
  SELECT li.grp, CAST(ROUND(ABS(cents - m) * 2.0) AS BIGINT) AS d2
  FROM li JOIN med ON li.grp = med.grp
),
per_g AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(d2) AS HUGEINT) AS s,
         CAST(SUM(CAST(d2 AS HUGEINT) * d2) AS HUGEINT) AS ss
  FROM dev GROUP BY grp
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS HUGEINT) AS n_tot,
         CAST(SUM(s) AS HUGEINT) AS s_tot,
         CAST(SUM(ss) AS HUGEINT) AS ss_tot,
         SUM(s * 1.0 * s / n) AS sum_s2_over_n
  FROM per_g
)
SELECT k, CAST(n_tot AS BIGINT) AS n,
       ROUND((sum_s2_over_n - s_tot * 1.0 * s_tot / n_tot) / (k - 1)
             / ((ss_tot - sum_s2_over_n) / (n_tot - k)), 6) AS bf_stat
FROM tot
""",
)
def stats_brown_forsythe_levene(spark, sf_dir):
    """Brown-Forsythe test (Levene with median centers): are price
    variances homogeneous across return-flag groups? Robust
    heteroscedasticity check = one-way ANOVA over |x - median_g|. The
    per-group exact medians come from ONE group-aggregate (k or k+0.5
    over integer cents — doubling the deviations makes them exact
    integers again), joined back as a k-row broadcast; the F statistic
    then reuses the exact HUGEINT/decimal moment pipeline of
    stats_anova_oneway_f. Two fact scans, both map-side combined — no
    windows over raw rows, so group skew cannot serialize a task."""
    li = load(spark, sf_dir, "lineitem")["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    med = li.groupBy("grp").agg(F.expr("percentile(cents, 0.5)").alias("m"))
    dev = li.join(F.broadcast(med), "grp").select(
        "grp",
        F.round(F.abs(F.col("cents") - F.col("m")) * 2.0)
        .cast("long")
        .alias("d2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = dev.groupBy("grp").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("d2")).alias("s"),
        F.sum(dec(F.col("d2")) * F.col("d2")).alias("ss"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(F.col("s") * 1.0 * F.col("s") / F.col("n")).alias(
            "sum_s2_over_n"
        ),
    )
    ssb = F.col("sum_s2_over_n") - F.col("s_tot") * 1.0 * F.col(
        "s_tot"
    ) / F.col("n_tot")
    ssw = F.col("ss_tot") - F.col("sum_s2_over_n")
    return tot.select(
        "k",
        F.col("n_tot").cast("long").alias("n"),
        F.round(
            ssb / (F.col("k") - 1) / (ssw / (F.col("n_tot") - F.col("k"))),
            6,
        ).alias("bf_stat"),
    )


@query(
    "stats_two_proportion_ztest",
    """
WITH x AS (
  SELECT l_linestatus AS grp,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem WHERE l_linestatus IN ('O', 'F')
), m AS (
  SELECT
    CAST(SUM(CASE WHEN grp = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN grp = 'O' THEN r ELSE 0 END) AS BIGINT) AS x1,
    CAST(SUM(CASE WHEN grp = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN grp = 'F' THEN r ELSE 0 END) AS BIGINT) AS x2
  FROM x
)
SELECT n1, x1, n2, x2,
       ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / SQRT(CAST(x1 + x2 AS DOUBLE) / (n1 + n2)
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)),
             6) AS z_stat
FROM m
""",
)
def stats_two_proportion_ztest(spark, sf_dir):
    """Two-proportion pooled z-test (A/B conversion comparison): does
    the return rate differ between open and finished line statuses? One agg
    pass produces the four exact integer counts (map-side combined at
    any SF); the z statistic is a fixed double expression over them
    written with the identical operation tree in both engines, so IEEE
    determinism carries end-to-end with zero per-row float math."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    x = li.filter(F.col("l_linestatus").isin("O", "F")).select(
        F.col("l_linestatus").alias("grp"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    m = x.agg(
        F.sum(F.when(F.col("grp") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == "O", F.col("r")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("grp") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grp") == "F", F.col("r")).otherwise(0))
        .cast("long")
        .alias("x2"),
    )
    pp = (F.col("x1") + F.col("x2")) * 1.0 / (F.col("n1") + F.col("n2"))
    z = (
        F.col("x1") * 1.0 / F.col("n1") - F.col("x2") * 1.0 / F.col("n2")
    ) / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return m.select(
        "n1", "x1", "n2", "x2", F.round(z, 6).alias("z_stat")
    )


@query(
    "stats_gini_by_priority",
    """
WITH x AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey AS k
  FROM orders
),
r AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, k) AS i
  FROM x
),
g AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS sx,
         CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS six
  FROM r GROUP BY grp
)
SELECT grp, CAST(n AS BIGINT) AS n_orders,
       ROUND((2.0 * six - (n + 1) * 1.0 * sx) / (n * 1.0 * sx), 6)
         AS gini
FROM g
""",
    doc="Gini coefficient of order value per priority: global "
    "prefix-sum rank decomposition — no per-group window over raw "
    "rows; oracle uses the direct ranked form.",
)
def stats_gini_by_priority(spark, sf_dir):
    """GINI COEFFICIENT of order-value concentration per priority —
    the inequality metric every revenue dashboard wants. The ranked
    formula G = (2*Σi*x_i - (n+1)*Σx) / (n*Σx) needs per-group ranks
    over millions of rows; a group-partitioned window would push each
    group through ONE task (5 groups = parallelism 5), so the ranks
    are decomposed instead: ONE global prefix count over the total
    order (grp, cents, k) — distributed via operators/prefix_sum.py —
    gives global positions; per-group rank = position - (group's first
    position - 1), so Σi*x = Σpos*x - offset*Σx, all exact
    decimal(38) integer sums, one fixed IEEE expression at the end.
    The oracle computes the same statistic from the textbook
    PARTITION BY window — two independent derivations, one answer."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    pos = ordered_prefix_sum(o, ["grp", "cents", "k"], F.lit(1), "pos")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = pos.groupBy("grp").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("cents")).alias("sx"),
        F.sum(dec(F.col("pos")) * F.col("cents")).alias("sposx"),
        dec(F.min("pos")).alias("minpos"),
    )
    # per-group rank i = pos - (minpos - 1)  =>  six = sposx - (minpos-1)*sx
    six = F.col("sposx") - (F.col("minpos") - 1) * F.col("sx")
    return g.select(
        "grp",
        F.col("n").cast("long").alias("n_orders"),
        F.round(
            (2.0 * six - (F.col("n") + 1) * 1.0 * F.col("sx"))
            / (F.col("n") * 1.0 * F.col("sx")),
            6,
        ).alias("gini"),
    )


@query(
    "stats_hill_tail_index",
    """
WITH tail AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders ORDER BY c DESC, o_orderkey LIMIT 500
),
t AS (SELECT MIN(c) AS tmin FROM tail),
s AS (
  SELECT CAST(SUM(CAST(ROUND(LN(CAST(c AS DOUBLE) / tmin)
                             * 1000000000.0) AS BIGINT)) AS BIGINT)
           AS nanolns
  FROM tail, t
)
SELECT CAST(500 AS BIGINT) AS k, t.tmin AS threshold_cents,
       ROUND(500.0 / (s.nanolns / 1000000000.0), 6) AS hill_alpha
FROM s, t
""",
    doc="Hill tail-index estimator over the top-500 order values: "
    "per-term integer-nanobit logs, TakeOrdered tail cut.",
)
def stats_hill_tail_index(spark, sf_dir):
    """HILL ESTIMATOR of the power-law tail index — the MLE behind
    'how heavy is this distribution's tail' (revenue concentration,
    token frequencies, degree distributions). The k=500 tail is a
    TakeOrderedAndProject cut (per-partition top-k then a driver
    merge, never a global sort); ln(x/threshold) terms are rounded to
    integer nanounits before the sum so accumulation order cannot
    move the estimate; one IEEE division at the end. Complements the
    regression-based Zipf fit (text_zipf_slope) with the estimator
    statisticians actually use for tails."""
    o = load(spark, sf_dir, "orders")["orders"]
    tail = (
        o.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            F.col("o_orderkey").alias("k"),
        )
        .orderBy(F.col("c").desc(), F.col("k"))
        .limit(500)
    )
    t = tail.agg(F.min("c").alias("tmin"))
    s = tail.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.round(
                F.log(F.col("c").cast("double") / F.col("tmin"))
                * F.lit(1000000000.0)
            ).cast("long")
        )
        .cast("long")
        .alias("nanolns"),
        F.first("tmin").alias("tmin"),
    )
    return s.select(
        F.lit(500).cast("long").alias("k"),
        F.col("tmin").alias("threshold_cents"),
        F.round(
            F.lit(500.0) / (F.col("nanolns") / F.lit(1000000000.0)), 6
        ).alias("hill_alpha"),
    )


@query(
    "agg_weighted_median_by_flag",
    """
WITH x AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey * 10 + l_linenumber AS k
  FROM lineitem
),
c AS (
  SELECT grp, cents, w,
         SUM(w) OVER (PARTITION BY grp ORDER BY cents, k) AS cumw,
         SUM(w) OVER (PARTITION BY grp) AS totw
  FROM x
)
SELECT grp, CAST(MIN(totw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
         AS weighted_median_cents
FROM c GROUP BY grp
""",
    doc="Weighted median per group via ONE global prefix sum (no "
    "per-group window over raw rows); textbook windowed oracle.",
)
def agg_weighted_median_by_flag(spark, sf_dir):
    """WEIGHTED MEDIAN (quantity-weighted price) per return flag — the
    robust 'typical traded price'. Same rank decomposition as
    stats_gini_by_priority: a per-group cumulative weight would need a
    group-partitioned window over millions of rows (parallelism =
    #groups), so ONE distributed prefix sum over the total order
    (grp, cents, k) supplies global cumulative weights, the per-group
    offset is the group's first cum-minus-own-weight, and the lower
    weighted median is the smallest value whose doubled in-group
    cumulative weight reaches the group total. Exact integer
    arithmetic end-to-end; DuckDB replays the textbook PARTITION BY
    form."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
    )
    ps = ordered_prefix_sum(li, ["grp", "cents", "k"], "w", "cumw")
    g = ps.groupBy("grp").agg(
        F.min(F.col("cumw") - F.col("w")).alias("offw"),
        F.sum("w").cast("long").alias("totw"),
    )
    j = ps.join(F.broadcast(g), "grp")
    return (
        j.filter(2 * (F.col("cumw") - F.col("offw")) >= F.col("totw"))
        .groupBy("grp")
        .agg(
            F.min("totw").cast("long").alias("total_weight"),
            F.min("cents").cast("long").alias("weighted_median_cents"),
        )
    )
