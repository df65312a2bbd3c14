"""Temporal-join queries: as-of join and bucketed range join over events.

These exercise operators/temporal.py -- operators the reference lacks
entirely (SURVEY.md §2.4: no theta/range/as-of joins) and Spark has no
single builtin for. The DuckDB oracles use native ASOF JOIN / a plain
range-predicate join, proving the composed Spark plans implement the
same semantics with equi-join shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from station_data_ingestion_spark.queries.registry import load, query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "asof_purchase_last_click",
    f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       c.click_id,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def asof_purchase_last_click(spark, sf_dir):
    """Backward-inclusive as-of join: each purchase matched to the same
    user's most recent click. Clicks are pre-deduped per (user, ts) so
    ties are deterministic in both engines. One shuffle on user_id."""
    e = load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        suffix="_c",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("click_id_c").alias("click_id"),
        F.date_format("ts_c", _TS_FMT).alias("click_ts"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_c"))
        ).alias("gap_us"),
    )


@query(
    "range_join_signup_hour_activity",
    """
WITH signups AS (
  SELECT event_id AS signup_id, user_id, ts AS s_ts,
         ts + INTERVAL 1 HOUR AS e_ts
  FROM events WHERE event_type = 'signup'
)
SELECT s.signup_id, s.user_id,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(ev.value * 10000) AS BIGINT)) / 10000.0 AS total_value
FROM signups s JOIN events ev
  ON s.user_id = ev.user_id AND ev.ts >= s.s_ts AND ev.ts < s.e_ts
GROUP BY s.signup_id, s.user_id
""",
)
def range_join_signup_hour_activity(spark, sf_dir):
    """Bucketed range join: events within 1 hour after each signup by the
    same user, aggregated per signup. The interval explodes into at most
    2 hour-buckets, so the theta join runs as a plain equi-join."""
    e = load(spark, sf_dir, "events")["events"]
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e_ts"),
    )
    j = range_join_bucketed(
        e.select("user_id", "ts", "value"),
        signups,
        on=["user_id"],
        left_ts="ts",
        right_start="s_ts",
        right_end="e_ts",
        bucket_seconds=3600,
    )
    return j.groupBy("signup_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias(
            "total_value"
        ),
    )


@query(
    "skew_salted_user_join",
    """
WITH s AS (
  SELECT user_id, COUNT(*) AS n_purch
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(COALESCE(s.n_purch, 0)) AS BIGINT) AS total_purch
FROM events e LEFT JOIN s ON e.user_id = s.user_id
GROUP BY e.event_type
""",
)
def skew_salted_user_join(spark, sf_dir):
    """The explicit skew-mitigation operator under the oracle gate:
    events (big side) left-join a per-user purchase count through
    salted_join (8 salt buckets, event_id-hashed spread), so a
    pathologically hot user occupies 8 shuffle partitions instead of 1.
    Results must equal a plain join -- the oracle IS the plain join."""
    from station_data_ingestion_spark.operators.skew import salted_join

    e = load(spark, sf_dir, "events")["events"]
    small = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    joined = salted_join(
        e.select("event_id", "user_id", "event_type"),
        small,
        on=["user_id"],
        n_salt=8,
        big_unique_cols=["event_id"],
        how="left",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("n_purch"), F.lit(0))).alias("total_purch"),
    )


@query(
    "ts_gap_fill_linear_interpolate",
    """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_v
  FROM events WHERE hour(ts) % 3 = 0
  GROUP BY event_type, date_trunc('hour', ts)
),
j AS (
  SELECT grid.event_type, grid.h, hourly.avg_v,
         LAST_VALUE(hourly.avg_v IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN hourly.avg_v IS NOT NULL THEN grid.h END
                    IGNORE NULLS) OVER wp AS ph,
         FIRST_VALUE(hourly.avg_v IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN hourly.avg_v IS NOT NULL THEN grid.h END
                     IGNORE NULLS) OVER wn AS nh
  FROM grid LEFT JOIN hourly
    ON hourly.event_type = grid.event_type AND hourly.h = grid.h
  WINDOW wp AS (PARTITION BY grid.event_type ORDER BY grid.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY grid.event_type ORDER BY grid.h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour_bucket,
       FLOOR((CASE
         WHEN ph IS NULL OR nh IS NULL THEN NULL
         WHEN nh = ph THEN pv
         ELSE pv + (nv - pv) * (CAST(epoch_us(h) - epoch_us(ph) AS DOUBLE)
                                / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
       END) * 10000 + 0.5) / 10000.0 AS value_interp
FROM j
""",
)
def ts_gap_fill_linear_interpolate(spark, sf_dir):
    """Gap-filling with LINEAR interpolation (the other half of the
    hypertable-resample surface next to ts_resample_ffill_hourly): the
    observed series is artificially sparsified to every-3rd-hour samples,
    snapped to a dense hourly grid, and interior gaps are interpolated
    between the bracketing observations; leading/trailing edges stay
    null.

    Build: two ignorenulls running windows (last-before + first-after)
    over grid-sized partitions carry both the bracketing values and
    their timestamps; the interpolation itself is pure arithmetic. Scale:
    windows run over |types| x |hours| grid rows, never the raw events.
    """
    e = load(spark, sf_dir, "events")["events"]
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    grid = e.select("event_type").distinct().crossJoin(F.broadcast(hours))
    hourly = (
        e.filter(F.hour("ts") % 3 == 0)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
                / F.count(F.lit(1))
            ).alias("avg_v")
        )
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("avg_v").isNotNull(), F.col("h"))
    j = (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.last("avg_v", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
            F.first("avg_v", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_h, ignorenulls=True).over(wn).alias("nh"),
        )
    )
    frac = (
        (F.unix_micros("h") - F.unix_micros("ph")).cast("double")
        / (F.unix_micros("nh") - F.unix_micros("ph")).cast("double")
    )
    interp = (
        F.when(F.col("ph").isNull() | F.col("nh").isNull(), F.lit(None))
        .when(F.col("nh") == F.col("ph"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    # floor(x*1e4 + 0.5) instead of round(x, 4): both engines floor
    # identically on identical doubles, while ROUND's half-tie mode
    # differs (3 of ~3.5k rows flipped the last digit)
    return j.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour_bucket"),
        (F.floor(interp * 10000 + F.lit(0.5)) / 10000.0).alias("value_interp"),
    )


@query(
    "asof_forward_purchase_next_error",
    f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
errors AS (
  SELECT user_id, ts, MAX(event_id) AS err_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
),
m AS (
  SELECT p.event_id, p.user_id, p.ts AS p_ts, MIN(e.ts) AS e_ts
  FROM purchases p LEFT JOIN errors e
    ON e.user_id = p.user_id AND e.ts >= p.ts
  GROUP BY p.event_id, p.user_id, p.ts
)
SELECT m.event_id, m.user_id,
       strftime(m.p_ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       e.err_id,
       strftime(m.e_ts, '{_TS_FMT_DUCK}') AS error_ts,
       CAST(epoch_us(m.e_ts) - epoch_us(m.p_ts) AS BIGINT) AS gap_us
FROM m LEFT JOIN errors e ON e.user_id = m.user_id AND e.ts = m.e_ts
""",
)
def asof_forward_purchase_next_error(spark, sf_dir):
    """FORWARD as-of join (direction='forward'): each purchase matched
    to the same user's next error at-or-after it — the impact-analysis
    twin of the backward as-of. Same one-shuffle union+window plan,
    frame flipped to current->following. Errors pre-deduped per
    (user, ts) for tie determinism."""
    e = load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
    )
    j = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["err_id"],
        suffix="_e",
        direction="forward",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("err_id_e").alias("err_id"),
        F.date_format("ts_e", _TS_FMT).alias("error_ts"),
        (F.unix_micros(F.col("ts_e")) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )


@query(
    "asof_tolerance_purchase_click",
    f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
matched AS (
  SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS cts, c.click_id
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id,
       strftime(pts, '{_TS_FMT_DUCK}') AS purchase_ts,
       CASE WHEN epoch_us(pts) - epoch_us(cts) <= 1800 * 1000000
            THEN click_id END AS click_id,
       CASE WHEN epoch_us(pts) - epoch_us(cts) <= 1800 * 1000000
            THEN strftime(cts, '{_TS_FMT_DUCK}') END AS click_ts
FROM matched
""",
)
def asof_tolerance_purchase_click(spark, sf_dir):
    """Backward as-of join with a 30-minute TOLERANCE (pandas
    merge_asof tolerance parity): a nearest click older than the bound
    is no match — the purchase keeps nulls instead of a stale
    attribution. Same one-shuffle union+window plan; the tolerance is a
    per-row predicate on the matched struct."""
    e = load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        suffix="_c",
        tolerance_seconds=1800,
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("click_id_c").alias("click_id"),
        F.date_format("ts_c", _TS_FMT).alias("click_ts"),
    )


@query(
    "join_interval_overlap_sessions",
    """
WITH p AS (
  SELECT user_id, event_id AS p_id, ts AS ps,
         ts + INTERVAL 120 MINUTE AS pe
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS c_id, ts AS cs,
         ts + INTERVAL 60 MINUTE AS ce
  FROM events WHERE event_type = 'click'
)
SELECT p.p_id, c.c_id, p.user_id AS user_id,
       CAST(date_diff('second',
            GREATEST(p.ps, c.cs), LEAST(p.pe, c.ce)) AS BIGINT)
       AS overlap_sec
FROM p JOIN c ON p.user_id = c.user_id
 AND p.ps < c.ce AND c.cs < p.pe
""",
)
def join_interval_overlap_sessions(spark, sf_dir):
    """Interval-interval OVERLAP join (operators/temporal.py:
    interval_overlap_join): purchase activity windows [ts, ts+2h) x
    click windows [ts, ts+1h) per user, emitting each overlapping pair
    once with its exact overlap length. Both sides bucket-explode and
    meet on bucket equality — the exact predicate only ever sees
    bucket-colocated pairs, so a whale user costs its bucket-pair count,
    never |P|x|C|. Touching endpoints (half-open) do not match — same
    rule in the oracle (strict <)."""
    from station_data_ingestion_spark.operators.temporal import (
        interval_overlap_join,
    )

    ev = load(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("ps"),
        (F.col("ts") + F.expr("INTERVAL 120 MINUTES")).alias("pe"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("cs"),
        (F.col("ts") + F.expr("INTERVAL 60 MINUTES")).alias("ce"),
    )
    pairs = interval_overlap_join(
        p, c, ["user_id"], "ps", "pe", "cs", "ce", bucket_seconds=7200
    )
    return pairs.select(
        "p_id",
        "c_id",
        "user_id",
        (
            F.least(F.col("pe"), F.col("ce")).cast("long")
            - F.greatest(F.col("ps"), F.col("cs")).cast("long")
        ).cast("long").alias("overlap_sec"),
    )


@query(
    "join_knearest_clicks_per_purchase",
    """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS c_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.p_id, c.c_id,
         ABS(epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 1000000 AS dist_sec,
         ROW_NUMBER() OVER (
           PARTITION BY p.p_id
           ORDER BY ABS(epoch_us(p.p_ts) - epoch_us(c.c_ts)), c.c_id
         ) AS rk
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_ts >= p.p_ts - INTERVAL 2 HOUR
   AND c.c_ts <= p.p_ts + INTERVAL 2 HOUR
)
SELECT p_id, c_id, CAST(dist_sec AS BIGINT) AS dist_sec,
       CAST(rk AS BIGINT) AS rk
FROM cand WHERE rk <= 3
""",
)
def join_knearest_clicks_per_purchase(spark, sf_dir):
    """k-nearest temporal join: for every purchase, the 3 nearest
    clicks by absolute time distance within a ±2h horizon — the
    generalization of the as-of join (k=1, one direction) used for
    context attribution. Candidates come from the bucketed range join
    (clicks exploded into 2h buckets, purchases probe their bucket), so
    the ranking window only ever sees horizon-bounded pairs — never a
    per-user cartesian; ties break on click id for a total order.
    Distances are integer microsecond math truncated to whole seconds
    identically in both engines."""
    from station_data_ingestion_spark.operators.temporal import (
        range_join_bucketed,
    )

    ev = load(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        (F.col("ts") + F.expr("INTERVAL -2 HOURS")).alias("w_lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_hi"),
    )
    cand = range_join_bucketed(
        p,
        c,
        ["user_id"],
        left_ts="p_ts",
        right_start="w_lo",
        right_end="w_hi",
        bucket_seconds=4 * 3600,
        include_start=True,
        include_end=True,
    )
    dist_us = F.abs(F.unix_micros("p_ts") - F.unix_micros("c_ts"))
    w = Window.partitionBy("p_id").orderBy(dist_us, "c_id")
    return (
        cand.select(
            "p_id",
            "c_id",
            F.expr(
                "abs(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000"
            ).alias("dist_sec"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "p_id", "c_id", F.col("dist_sec").cast("long"),
            F.col("rk").cast("long"),
        )
    )


@query(
    "ts_seasonal_naive_backtest",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
fc AS (
  SELECT d, cents,
         LAG(cents, 7) OVER (ORDER BY d) AS fcst
  FROM daily
)
SELECT CAST(d AS VARCHAR) AS day, cents AS actual,
       CAST(fcst AS BIGINT) AS fcst,
       CAST(ABS(cents - fcst) * 10000 // cents AS BIGINT) AS ape_bp
FROM fc
WHERE fcst IS NOT NULL AND d >= DATE '1998-01-01'
                       AND d < DATE '1998-02-01'
""",
)
def ts_seasonal_naive_backtest(spark, sf_dir):
    """SEASONAL-NAIVE FORECAST BACKTEST — the baseline every real
    forecaster is judged against: predict each day's revenue with the
    value seven days earlier and report the absolute percentage error
    in integer BASIS POINTS (|a - f| * 10000 div a — exact integer
    arithmetic end to end, so the backtest is bit-identical on any
    engine or partitioning). The lag window runs over the
    POST-AGGREGATION daily series (a few thousand rows at any fact
    scale), never the fact table; one month is returned to keep the
    gate result bounded."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    w = Window.orderBy("d")
    fc = daily.withColumn("fcst", F.lag("cents", 7).over(w))
    return (
        fc.filter(
            F.col("fcst").isNotNull()
            & (F.col("d") >= F.lit("1998-01-01").cast("date"))
            & (F.col("d") < F.lit("1998-02-01").cast("date"))
        )
        .select(
            F.col("d").cast("string").alias("day"),
            F.col("cents").alias("actual"),
            F.col("fcst").cast("long").alias("fcst"),
            F.expr(
                "CAST(ABS(cents - fcst) * 10000 DIV cents AS BIGINT)"
            ).alias("ape_bp"),
        )
    )


@query(
    "ts_dow_deseasonalized_anomalies",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY 1
),
dow AS (
  SELECT *, dayofweek(d) AS dw FROM daily
),
seas AS (
  SELECT dw, CAST(SUM(cents) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM dow GROUP BY dw
),
resid AS (
  SELECT dow.d, dow.cents, dow.dw,
         dow.cents - seas.s // seas.c AS r
  FROM dow JOIN seas ON dow.dw = seas.dw
),
stats AS (
  SELECT AVG(r * 1.0) AS mu, STDDEV_SAMP(r * 1.0) AS sd FROM resid
)
SELECT CAST(resid.d AS VARCHAR) AS day, resid.cents,
       CAST(resid.r AS BIGINT) AS residual,
       ROUND((resid.r - stats.mu) / stats.sd, 4) AS z
FROM resid CROSS JOIN stats
WHERE ABS((resid.r - stats.mu) / stats.sd) >= 2.0
""",
)
def ts_dow_deseasonalized_anomalies(spark, sf_dir):
    """SEASONAL-DECOMPOSITION anomaly detection (STL-lite): the weekly
    seasonal component is removed by subtracting each day-of-week's
    integer-division mean (exact BIGINT arithmetic — no float
    accumulation), and residual z-scores >= 2 flag the anomalous days.
    The z itself is the only float: one division of exact integer
    moments, rounded to 4 dp. All windows/aggregations run over the
    post-aggregation daily series; the fact scan is one grouped sum
    with the year filter pushed down. The threshold filter compares the
    UNROUNDED z in both engines, so boundary behavior matches."""
    o = load(spark, sf_dir, "orders")["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    dow = daily.withColumn("dw", F.dayofweek("d"))
    seas = dow.groupBy("dw").agg(
        F.sum("cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    resid = dow.join(seas, "dw").withColumn(
        "r", F.col("cents") - F.expr("s div c")
    )
    stats = resid.agg(
        F.avg(F.col("r") * 1.0).alias("mu"),
        F.stddev_samp(F.col("r") * 1.0).alias("sd"),
    )
    z = (F.col("r") - F.col("mu")) / F.col("sd")
    return (
        resid.crossJoin(F.broadcast(stats))
        .filter(F.abs(z) >= 2.0)
        .select(
            F.col("d").cast("string").alias("day"),
            "cents",
            F.col("r").cast("long").alias("residual"),
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "ts_ewma_bounded_horizon",
    """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS dn,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS xc
  FROM orders GROUP BY 1, 2
)
SELECT a.d,
       CAST(COUNT(*) AS BIGINT) AS n_src,
       ROUND(SUM(b.xc * (CAST(1 AS BIGINT) << (13 - (a.dn - b.dn))))
             * 1.0
             / SUM(CAST(1 AS BIGINT) << (13 - (a.dn - b.dn))), 4)
         AS ewma_cents
FROM daily a JOIN daily b ON b.dn BETWEEN a.dn - 13 AND a.dn
GROUP BY a.d
""",
)
def ts_ewma_bounded_horizon(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue with
    alpha = 1/2 over a bounded 14-day horizon. Two scale decisions:
    the horizon bound makes EWMA expressible as a BOUNDED-FAN-OUT
    aggregation — each day contributes to at most 14 targets via an
    offset EXPLODE + equi-join (the rolling-WAU trick), so there is no
    global ordered window and no unbounded recursive state; and
    alpha = 1/2 makes every weight an exact power of two, so numerator
    and denominator are exact int64 sums and the single final division
    is deterministic IEEE — bit-identical cross-engine with no
    tolerance. Ragged series heads normalize by the weights actually
    present (n_src < 14 on the first days)."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(
        F.unix_date(F.to_date("o_orderdate")).alias("dn"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("xc")
    )
    contrib = daily.select(
        "dn",
        "xc",
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("l"),
    ).select(
        (F.col("dn") + F.col("l")).alias("tgt_dn"),
        # shiftleft's python wrapper takes a literal bit count; the SQL
        # form accepts a column expression
        F.expr("xc * shiftleft(CAST(1 AS BIGINT), 13 - l)").alias(
            "num_part"
        ),
        F.expr("shiftleft(CAST(1 AS BIGINT), 13 - l)").alias("den_part"),
    )
    # only days that exist in the series are emitted (inner join)
    return (
        daily.select(F.col("dn").alias("tgt_dn"), "d")
        .join(contrib, "tgt_dn")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_src"),
            F.round(
                F.sum("num_part") * 1.0 / F.sum("den_part"), 4
            ).alias("ewma_cents"),
        )
    )


@query(
    "ts_rolling_median_7d",
    """
WITH d AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
)
SELECT day, cents,
       median(cents) OVER (ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS med7
FROM d
""",
    doc="Rolling 7-row exact median over the daily-revenue series via "
    "bounded frame collect + sort; DuckDB windowed median oracle.",
)
def ts_rolling_median_7d(spark, sf_dir):
    """Rolling EXACT median (7-row trailing frame) over the daily
    revenue series — the robust smoother dashboards use where a
    rolling mean chases outliers. Spark has no median window function;
    the frame is BOUNDED (7 rows), so collect_list over the frame +
    array_sort + middle-element interpolation is exact and O(1) per
    row — integer cents make the k / k+0.5 midpoints engine-stable.
    The window is global by SEMANTICS (one time series) but runs over
    the post-aggregation daily frame (<=2.6k rows at any SF), the same
    allowlisted family as the autocorrelation series."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    d = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("cents").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n - 1) / 2).cast("int") + 1)
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    return d.select(
        "day", "cents", ((lo + hi) / 2.0).alias("med7")
    )


@query(
    "asof_nearest_purchase_click",
    f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
back AS (
  SELECT p.event_id, c.click_id AS b_id, c.ts AS b_ts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.ts <= p.ts
),
fwd AS (
  SELECT p.event_id, c.click_id AS f_id, c.ts AS f_ts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.ts > p.ts
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       CASE WHEN f_ts IS NULL
              OR (b_ts IS NOT NULL
                  AND epoch_us(p.ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(p.ts))
            THEN b_id ELSE f_id END AS click_id,
       CASE WHEN f_ts IS NULL
              OR (b_ts IS NOT NULL
                  AND epoch_us(p.ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(p.ts))
            THEN CAST(epoch_us(p.ts) - epoch_us(b_ts) AS BIGINT)
            ELSE CAST(epoch_us(f_ts) - epoch_us(p.ts) AS BIGINT)
       END AS abs_gap_us
FROM purchases p
JOIN back USING (event_id) JOIN fwd USING (event_id)
""",
)
def asof_nearest_purchase_click(spark, sf_dir):
    """AS-OF JOIN, direction='nearest' (pandas merge_asof parity): each
    purchase matches the same user's click CLOSEST in time, either
    direction, exact ties preferring the backward match. Both direction
    legs ride ONE shuffle — the same sorted per-user union evaluates a
    trailing last() and a leading first() frame, then a scalar CASE
    picks the nearer struct; the oracle composes DuckDB's native
    backward and strictly-forward ASOF joins with the same tie rule.
    Completes the as-of family (backward / forward / tolerance /
    nearest). One shuffle on user_id at any scale."""
    e = load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        suffix="_c",
        direction="nearest",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("click_id_c").alias("click_id"),
        F.abs(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_c"))
        ).alias("abs_gap_us"),
    )


@query(
    "ts_holt_linear_bounded_backtest",
    """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS dn,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS xc
  FROM orders GROUP BY 1, 2
), s1 AS (
  SELECT a.dn, a.d,
         CAST(ROUND(
           SUM(b.xc * (CAST(1 AS BIGINT) << (13 - (a.dn - b.dn)))) * 100.0
           / SUM(CAST(1 AS BIGINT) << (13 - (a.dn - b.dn)))
         ) AS BIGINT) AS s1q
  FROM daily a JOIN daily b ON b.dn BETWEEN a.dn - 13 AND a.dn
  GROUP BY a.dn, a.d
), s2 AS (
  SELECT a.dn, a.d,
         CAST(ROUND(
           SUM(b.s1q * (CAST(1 AS BIGINT) << (13 - (a.dn - b.dn)))) * 1.0
           / SUM(CAST(1 AS BIGINT) << (13 - (a.dn - b.dn)))
         ) AS BIGINT) AS s2q
  FROM s1 a JOIN s1 b ON b.dn BETWEEN a.dn - 13 AND a.dn
  GROUP BY a.dn, a.d
), fc AS (
  SELECT s1.dn, s1.d,
         (2 * s1.s1q - s2.s2q) + 7 * (s1.s1q - s2.s2q) AS f7q
  FROM s1 JOIN s2 ON s1.dn = s2.dn
)
SELECT fc.d AS origin_day,
       ROUND(fc.f7q / 100.0, 2) AS forecast_cents,
       CAST(act.xc AS BIGINT) AS actual_cents,
       ROUND(abs(fc.f7q / 100.0 - act.xc), 2) AS abs_err
FROM fc JOIN daily act ON act.dn = fc.dn + 7
""",
)
def ts_holt_linear_bounded_backtest(spark, sf_dir):
    """HOLT'S LINEAR TREND forecast (Brown's double exponential
    smoothing, alpha = 1/2) with a 7-day-ahead backtest. Recursive
    smoothing distributes via the bounded-horizon identity TWICE: level
    S1 = 14-day power-of-two-weighted mean (exact int64 sums, one
    division), QUANTIZED to integer centi-cents so the second smoothing
    S2 = EWMA(S1) is again exact integer arithmetic — chaining raw
    doubles would accumulate order-dependent error; quantize-between-
    passes is the registry float rule applied to composed smoothers.
    Forecast F(t+h) = 2*S1 - S2 + h*(S1 - S2) (alpha = 1/2 collapses
    the trend gain to 1). Both passes are bounded-fan-out explode-joins
    on the post-agg daily series: no ordered global window, no
    unbounded state, each day feeds at most 14 targets. The backtest
    joins the realized value 7 days out."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(
        F.unix_date(F.to_date("o_orderdate")).alias("dn"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("xc")
    )

    def ewma_pass(df, val_col, out_col, scale):
        contrib = df.select(
            "dn",
            F.col(val_col).alias("v"),
            F.explode(F.sequence(F.lit(0), F.lit(13))).alias("l"),
        ).select(
            (F.col("dn") + F.col("l")).alias("tgt_dn"),
            F.expr("v * shiftleft(CAST(1 AS BIGINT), 13 - l)").alias("np"),
            F.expr("shiftleft(CAST(1 AS BIGINT), 13 - l)").alias("dp"),
        )
        return (
            df.select(F.col("dn").alias("tgt_dn"), "d")
            .join(contrib, "tgt_dn")
            .groupBy(F.col("tgt_dn").alias("dn"), "d")
            .agg(
                F.round(F.sum("np") * F.lit(scale) / F.sum("dp"))
                .cast("long")
                .alias(out_col)
            )
        )

    s1 = ewma_pass(daily, "xc", "s1q", 100.0)
    s2 = ewma_pass(s1, "s1q", "s2q", 1.0)
    fc = s1.join(s2.select("dn", "s2q"), "dn").select(
        "dn",
        "d",
        (
            (2 * F.col("s1q") - F.col("s2q"))
            + 7 * (F.col("s1q") - F.col("s2q"))
        ).alias("f7q"),
    )
    act = daily.select((F.col("dn") - 7).alias("dn"), F.col("xc"))
    return fc.join(act, "dn").select(
        F.col("d").alias("origin_day"),
        F.round(F.col("f7q") / 100.0, 2).alias("forecast_cents"),
        F.col("xc").alias("actual_cents"),
        F.round(F.abs(F.col("f7q") / 100.0 - F.col("xc")), 2).alias(
            "abs_err"
        ),
    )


_CONF_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY 1
),
fc AS (
  SELECT d, cents, LAG(cents, 7) OVER (ORDER BY d) AS pred FROM daily
),
cal AS (
  SELECT ABS(cents - pred) AS r FROM fc
  WHERE pred IS NOT NULL AND d < DATE '1997-07-01'
),
ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, r) AS rk,
         COUNT(*) OVER () AS n_cal
  FROM cal
),
qh AS (
  SELECT r AS q_hat, n_cal FROM ranked
  WHERE rk = CAST(CEIL((n_cal + 1) * 0.9) AS BIGINT)
),
test AS (
  SELECT ABS(cents - pred) AS r FROM fc
  WHERE pred IS NOT NULL AND d >= DATE '1997-07-01'
)
SELECT CAST(q.n_cal AS BIGINT) AS n_cal,
       CAST(q.q_hat AS BIGINT) AS q_hat_cents,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(COUNT(*) FILTER (WHERE t.r <= q.q_hat) AS BIGINT) AS n_covered,
       ROUND(COUNT(*) FILTER (WHERE t.r <= q.q_hat) * 1.0 / COUNT(*), 6)
         AS coverage
FROM test t CROSS JOIN qh q GROUP BY q.n_cal, q.q_hat
"""


@query(
    "ts_conformal_interval_backtest",
    _CONF_ORACLE,
    doc="Split-conformal prediction interval around a seasonal-naive "
    "forecast: exact order-statistic quantile on the calibration "
    "half, coverage audit on the test half.",
)
def ts_conformal_interval_backtest(spark, sf_dir):
    """SPLIT-CONFORMAL prediction intervals — the
    distribution-free way to attach a calibrated interval to ANY point
    forecast: the 90% interval half-width q_hat is the
    ceil((n+1)*0.9)-th smallest absolute residual on a held-out
    calibration window (an exact ORDER STATISTIC, no distributional
    assumption), and the test-window coverage audits the guarantee
    (>= 90% by exchangeability). Forecaster here: seasonal-naive
    lag-7 over the 1997 daily revenue series. Every quantity is an
    exact integer (cent residuals, rank positions); the single
    division is the final coverage ratio. All windows run over the
    calendar-bounded post-aggregation daily series; the one-row q_hat
    broadcasts onto the test residuals."""
    o = load(spark, sf_dir, "orders")["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    wd = Window.orderBy("d")
    fc = daily.select(
        "d", "cents", F.lag("cents", 7).over(wd).alias("pred")
    ).where(F.col("pred").isNotNull())
    split = F.lit("1997-07-01").cast("date")
    cal = fc.where(F.col("d") < split).select(
        F.abs(F.col("cents") - F.col("pred")).alias("r")
    )
    wr = Window.orderBy("r", "r")
    ranked = cal.select(
        "r",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_cal"),
    )
    qh = ranked.where(
        F.col("rk") == F.ceil((F.col("n_cal") + 1) * 0.9).cast("long")
    ).select(F.col("r").alias("q_hat"), "n_cal")
    test = fc.where(F.col("d") >= split).select(
        F.abs(F.col("cents") - F.col("pred")).alias("r")
    )
    return (
        test.crossJoin(F.broadcast(qh))
        .groupBy("n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count(F.when(F.col("r") <= F.col("q_hat"), 1))
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("q_hat").cast("long").alias("q_hat_cents"),
            "n_test",
            "n_covered",
            F.round(F.col("n_covered") * 1.0 / F.col("n_test"), 6).alias(
                "coverage"
            ),
        )
    )


@query(
    "ts_pinball_loss_p90_backtest",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         ((CAST(o_orderdate AS DATE) - DATE '1992-01-06') % 7) + 1 AS dow,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), train AS (
  SELECT dow, cents FROM daily
  WHERE d >= DATE '1995-01-01' AND d < DATE '1996-01-01'
), f AS (
  -- exact P90 order statistic per dow: value at rank ceil(0.9 * n)
  SELECT dow, cents AS p90 FROM (
    SELECT dow, cents,
           ROW_NUMBER() OVER (PARTITION BY dow ORDER BY cents) AS rn,
           COUNT(*) OVER (PARTITION BY dow) AS n
    FROM train
  ) WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT)
), test AS (
  SELECT dow, cents FROM daily
  WHERE d >= DATE '1996-01-01' AND d < DATE '1997-01-01'
)
SELECT t.dow AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(f.p90) AS BIGINT) AS p90_cents,
       CAST(SUM(CASE WHEN t.cents >= f.p90 THEN 9 * (t.cents - f.p90)
                     ELSE (f.p90 - t.cents) END) AS BIGINT)
         AS pinball_x10_sum,
       CAST(SUM(CASE WHEN t.cents >= f.p90 THEN 9 * (t.cents - f.p90)
                     ELSE (f.p90 - t.cents) END) // COUNT(*) AS BIGINT)
         AS pinball_x10_mean
FROM test t JOIN f ON f.dow = t.dow
GROUP BY t.dow
""",
)
def ts_pinball_loss_p90_backtest(spark, sf_dir):
    """Quantile-forecast evaluation with PINBALL (quantile) loss: the
    per-weekday empirical P90 of 1995 daily revenue forecasts 1996, and
    the asymmetric loss q·(y-f)⁺ + (1-q)·(f-y)⁺ scores it — the metric
    that makes quantile forecasts comparable (a P90 that never exceeds
    pays 9x when demand does). All integer: the P90 is an exact order
    statistic off the bounded per-dow daily frame, losses are x10-scaled
    integer cents so the asymmetric weights stay exact, and the mean is
    integer division. The forecast table is 7 rows — a broadcast join
    against the test year however large the corpus."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (
            F.expr("datediff(cast(o_orderdate as date), date'1992-01-06') % 7")
            + 1
        ).alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    train = daily.filter(
        (F.col("d") >= F.lit("1995-01-01")) & (F.col("d") < F.lit("1996-01-01"))
    )
    w = Window.partitionBy("dow").orderBy("cents")
    f = (
        train.select(
            "dow",
            "cents",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("dow")).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"))
        .select("dow", F.col("cents").alias("p90"))
    )
    test = daily.filter(
        (F.col("d") >= F.lit("1996-01-01")) & (F.col("d") < F.lit("1997-01-01"))
    )
    loss = F.when(
        F.col("cents") >= F.col("p90"), 9 * (F.col("cents") - F.col("p90"))
    ).otherwise(F.col("p90") - F.col("cents"))
    return (
        test.join(F.broadcast(f), "dow")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("p90").cast("long").alias("p90_cents"),
            F.sum(loss).cast("long").alias("pinball_x10_sum"),
            F.expr(
                "sum(case when cents >= p90 then 9 * (cents - p90) "
                "else p90 - cents end) div count(1)"
            )
            .cast("long")
            .alias("pinball_x10_mean"),
        )
    )
