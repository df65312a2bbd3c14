"""Event-stream analytics (batch form of the streaming surface).

Tumbling windows, sessionization (gaps-and-islands), and event funnels
over the `events` table. The Structured Streaming module runs the same
logical shapes with watermarks; these batch twins are the oracle-checkable
form (SURVEY §2.8 -> engine-provided streaming windows).

Scale notes: all aggregations key on (user_id | bucket) -- high
cardinality, even spread. Sessionization uses lag + cumulative sum inside
a per-user window: one shuffle on user_id, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, money_sum, money_sum_sql, query


@query(
    "events_tumbling_hourly",
    f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {money_sum_sql('value')} AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def events_tumbling_hourly(spark, sf_dir):
    """Tumbling 1-hour windows per event type (batch twin of the
    streaming window() aggregation)."""
    e = load(spark, sf_dir, "events")["events"]
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        money_sum(F.col("value")).alias("total_value"),
    )


@query(
    "events_sessionization",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('second',
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
FROM numbered GROUP BY user_id, session_seq
""",
)
def events_sessionization(spark, sf_dir):
    """30-minute-gap sessionization via gaps-and-islands (lag + running
    sum), the deterministic batch twin of session_window()."""
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.col("ts").cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0)
    numbered = e.select(
        "user_id", "ts", "event_id", is_new.alias("is_new_session")
    ).withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("long")
        .alias("duration_sec"),
    )


@query(
    "events_daily_active_users",
    """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(*) AS n_events
FROM events GROUP BY date_trunc('day', ts)
""",
)
def events_daily_active_users(spark, sf_dir):
    """Daily active users (exact distinct; the approx twin is
    events_approx_distinct, rows-only checked)."""
    e = load(spark, sf_dir, "events")["events"]
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("events_approx_distinct", None)
def events_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per event type.

    No oracle: HLL sketches are engine-specific (DuckDB's approx_distinct
    uses different hashing); driver records the weaker rows-only check.
    The exact twin above is the correctness anchor.
    """
    e = load(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_percentiles",
    """
SELECT event_type,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95,
       ROUND(CAST(MIN(value) AS DOUBLE), 4) AS min_v,
       ROUND(CAST(MAX(value) AS DOUBLE), 4) AS max_v
FROM events GROUP BY event_type
""",
)
def events_percentiles(spark, sf_dir):
    """Exact continuous percentiles (Spark percentile == DuckDB
    quantile_cont, both linear interpolation)."""
    e = load(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
    )


@query(
    "events_funnel_signup_purchase",
    """
SELECT s.user_id AS user_id,
       CAST(MIN(date_diff('second', s.first_signup, p.ts)) AS BIGINT)
           AS sec_to_first_purchase
FROM (SELECT user_id, MIN(ts) AS first_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id) s
JOIN events p ON p.user_id = s.user_id
             AND p.event_type = 'purchase' AND p.ts >= s.first_signup
GROUP BY s.user_id
""",
)
def events_funnel_signup_purchase(spark, sf_dir):
    """Funnel: time from first signup to first subsequent purchase."""
    e = load(spark, sf_dir, "events")["events"]
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        signups.join(
            purchases,
            (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") >= F.col("first_signup")),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.col("p_ts").cast("long") - F.col("first_signup").cast("long"))
            .cast("long")
            .alias("sec_to_first_purchase")
        )
    )
