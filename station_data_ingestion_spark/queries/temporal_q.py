"""Temporal-join queries: as-of join and bucketed range join over events.

These exercise operators/temporal.py -- operators the reference lacks
entirely (SURVEY.md §2.4: no theta/range/as-of joins) and Spark has no
single builtin for. The DuckDB oracles use native ASOF JOIN / a plain
range-predicate join, proving the composed Spark plans implement the
same semantics with equi-join shuffle shapes.
"""

from __future__ import annotations

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
