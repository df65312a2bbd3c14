"""Behavioral analytics over the events stream: ordered funnels and
retention cohorts — the query shapes a product-analytics engine runs on
exactly this (user_id, ts, event_type) schema.

Scale shape: every stage keys on user_id, so the whole funnel is a
sequence of same-key shuffles (AQE merges them into co-partitioned
joins); retention is two aggregations on user_id then one on
(cohort, offset). No windows over the full stream, no driver loops.

[reference: none — engine-provided surface, SURVEY §2.9.]
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "events_funnel_signup_click_purchase",
    """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT s.user_id, MIN(e.ts) AS c_ts
  FROM s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'click' AND e.ts >= s.s_ts
  GROUP BY s.user_id
),
p AS (
  SELECT c.user_id, MIN(e.ts) AS p_ts
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY c.user_id
)
SELECT s.user_id,
       1 + CAST(c.user_id IS NOT NULL AS INT)
         + CAST(p.user_id IS NOT NULL AS INT) AS stage_reached
FROM s LEFT JOIN c ON s.user_id = c.user_id
       LEFT JOIN p ON s.user_id = p.user_id
""",
)
def events_funnel_signup_click_purchase(spark, sf_dir):
    """Ordered three-stage funnel (signup -> first click AFTER signup ->
    first purchase AFTER that click). Each stage is min-aggregated per
    user then joined forward — the distributed funnel idiom that avoids
    per-user sequence scans."""
    e = load(spark, sf_dir, "events")["events"]

    def first_after(prev, etype, prev_ts, out_ts):
        return (
            prev.join(
                e.filter(F.col("event_type") == etype).select(
                    F.col("user_id").alias("uid"), "ts"
                ),
                (F.col("uid") == prev.user_id) & (F.col("ts") >= F.col(prev_ts)),
            )
            .groupBy(prev.user_id)
            .agg(F.min("ts").alias(out_ts))
        )

    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = first_after(s, "click", "s_ts", "c_ts")
    p = first_after(c, "purchase", "c_ts", "p_ts")
    return (
        s.join(c.select(F.col("user_id").alias("cu")), s.user_id == F.col("cu"), "left")
        .join(p.select(F.col("user_id").alias("pu")), s.user_id == F.col("pu"), "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("cu").isNotNull().cast("int")
                + F.col("pu").isNotNull().cast("int")
            ).alias("stage_reached"),
        )
    )


@query(
    "events_retention_cohorts",
    """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_date,
       date_diff('day', f.cohort, a.d) AS day_offset,
       COUNT(*) AS n_users
FROM first_seen f JOIN activity a ON f.user_id = a.user_id
WHERE date_diff('day', f.cohort, a.d) BETWEEN 0 AND 7
GROUP BY 1, 2
""",
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen date, counted on
    each of the next 7 active days. (user_id, day) is pre-distinct'd so
    a user active many times in a day counts once."""
    e = load(spark, sf_dir, "events")["events"]
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort")
    )
    activity = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    off = F.datediff("d", "cohort")
    return (
        first_seen.join(activity, "user_id")
        .filter(off.between(0, 7))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_date"),
            off.alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_attribution_linear",
    """
WITH p AS (
  SELECT event_id AS pid, user_id, ts AS pts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS cid, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
touch AS (
  SELECT p.pid, p.cents, c.cid, c.cts,
         COUNT(*) OVER (PARTITION BY p.pid) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS r
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 1 HOUR
)
SELECT CAST(hour(cts) AS INT) AS click_hour,
       COUNT(*) AS n_touches,
       CAST(SUM(cents // n + CASE WHEN r <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS attributed_cents
FROM touch GROUP BY 1
""",
)
def events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution with EXACT penny splitting: each
    purchase's cents divide equally across the user's clicks in the
    preceding hour, remainder pennies going to the earliest clicks
    (largest-remainder; floats would drift across engines, integer
    shares cannot). The touch join is the bucketed range join; the
    per-purchase windows partition on purchase id — no global windows.
    """
    from station_data_ingestion_spark.operators.temporal import (
        range_join_bucketed,
    )

    e = load(spark, sf_dir, "events")["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    # (w_start, w_end] window directly from the bucketed join — ONE
    # bucketed range join, no unbucketed user_id-only tie-break join
    # (r4's eq_end leg was per-user cartesian: a whale user's
    # clicks x purchases melted that stage at scale)
    touch = range_join_bucketed(
        c,
        p,
        on=["user_id"],
        left_ts="cts",
        right_start="w_start",
        right_end="w_end",
        bucket_seconds=3600,
        include_start=False,
        include_end=True,
    )
    w_n = Window.partitionBy("pid")
    w_r = Window.partitionBy("pid").orderBy("cts", "cid")
    shares = touch.select(
        "pid", "cents", "cts",
        F.count(F.lit(1)).over(w_n).alias("n"),
        F.row_number().over(w_r).alias("r"),
    )
    share = F.expr("cents div n") + (
        F.col("r") <= F.col("cents") % F.col("n")
    ).cast("long")
    return shares.groupBy(F.hour("cts").cast("int").alias("click_hour")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(share).alias("attributed_cents"),
    )


@query(
    "events_longest_daily_streak",
    """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
),
grp AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT)
           AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, COUNT(*) AS len FROM grp GROUP BY user_id, anchor
),
best AS (SELECT user_id, MAX(len) AS longest FROM streaks GROUP BY user_id)
SELECT CAST(longest AS BIGINT) AS longest_streak,
       COUNT(*) AS n_users
FROM best GROUP BY 1
""",
)
def events_longest_daily_streak(spark, sf_dir):
    """Longest consecutive-day purchase streak per user (gaps-and-islands
    via the date-minus-row_number anchor), reduced to the streak-length
    distribution. Distinct from sessionization: islands are calendar
    days, not gap-bounded timestamp runs. Windows partition on user_id —
    high-cardinality, no global window."""
    e = load(spark, sf_dir, "events")["events"]
    days = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("longest"))
    return best.groupBy(F.col("longest").alias("longest_streak")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "events_funnel_time_to_convert_quantiles",
    """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT s.user_id,
         date_diff('second', s.s_ts, MIN(e.ts)) AS lat
  FROM s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts >= s.s_ts
  GROUP BY s.user_id, s.s_ts
),
pv AS (SELECT lat, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY lat),
pc AS (
  SELECT lat, c, SUM(c) OVER (ORDER BY lat) AS cum,
         SUM(c) OVER () AS n
  FROM pv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
                     THEN lat END) AS BIGINT) AS p50_sec,
       CAST(MAX(CASE WHEN cum - c < (9 * n + 9) // 10
                      AND (9 * n + 9) // 10 <= cum
                     THEN lat END) AS BIGINT) AS p90_sec
FROM pc
""",
)
def events_funnel_time_to_convert_quantiles(spark, sf_dir):
    """Time-to-convert distribution for the signup -> first-purchase
    funnel: exact P50/P90 latency in seconds — the numbers a growth
    team actually quotes (mean latency is useless under the long
    tail). Latencies come from the same min-agg forward-join funnel
    idiom (no per-user sequence scan); the quantiles are exact order
    statistics (ceil(q·n) ranks) read off the DISTINCT-LATENCY
    histogram through the two-phase prefix scan, so no global per-user
    ranking window exists at any corpus size."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    e = load(spark, sf_dir, "events")["events"]
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        s.join(
            e.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("uid"), "ts"
            ),
            (F.col("uid") == s["user_id"]) & (F.col("ts") >= F.col("s_ts")),
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("ts").alias("p_ts"))
        .select(
            (F.col("p_ts").cast("long") - F.col("s_ts").cast("long")).alias(
                "lat"
            )
        )
    )
    pv = p.groupBy("lat").agg(F.count(F.lit(1)).alias("c"))
    pc = ordered_prefix_sum(pv, ["lat"], "c", out_col="cum")
    tot = pc.agg(F.sum("c").alias("n"))
    ranks = tot.select(
        "n",
        F.expr("(n + 1) div 2").alias("r50"),
        F.expr("(9 * n + 9) div 10").alias("r90"),
    )
    return (
        pc.crossJoin(F.broadcast(ranks))
        .agg(
            F.max("n").cast("long").alias("n_converted"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("c") < F.col("r50"))
                    & (F.col("r50") <= F.col("cum")),
                    F.col("lat"),
                )
            )
            .cast("long")
            .alias("p50_sec"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("c") < F.col("r90"))
                    & (F.col("r90") <= F.col("cum")),
                    F.col("lat"),
                )
            )
            .cast("long")
            .alias("p90_sec"),
        )
    )
