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
         CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
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


@query(
    "ts_resample_ffill_hourly",
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
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT grid.event_type,
       strftime(grid.h, '%Y-%m-%d %H:00') AS hour_bucket,
       LAST_VALUE(hourly.avg_v IGNORE NULLS)
         OVER (PARTITION BY grid.event_type ORDER BY grid.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM grid LEFT JOIN hourly
  ON hourly.event_type = grid.event_type AND hourly.h = grid.h
""",
)
def ts_resample_ffill_hourly(spark, sf_dir):
    """Time-series resampling: snap each event type's value series onto a
    complete hourly grid and forward-fill gaps (the hypertable-rollup /
    gap-filling shape; a station-data engine needs it for sparse sensors).

    Spark build: hourly exact-integer means -> dense grid via
    sequence()+explode of the broadcast one-row min/max aggregate (no
    driver collect) -> left join -> last(ignorenulls) running window.
    Scale: the grid is |types| x |hours| (tiny vs the event count); the
    ffill window shuffles on event_type partitions of grid size only.
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
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            / F.count(F.lit(1))
        ).alias("avg_v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour_bucket"),
            F.last("avg_v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


@query(
    "events_anomaly_zscore",
    """
WITH moments AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod,
         COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s1,
         SUM(CAST(ROUND(value * 100) AS BIGINT) * CAST(ROUND(value * 100) AS BIGINT)) AS s2
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - (m.s1 / 100.0 / m.n))
             / SQRT((m.s2 / 10000.0 - m.n * (m.s1 / 100.0 / m.n) * (m.s1 / 100.0 / m.n))
                    / (m.n - 1)), 6) AS z
FROM events e
JOIN moments m
  ON m.event_type = e.event_type AND m.hod = EXTRACT(hour FROM e.ts)
WHERE m.n > 1
  AND ABS((e.value - (m.s1 / 100.0 / m.n))
          / SQRT((m.s2 / 10000.0 - m.n * (m.s1 / 100.0 / m.n) * (m.s1 / 100.0 / m.n))
                 / (m.n - 1))) > 3
""",
)
def events_anomaly_zscore(spark, sf_dir):
    """Climatology anomaly detection: z-score each event against its
    (event_type, hour-of-day) profile; emit |z| > 3. The station-data
    shape: compare an observation with the seasonal normal.

    Moments come from exact scaled-integer sums (value is 2-decimal, so
    *100 is lossless; squares stay within int64 to ~1e9 rows/group), and
    the identical double formula on both engines keeps z bit-stable; the
    broadcast moments table joins back without reshuffling events.

    Scale: one shuffle to build 120 moment rows, then a broadcast join --
    the events scan itself never shuffles.
    """
    e = load(spark, sf_dir, "events")["events"]
    v100 = F.round(F.col("value") * 100).cast("long")
    m = (
        e.groupBy(
            F.col("event_type").alias("m_type"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v100).alias("s1"),
            F.sum(v100 * v100).alias("s2"),
        )
        .filter(F.col("n") > 1)
    )
    mean = F.col("s1") / 100.0 / F.col("n")
    var = (F.col("s2") / 10000.0 - F.col("n") * mean * mean) / (F.col("n") - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.join(
            F.broadcast(m),
            (F.col("m_type") == F.col("event_type"))
            & (F.col("hod") == F.hour(F.col("ts"))),
        )
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


@query(
    "events_rolling_wau",
    """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
days AS (SELECT DISTINCT d FROM act),
expanded AS (
  SELECT a.user_id, dd.d AS as_of
  FROM act a JOIN days dd ON dd.d >= a.d AND dd.d < a.d + 7
)
SELECT strftime(as_of, '%Y-%m-%d') AS as_of,
       COUNT(DISTINCT user_id) AS wau
FROM expanded GROUP BY 1
""",
)
def events_rolling_wau(spark, sf_dir):
    """Rolling 7-day active users per observed day (WAU). A RANGE
    window cannot COUNT DISTINCT, and re-scanning 7 days of history per
    day is quadratic-ish; the scalable idiom is bounded fan-out: each
    (user, active-day) row explodes into the <=7 as-of days it supports,
    then one distinct-count per day. Fan-out is exactly 7x the DISTINCT
    (user, day) table — independent of event volume."""
    e = load(spark, sf_dir, "events")["events"]
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = act.select("d").distinct().select(F.col("d").alias("as_of"))
    expanded = act.withColumn(
        "as_of", F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6)))
    ).join(days, "as_of", "left_semi")
    return expanded.groupBy(
        F.date_format("as_of", "yyyy-MM-dd").alias("as_of")
    ).agg(F.count_distinct("user_id").alias("wau"))


_PATTERN_CODE_SQL = """
CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
     WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
     WHEN 'error' THEN 'e' ELSE 'x' END
"""

_PATTERN_ORACLE = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg({_PATTERN_CODE_SQL}, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
),
m AS (
  SELECT user_id, LENGTH(seq) AS n_events,
         LENGTH(regexp_extract_all(seq, 's[cv]*p', 0)) AS n_matches
  FROM seqs
)
SELECT user_id, n_events, n_matches FROM m WHERE n_matches > 0
"""


@query(
    "events_pattern_match_regex",
    _PATTERN_ORACLE,
    doc="MATCH_RECOGNIZE-lite: per-user symbol sequence + leftmost "
    "non-overlapping regex count of signup->clicks/views->purchase.",
)
def events_pattern_match_regex(spark, sf_dir):
    """Row-pattern recognition (operators/sequence.py): users whose
    stream contains signup followed by only clicks/views until a
    purchase ('s[cv]*p' — an error or another signup breaks the run).
    Non-overlapping leftmost counting = MATCH_RECOGNIZE skip-past-last-
    row. The oracle rebuilds the same sequences with string_agg and the
    same regex in DuckDB."""
    from station_data_ingestion_spark.operators.sequence import (
        count_pattern,
        encode_sequences,
    )

    e = load(spark, sf_dir, "events")["events"]
    code = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .otherwise("x")
    )
    seqs = encode_sequences(
        e, key="user_id", order_cols=["ts", "event_id"], code=code
    )
    return (
        count_pattern(seqs, "s[cv]*p")
        .where(F.col("n_matches") > 0)
        .select(
            "user_id",
            F.length("seq").cast("long").alias("n_events"),
            F.col("n_matches").cast("long").alias("n_matches"),
        )
    )


_SWEEP_ORACLE = """
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
         CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM ordered
), sessions AS (
  SELECT user_id, session_seq,
         CAST(epoch(MIN(ts)) AS BIGINT) AS s,
         CAST(epoch(MAX(ts)) AS BIGINT) AS e
  FROM numbered GROUP BY user_id, session_seq
), deltas AS (
  SELECT s AS t, 1 AS d, user_id, session_seq FROM sessions
  UNION ALL
  SELECT e + 1 AS t, -1 AS d, user_id, session_seq FROM sessions
), swept AS (
  SELECT SUM(d) OVER (ORDER BY t, d, user_id, session_seq
                      ROWS UNBOUNDED PRECEDING) AS cur
  FROM deltas
)
SELECT CAST((SELECT MAX(cur) FROM swept) AS BIGINT) AS max_concurrent,
       (SELECT COUNT(*) FROM sessions) AS n_sessions
"""


@query(
    "events_max_concurrent_sessions",
    _SWEEP_ORACLE,
    doc="Peak concurrency via a DISTRIBUTED sweep line: +1/-1 deltas "
    "through the two-phase prefix sum — no global window.",
)
def events_max_concurrent_sessions(spark, sf_dir):
    """Classic sweep-line (max concurrent sessions) without a global
    window: session boundaries become +1/-1 deltas and the running
    count is the engine's distributed prefix sum
    (operators/prefix_sum.py) over the total order (t, delta, user,
    session) — ties resolve ends-at-t+1 before starts, identically in
    the oracle's window."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = F.col("ts").cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = (
        e.select("user_id", "ts", "event_id")
        .withColumn(
            "session_seq",
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s"),
            F.max(F.col("ts").cast("long")).alias("e"),
        )
    )
    deltas = sessions.select(
        F.col("s").alias("t"), F.lit(1).alias("d"), "user_id", "session_seq"
    ).unionAll(
        sessions.select(
            (F.col("e") + 1).alias("t"),
            F.lit(-1).alias("d"),
            "user_id",
            "session_seq",
        )
    )
    swept = ordered_prefix_sum(
        deltas, ["t", "d", "user_id", "session_seq"], "d", out_col="cur"
    )
    return swept.agg(F.max("cur").alias("max_concurrent")).crossJoin(
        F.broadcast(sessions.agg(F.count("*").alias("n_sessions")))
    )


@query(
    "events_props_json_extract",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
       COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0
                  THEN 1 END) AS k_mod10
FROM events GROUP BY event_type
""",
)
def events_props_json_extract(spark, sf_dir):
    """Semi-structured payload extraction on the EVENT STREAM (the
    props JSON column): typed get_json_object pushdown into plain
    aggregates — the common telemetry shape where structure lives
    inside a string column. Parsing stays JVM-side (get_json_object),
    never a Python stage."""
    e = load(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.when(k % 10 == 0, 1)).alias("k_mod10"),
    )


@query(
    "events_interval_union_length",
    """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(ROUND(value * 60000000) AS BIGINT) AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= s THEN 0 ELSE 1 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS island
  FROM flagged
), per_island AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS len_us
  FROM islands GROUP BY user_id, island
)
SELECT user_id, CAST(SUM(len_us) AS BIGINT) AS covered_us,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM per_island GROUP BY user_id
""",
)
def events_interval_union_length(spark, sf_dir):
    """Interval-union (merge-overlapping-intervals) length per user:
    each event opens a [ts, ts + value minutes] activity interval; the
    union's total measure and island count are the de-overlapped
    exposure metrics (ad exposure, machine uptime, on-call coverage).
    Gaps-and-islands via one running MAX(end) window — one shuffle on
    user_id, no self-join, integer microsecond arithmetic end to end."""
    ev = load(spark, sf_dir, "events")["events"]
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 60000000).cast("long")
        ).alias("e"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max >= F.col("s"), F.lit(0)).otherwise(F.lit(1)).alias(
            "new_island"
        ),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return per_island.groupBy("user_id").agg(
        F.sum("len_us").cast("long").alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


@query(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
), pairs AS (
  SELECT src, dst, COUNT(*) AS cnt FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 10000 // SUM(cnt) OVER (PARTITION BY src) AS BIGINT)
       AS p_bp
FROM pairs
""",
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: consecutive (src -> dst) event-type pairs via LEAD (one
    shuffle on user_id, bounded fan-out — never a self-join), then
    global pair counts with per-src transition probability in exact
    integer basis points."""
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return pairs.select(
        "src",
        "dst",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("cnt * 10000 div sum(cnt) over (partition by src)")
        .cast("long")
        .alias("p_bp"),
    )


@query(
    "events_chi2_ab_test",
    """
WITH assign AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), cells AS (
  SELECT CAST(SUM(CASE WHEN grp = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN grp = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN grp = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN grp = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM assign
)
SELECT a AS conv_a, b AS nonconv_a, c AS conv_b, d AS nonconv_b,
       CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN NULL
       ELSE ROUND(
         (CAST(a + b + c + d AS DOUBLE)
          * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
          * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
         / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
            * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
         6
       ) END AS chi2
FROM cells
""",
)
def events_chi2_ab_test(spark, sf_dir):
    """A/B conversion chi-square: users split by id parity, conversion =
    any purchase event; the Pearson chi-square statistic of the 2x2
    contingency table. The table cells are exact distributed integer
    aggregates (one shuffle on user_id, then a 4-cell reduce); only the
    final SCALAR statistic is float — one double expression over four
    bigints, written identically in both engines, so no accumulation-
    order nondeterminism exists anywhere."""
    ev = load(spark, sf_dir, "events")["events"]
    assign = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("conv")
        )
        .withColumn("grp", (F.col("user_id") % 2).cast("int"))
    )
    cells = assign.agg(
        F.sum(F.when((F.col("grp") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    ad_bc = (
        F.col("a").cast("double") * F.col("d").cast("double")
        - F.col("b").cast("double") * F.col("c").cast("double")
    )
    denom_zero = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    ) == 0
    chi2 = F.round(
        ((F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
         * ad_bc * ad_bc)
        / ((F.col("a") + F.col("b")).cast("double")
           * (F.col("c") + F.col("d")).cast("double")
           * (F.col("a") + F.col("c")).cast("double")
           * (F.col("b") + F.col("d")).cast("double")),
        6,
    )
    return cells.select(
        F.col("a").alias("conv_a"),
        F.col("b").alias("nonconv_a"),
        F.col("c").alias("conv_b"),
        F.col("d").alias("nonconv_b"),
        F.when(denom_zero, F.lit(None).cast("double"))
        .otherwise(chi2)
        .alias("chi2"),
    )


@query(
    "events_rfm_segmentation",
    """
WITH m AS (SELECT MAX(ts) AS mx FROM events
           WHERE event_type = 'purchase'),
per_user AS (
  SELECT user_id,
         CAST(date_diff('second', MAX(ts), (SELECT mx FROM m)) AS BIGINT)
             AS recency_sec,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
q AS (
  SELECT ROUND(CAST(quantile_cont(recency_sec, 0.5) AS DOUBLE), 4) AS r50,
         ROUND(CAST(quantile_cont(frequency, 0.5) AS DOUBLE), 4) AS f50,
         ROUND(CAST(quantile_cont(monetary, 0.5) AS DOUBLE), 4) AS m50
  FROM per_user
)
SELECT user_id, recency_sec, frequency, monetary,
       CAST(CASE WHEN recency_sec <= r50 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
       CAST(CASE WHEN frequency > f50 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
       CAST(CASE WHEN monetary > m50 THEN 2 ELSE 1 END AS BIGINT) AS m_score
FROM per_user, q
""",
)
def events_rfm_segmentation(spark, sf_dir):
    """RFM (recency/frequency/monetary) segmentation: per-user purchase
    recency, count and exact-cents spend, scored above/below the median
    of each metric. The textbook formulation is NTILE over a GLOBAL
    window — a single-partition scale-killer; here the three medians are
    one tiny aggregate broadcast against the per-user table, so the only
    full shuffle is the user_id groupBy. Medians are rounded identically
    on both engines; metrics are exact integers."""
    ev = load(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase")
    mx = p.agg(F.max("ts").alias("mx"))
    per_user = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (
                F.max(F.col("mx").cast("long")).cast("long")
                - F.max(F.col("ts").cast("long")).cast("long")
            ).alias("recency_sec"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary"),
        )
    )
    q = per_user.agg(
        F.round(F.percentile("recency_sec", F.lit(0.5)), 4).alias("r50"),
        F.round(F.percentile("frequency", F.lit(0.5)), 4).alias("f50"),
        F.round(F.percentile("monetary", F.lit(0.5)), 4).alias("m50"),
    )
    return per_user.crossJoin(F.broadcast(q)).select(
        "user_id",
        "recency_sec",
        "frequency",
        "monetary",
        F.when(F.col("recency_sec") <= F.col("r50"), 2)
        .otherwise(1)
        .cast("long")
        .alias("r_score"),
        F.when(F.col("frequency") > F.col("f50"), 2)
        .otherwise(1)
        .cast("long")
        .alias("f_score"),
        F.when(F.col("monetary") > F.col("m50"), 2)
        .otherwise(1)
        .cast("long")
        .alias("m_score"),
    )


_BASKET_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM b),
items AS (SELECT p, COUNT(*) AS cnt FROM b GROUP BY p HAVING COUNT(*) >= 3),
fb AS (SELECT b.o, b.p FROM b JOIN items ON b.p = items.p),
pairs AS (
  SELECT a.p AS pa, b2.p AS pb, COUNT(*) AS pair_n
  FROM fb a JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
  GROUP BY a.p, b2.p
  HAVING COUNT(*) >= 3
)
SELECT pairs.pa, pairs.pb, CAST(pairs.pair_n AS BIGINT) AS pair_n,
       CAST(ia.cnt AS BIGINT) AS na, CAST(ib.cnt AS BIGINT) AS nb,
       ROUND(pairs.pair_n * 1.0 / ia.cnt, 6) AS conf_ab,
       ROUND(pairs.pair_n * 1.0 / ib.cnt, 6) AS conf_ba,
       ROUND(pairs.pair_n * 1.0 * n.n_baskets / (ia.cnt * ib.cnt), 6)
         AS lift
FROM pairs
JOIN items ia ON ia.p = pairs.pa
JOIN items ib ON ib.p = pairs.pb
CROSS JOIN n
"""


@query("basket_association_rules", _BASKET_ORACLE)
def basket_association_rules(spark, sf_dir):
    """MARKET-BASKET ASSOCIATION RULES (support / confidence / lift)
    with the Apriori prune: items below min-support are dropped BEFORE
    the pair self-join — sound, because a pair's support can't exceed
    either item's — which is what keeps the self-join alive on a 100 TB
    basket table (join volume is frequent-item co-occurrence, not all
    pairs). Counts are integers; confidence and lift are single
    divisions of exact integers rounded to 6 dp (cross-engine stable);
    the basket total is a one-row broadcast."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = b.agg(F.countDistinct("o").alias("n_baskets"))
    items = (
        b.groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 3)
    )
    fb = b.join(items.select("p"), "p")
    a = fb.select(F.col("o"), F.col("p").alias("pa"))
    b2 = fb.select(F.col("o"), F.col("p").alias("pb"))
    pairs = (
        a.join(b2, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 3)
    )
    ia = items.select(F.col("p").alias("pa"), F.col("cnt").alias("na"))
    ib = items.select(F.col("p").alias("pb"), F.col("cnt").alias("nb"))
    return (
        pairs.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.round(F.col("pair_n") / F.col("na"), 6).alias("conf_ab"),
            F.round(F.col("pair_n") / F.col("nb"), 6).alias("conf_ba"),
            F.round(
                F.col("pair_n") * F.col("n_baskets") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "events_session_path_topk",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN date_diff('second',
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(is_new_session)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM ordered
), stepped AS (
  SELECT user_id, session_seq, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM numbered
), paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM stepped WHERE rn <= 3
  GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 10
""",
)
def events_session_path_topk(spark, sf_dir):
    """Top session-opening paths: 30-minute-gap sessionization (the
    gaps-and-islands program events_sessionization certifies), then
    each session's first THREE event types joined into a path string
    and the 10 most common paths reported — the product-analytics
    'what do users do first' query. Per-user/per-session windows only
    (never global); the path assembly sorts a ≤3-element struct array
    inside each group, and the final top-10 is a total order
    (count desc, path asc) through TakeOrderedAndProject, not a
    window."""
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.col("ts").cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0)
    numbered = e.select(
        "user_id", "ts", "event_id", "event_type",
        is_new.alias("is_new_session"),
    ).withColumn(
        "session_seq",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sw = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    stepped = numbered.withColumn("rn", F.row_number().over(sw)).filter(
        F.col("rn") <= 3
    )
    paths = stepped.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "events_ohlc_candles_weekly",
    """
WITH r AS (
  SELECT event_type, date_trunc('week', ts) AS week, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('week', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('week', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT event_type,
       strftime(week, '%Y-%m-%d') AS week_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(MAX(CASE WHEN rn_z = 1 THEN value END), 6) AS close
FROM r GROUP BY 1, 2
""",
)
def events_ohlc_candles_weekly(spark, sf_dir):
    """OHLC candles per (event_type, ISO week) — the time-series
    downsampling every market/metrics store ships. Open/close are the
    first/last value under the deterministic (ts, event_id) total
    order (two row_numbers over ONE partitioned window shuffle — keys
    are (type, week), so parallelism grows with the calendar and no
    global window ever appears); high/low/count ride the same
    groupBy. Exact picks, exact extrema; only the emitted doubles are
    rounded."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")["events"]
    wk = F.date_trunc("week", "ts")
    base = e.select(
        "event_type", wk.alias("week"), "value", "ts", "event_id"
    )
    pw = Window.partitionBy("event_type", "week")
    r = base.select(
        "event_type",
        "week",
        "value",
        F.row_number()
        .over(pw.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("rn_a"),
        F.row_number()
        .over(pw.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_z"),
    )
    return r.groupBy(
        "event_type", F.date_format("week", "yyyy-MM-dd").alias("week_start")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias(
            "open"
        ),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_z") == 1, F.col("value"))), 6).alias(
            "close"
        ),
    )


@query(
    "events_cohort_ltv_cumulative",
    """
WITH f AS (
  SELECT user_id,
         MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7)
           AS cohort_m
  FROM events GROUP BY user_id
),
r AS (
  SELECT f.cohort_m,
         (date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE)) // 7)
           - f.cohort_m AS age_m,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
g AS (
  SELECT cohort_m, age_m, CAST(SUM(cents) AS BIGINT) AS rev
  FROM r GROUP BY cohort_m, age_m
)
SELECT CAST(cohort_m AS BIGINT) AS cohort_m, CAST(age_m AS BIGINT) AS age_m,
       CAST(SUM(rev) OVER (PARTITION BY cohort_m ORDER BY age_m)
            AS BIGINT) AS cum_revenue_cents
FROM g
""",
    doc="Cohort LTV curves: cumulative purchase revenue by cohort "
    "month x age month; cumsum only over the tiny post-agg grid.",
)
def events_cohort_ltv_cumulative(spark, sf_dir):
    """Cohort LIFETIME-VALUE curves: users grouped by first-seen WEEK
    (epoch-day DIV 7 — explicit integer arithmetic, so both engines
    agree without week-of-year locale semantics; weekly grain because
    the corpus spans ~one month), purchase revenue accumulated by
    cohort age. One shuffle for first-seen, one join back,
    one (cohort, age) aggregate; the running sum happens only on the
    post-aggregation grid (cohorts x ages, dozens of rows), partitioned
    by cohort — never a window over raw events."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")["events"]
    mth = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) / 7
    )
    f = e.groupBy("user_id").agg(F.min(mth).alias("cohort_m"))
    r = (
        e.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .select(
            "cohort_m",
            (mth - F.col("cohort_m")).alias("age_m"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    g = r.groupBy("cohort_m", "age_m").agg(
        F.sum("cents").cast("long").alias("rev")
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m")
    return g.select(
        F.col("cohort_m").cast("long").alias("cohort_m"),
        F.col("age_m").cast("long").alias("age_m"),
        F.sum("rev").over(w).cast("long").alias("cum_revenue_cents"),
    )


@query(
    "events_diff_in_differences",
    """
WITH x AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
         CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1
              ELSE 0 END AS post,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM x GROUP BY treat, post
),
w AS (
  SELECT MAX(CASE WHEN treat = 1 AND post = 1 THEN s * 1.0 / n END) AS t1,
         MAX(CASE WHEN treat = 1 AND post = 0 THEN s * 1.0 / n END) AS t0,
         MAX(CASE WHEN treat = 0 AND post = 1 THEN s * 1.0 / n END) AS c1,
         MAX(CASE WHEN treat = 0 AND post = 0 THEN s * 1.0 / n END) AS c0,
         CAST(SUM(n) AS BIGINT) AS n_total
  FROM g
)
SELECT n_total, ROUND(t1 - t0, 6) AS treat_delta_cents,
       ROUND(c1 - c0, 6) AS control_delta_cents,
       ROUND((t1 - t0) - (c1 - c0), 6) AS did_effect_cents
FROM w
""",
    doc="Difference-in-differences: pre/post x treat/control cell "
    "means from one pass of exact integer sums.",
)
def events_diff_in_differences(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES — the workhorse causal estimate for
    rollouts without randomization: (treated post - pre) minus
    (control post - pre) cancels both group level and time trend. One
    aggregation pass produces the four cells' exact integer (n, sum);
    the estimate is a fixed IEEE expression over them — no per-row
    float math, so at 100 TB this is a map-side-combined scan like any
    ANOVA-family statistic here."""
    e = load(spark, sf_dir, "events")["events"]
    x = e.select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("treat"),
        F.when(F.col("ts") >= F.lit("2024-01-15 00:00:00"), 1)
        .otherwise(0)
        .alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = x.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treat") == t) & (F.col("post") == p),
                F.col("s") * 1.0 / F.col("n"),
            )
        )

    w = g.agg(
        cell(1, 1).alias("t1"),
        cell(1, 0).alias("t0"),
        cell(0, 1).alias("c1"),
        cell(0, 0).alias("c0"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return w.select(
        "n_total",
        F.round(F.col("t1") - F.col("t0"), 6).alias("treat_delta_cents"),
        F.round(F.col("c1") - F.col("c0"), 6).alias("control_delta_cents"),
        F.round(
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0")), 6
        ).alias("did_effect_cents"),
    )


@query(
    "events_inter_arrival_histogram",
    """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
b AS (
  SELECT CASE
           WHEN gap_us < 60000000 THEN 'lt_1m'
           WHEN gap_us < 600000000 THEN 'lt_10m'
           WHEN gap_us < 3600000000 THEN 'lt_1h'
           WHEN gap_us < 86400000000 THEN 'lt_1d'
           ELSE 'ge_1d'
         END AS bucket,
         gap_us
  FROM g WHERE gap_us IS NOT NULL
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM b GROUP BY bucket
""",
    doc="Per-user inter-arrival gap histogram in exact epoch "
    "microseconds; user-partitioned lag, never a global window.",
)
def events_inter_arrival_histogram(spark, sf_dir):
    """INTER-ARRIVAL distribution: the time between consecutive events
    per user, bucketed into the operational bands (sub-minute bursts
    vs daily returns) — the base rate behind session-gap and anomaly
    thresholds. One user-partitioned lag (parallelism = users, never a
    global window), exact epoch-microsecond arithmetic, integer-exact
    aggregates per bucket."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        )
    ).filter(F.col("gap_us").isNotNull())
    bucket = (
        F.when(F.col("gap_us") < 60000000, "lt_1m")
        .when(F.col("gap_us") < 600000000, "lt_10m")
        .when(F.col("gap_us") < 3600000000, "lt_1h")
        .when(F.col("gap_us") < 86400000000, "lt_1d")
        .otherwise("ge_1d")
    )
    return g.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


@query(
    "events_burst_detection_minutes",
    """
WITH m AS (
  SELECT time_bucket(INTERVAL 1 MINUTE, ts) AS minute,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS k
  FROM m
)
SELECT strftime(minute, '%Y-%m-%d %H:%M') AS minute, n,
       ROUND((n - tot * 1.0 / k)
             / SQRT(tot * 1.0 / k), 6) AS poisson_z
FROM m, s
WHERE (n - tot * 1.0 / k) / SQRT(tot * 1.0 / k) > 2.0
""",
    doc="Poisson burst detection: minutes whose count exceeds the "
    "homogeneous rate by > 2 sigma (sqrt-mean), exact integer counts.",
)
def events_burst_detection_minutes(spark, sf_dir):
    """BURST DETECTION under a homogeneous-Poisson null: a minute is
    bursty when its count exceeds the global per-minute rate by more
    than 4 sqrt(rate) — the first-line traffic-anomaly alarm (attack,
    replay, stuck producer). Per-minute counts are one map-side-
    combined aggregate; the rate is a one-row broadcast; the z
    expression is fixed IEEE over exact integers, identical in both
    engines. Complements the value-based z-score anomaly query
    (events_anomaly_zscore) with an ARRIVAL-RATE anomaly."""
    e = load(spark, sf_dir, "events")["events"]
    m = e.groupBy(
        F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = m.agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    rate = F.col("tot") * 1.0 / F.col("k")
    z = (F.col("n") - rate) / F.sqrt(rate)
    return (
        m.crossJoin(F.broadcast(s))
        .filter(z > 2.0)
        .select(
            F.date_format("minute", "yyyy-MM-dd HH:mm").alias("minute"),
            "n",
            F.round(z, 6).alias("poisson_z"),
        )
    )


_UCB_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT d, arm,
         SUM(n) OVER (PARTITION BY arm ORDER BY d) AS n_i,
         SUM(cents) OVER (PARTITION BY arm ORDER BY d) AS cents_i
  FROM daily
),
tot AS (SELECT d, SUM(n_i) AS n FROM cum GROUP BY d),
scored AS (
  SELECT c.d, c.arm, c.n_i, t.n,
         ROUND(c.cents_i / (100.0 * c.n_i)
               + sqrt(2.0 * CAST(ROUND(ln(t.n) * 1000000) AS BIGINT)
                      / 1000000.0 / c.n_i), 6) AS ucb
  FROM cum c JOIN tot t ON c.d = t.d
),
pick AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY d
                               ORDER BY ucb DESC, arm ASC) AS rn
  FROM scored
)
SELECT strftime(d, '%Y-%m-%d') AS day, arm AS chosen_arm,
       ucb, CAST(n_i AS BIGINT) AS n_arm, CAST(n AS BIGINT) AS n_total
FROM pick WHERE rn = 1
"""


@query(
    "events_ucb1_arm_selection",
    _UCB_ORACLE,
    doc="UCB1 bandit replay: per-day cumulative mean + exploration "
    "bonus per event-type arm, argmax selection with arm tiebreak.",
)
def events_ucb1_arm_selection(spark, sf_dir):
    """UCB1 multi-armed-bandit replay — which arm the
    optimism-under-uncertainty policy would pick each day, given the
    history so far: score_i = mean_i + sqrt(2 ln n / n_i) over the
    per-arm cumulative value means. The ln is snapped to integer
    micro-nats before the sqrt (one rounding point, same on both
    engines); counts and cent sums are exact integers from ONE daily
    aggregation pass, cumulated by arm-partitioned windows (the day
    total needs no window at all — it is the sum of the per-arm
    cumulatives regrouped by day). Argmax per day with arm tiebreak.
    The fact scan happens once; everything after is the
    days x arms grid."""
    e = load(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        F.to_date("ts").alias("d"), F.col("event_type").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    wa = (
        Window.partitionBy("arm")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "d",
        "arm",
        F.sum("n").over(wa).alias("n_i"),
        F.sum("cents").over(wa).alias("cents_i"),
    )
    tot = cum.groupBy("d").agg(F.sum("n_i").alias("n"))
    ln_micro = F.round(F.log(F.col("n").cast("double")) * 1000000).cast("long")
    scored = cum.join(tot, "d").select(
        "d",
        "arm",
        "n_i",
        "n",
        F.round(
            F.col("cents_i") / (100.0 * F.col("n_i"))
            + F.sqrt(2.0 * ln_micro / 1000000.0 / F.col("n_i")),
            6,
        ).alias("ucb"),
    )
    wp = Window.partitionBy("d").orderBy(F.col("ucb").desc(), F.col("arm").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("arm").alias("chosen_arm"),
            "ucb",
            F.col("n_i").cast("long").alias("n_arm"),
            F.col("n").cast("long").alias("n_total"),
        )
    )


_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_K = 20  # fixed value-iteration depth (documented truncation)


def _markov_oracle() -> str:
    drops = "\n  UNION ALL\n".join(
        f"""  SELECT 'drop_{c}' AS variant, s,
         CASE WHEN t = '{c}' THEN 'null' ELSE t END AS t,
         SUM(p) AS p
  FROM pm_full WHERE s <> '{c}' GROUP BY 1, 2, 3"""
        for c in _MK_CHANNELS
    )
    head = f"""
WITH ev AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
fp AS (
  SELECT user_id, MIN(rn) AS prn FROM ev
  WHERE event_type = 'purchase' GROUP BY 1
),
j AS MATERIALIZED (
  SELECT e.user_id, e.event_type, e.rn, f.prn IS NOT NULL AS conv
  FROM ev e LEFT JOIN fp f USING (user_id)
  WHERE f.prn IS NULL OR e.rn < f.prn
),
alltr AS (
  SELECT 'start' AS s, event_type AS t FROM j WHERE rn = 1
  UNION ALL
  SELECT 'start', 'conv' FROM fp WHERE prn = 1
  UNION ALL
  SELECT s, t FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS s,
           event_type AS t
    FROM j) WHERE s IS NOT NULL
  UNION ALL
  SELECT s, t FROM (
    SELECT event_type AS s,
           CASE WHEN conv THEN 'conv' ELSE 'null' END AS t,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS re
    FROM j) WHERE re = 1
),
cm AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c FROM alltr GROUP BY 1, 2),
outd AS (SELECT s, SUM(c) AS o FROM cm GROUP BY 1),
pm_full AS (
  SELECT 'full' AS variant, cm.s, cm.t, (cm.c * 1000000) // outd.o AS p
  FROM cm JOIN outd ON cm.s = outd.s
),
pm AS MATERIALIZED (
  SELECT variant, s, t, p FROM pm_full
  UNION ALL
{drops}
),
v0 AS MATERIALIZED (
  SELECT DISTINCT variant, s, CAST(0 AS BIGINT) AS v FROM pm
)"""
    steps = []
    for k in range(1, _MK_K + 1):
        steps.append(f""",
v{k} AS MATERIALIZED (
  SELECT m.variant, m.s,
         SUM(m.p * CASE WHEN m.t = 'conv' THEN 1000000
                        WHEN m.t = 'null' THEN 0
                        ELSE COALESCE(v.v, 0) END) // 1000000 AS v
  FROM pm m LEFT JOIN v{k - 1} v ON v.variant = m.variant AND v.s = m.t
  GROUP BY m.variant, m.s
)""")
    tail = f""",
res AS (
  SELECT REPLACE(d.variant, 'drop_', '') AS channel,
         f.v AS p_full_micro, d.v AS p_drop_micro,
         CASE WHEN f.v = 0 THEN CAST(0 AS BIGINT)
              ELSE GREATEST(CAST(0 AS BIGINT),
                            1000000 - (d.v * 1000000) // f.v)
         END AS removal_micro
  FROM v{_MK_K} d
  JOIN v{_MK_K} f ON f.variant = 'full' AND f.s = 'start'
  WHERE d.s = 'start' AND d.variant <> 'full'
),
tot AS (SELECT SUM(removal_micro) AS tr FROM res)
SELECT channel,
       CAST(p_full_micro AS BIGINT) AS p_full_micro,
       CAST(p_drop_micro AS BIGINT) AS p_drop_micro,
       CAST(removal_micro AS BIGINT) AS removal_micro,
       CAST(CASE WHEN tot.tr = 0 THEN 0
                 ELSE (removal_micro * 1000000) // tot.tr END AS BIGINT)
         AS share_ppm
FROM res, tot"""
    return head + "".join(steps) + tail


@query(
    "events_markov_removal_attribution",
    _markov_oracle(),
    doc="Markov-chain attribution: removal effect per channel from a "
    "20-step exact-integer value iteration over the journey chain.",
)
def events_markov_removal_attribution(spark, sf_dir):
    """MARKOV-CHAIN ATTRIBUTION (removal effects) — the principled
    multi-touch alternative to last-click: user journeys (event
    sequences up to first purchase) define a transition matrix over
    channel states plus start/conv/null absorbers; each channel's
    credit is how much the start->conv absorption probability DROPS
    when that channel's state is removed (its inbound mass redirected
    to null). Absorption probabilities come from a fixed 20-step value
    iteration in exact micro-integer arithmetic (documented
    truncation of the infinite-horizon solve; probabilities and
    iteration identical on both engines — the oracle unrolls the same
    20 steps as CTE layers). Scale split: journey extraction and
    transition counting are the distributed part (two user-partitioned
    windows + one aggregation over the fact table); the chain itself
    is ENUM-BOUNDED (<= 8 states x 5 variants), so the value iteration
    runs on collected metadata — the same bounded-state pattern as the
    sketch folds. Outputs are all integers (micro-probabilities, ppm
    shares): no float crosses the engine boundary."""
    e = load(spark, sf_dir, "events")["events"]
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.select(
        "user_id", "event_type", F.row_number().over(wu).alias("rn")
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = (
        ev.join(fp, "user_id", "left")
        .where(F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
        .select(
            "user_id", "event_type", "rn", F.col("prn").isNotNull().alias("conv")
        )
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    wl = Window.partitionBy("user_id").orderBy(F.col("rn").desc())
    firsts = j.where(F.col("rn") == 1).select(
        F.lit("start").alias("s"), F.col("event_type").alias("t")
    )
    direct = fp.where(F.col("prn") == 1).select(
        F.lit("start").alias("s"), F.lit("conv").alias("t")
    )
    mids = (
        j.withColumn("prev", F.lag("event_type").over(wj))
        .where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("s"), F.col("event_type").alias("t"))
    )
    lasts = (
        j.withColumn("re", F.row_number().over(wl))
        .where(F.col("re") == 1)
        .select(
            F.col("event_type").alias("s"),
            F.when(F.col("conv"), F.lit("conv")).otherwise(F.lit("null")).alias("t"),
        )
    )
    cm_rows = (
        firsts.unionByName(direct)
        .unionByName(mids)
        .unionByName(lasts)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # enum-bounded: <= (|channels|+1)^2 + absorber edges
    )
    # --- driver-side exact-integer chain math over the tiny matrix ---
    counts: dict = {}
    for r in cm_rows:
        counts[(r["s"], r["t"])] = int(r["c"])
    outd: dict = {}
    for (s, _t), c in counts.items():
        outd[s] = outd.get(s, 0) + c
    pm: dict = {}
    full = {(s, t): (c * 1000000) // outd[s] for (s, t), c in counts.items()}
    pm["full"] = full
    for ch in _MK_CHANNELS:
        dropped: dict = {}
        for (s, t), p in full.items():
            if s == ch:
                continue
            t2 = "null" if t == ch else t
            dropped[(s, t2)] = dropped.get((s, t2), 0) + p
        pm[f"drop_{ch}"] = dropped

    def absorb(mat: dict) -> dict:
        states = {s for s, _ in mat}
        v = {s: 0 for s in states}
        for _ in range(_MK_K):
            nv = {}
            for s in states:
                acc = 0
                for (ss, t), p in mat.items():
                    if ss != s:
                        continue
                    val = 1000000 if t == "conv" else 0 if t == "null" else v.get(t, 0)
                    acc += p * val
                nv[s] = acc // 1000000
            v = nv
        return v

    p_start = {var: absorb(mat).get("start", 0) for var, mat in pm.items()}
    p_full = p_start["full"]
    res = []
    for ch in _MK_CHANNELS:
        pd = p_start[f"drop_{ch}"]
        # zero-conversion corpus -> p_full == 0; removal effect is
        # defined as 0 there (nothing to remove), mirroring the oracle's
        # CASE WHEN f.v = 0 guard.
        rem = 0 if p_full == 0 else max(0, 1000000 - (pd * 1000000) // p_full)
        res.append((ch, p_full, pd, rem))
    tr = sum(r[3] for r in res)
    out = [
        (ch, pf, pd, rem, 0 if tr == 0 else (rem * 1000000) // tr)
        for ch, pf, pd, rem in res
    ]
    return spark.createDataFrame(
        out,
        "channel string, p_full_micro long, p_drop_micro long, "
        "removal_micro long, share_ppm long",
    )


@query(
    "stats_cochran_q_event_types",
    """
WITH pc AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT CAST(SUM(c) // COUNT(*) AS BIGINT) AS mu FROM pc
), inc AS (
  SELECT user_id, event_type FROM pc, m WHERE c > m.mu
), rtot AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS r FROM inc GROUP BY user_id
), ctot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM inc GROUP BY 1
), s AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ctot) AS k,
         (SELECT CAST(SUM(c) AS HUGEINT) FROM ctot) AS n,
         (SELECT CAST(SUM(c * c) AS HUGEINT) FROM ctot) AS sc2,
         (SELECT CAST(SUM(r * r) AS HUGEINT) FROM rtot) AS sr2
)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CASE WHEN k * n - sr2 = 0 THEN 0.0
            ELSE ROUND((k - 1) * 1.0 * (k * sc2 - n * n)
                       / (k * n - sr2), 6) END AS cochran_q
FROM s
""",
)
def stats_cochran_q_event_types(spark, sf_dir):
    """Cochran's Q over binary user x event-type HEAVY-ENGAGEMENT
    incidence (per-pair count strictly above the global per-pair mean,
    an sf-adaptive threshold — bare presence is degenerate here: every
    user touches every type, making kN = ΣR_i²): do the k event types
    have equal heavy-engagement reach, treating each USER as their own
    block? (The k-treatment extension of McNemar — right when per-user
    propensity varies wildly, which a pooled chi-square confounds.)
    One count pass + one-row mean broadcast to the incidence frame,
    then the denominator-cleared identity Q = (k-1)(k·ΣC_j² − N²) /
    (kN − ΣR_i²) — totals and squares are exact integers, one guarded
    IEEE division at the end (0 when the design is degenerate). Users
    with all-zero rows drop out of Q by algebra."""
    e = load(spark, sf_dir, "events")["events"]
    pc = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = pc.agg(F.expr("sum(c) div count(1)").alias("mu"))
    inc = (
        pc.crossJoin(F.broadcast(m))
        .filter(F.col("c") > F.col("mu"))
        .select("user_id", "event_type")
        .localCheckpoint(eager=True)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ctot = inc.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    rtot = inc.groupBy("user_id").agg(F.count(F.lit(1)).alias("r"))
    cs = ctot.agg(
        dec(F.count(F.lit(1))).alias("k"),
        dec(F.sum("c")).alias("n"),
        F.sum(dec(F.col("c")) * dec(F.col("c"))).alias("sc2"),
    )
    rs = rtot.agg(F.sum(dec(F.col("r")) * dec(F.col("r"))).alias("sr2"))
    dbl = lambda c: c.cast("double")  # noqa: E731
    return cs.crossJoin(F.broadcast(rs)).select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.when(
            F.col("k") * F.col("n") - F.col("sr2") == 0, F.lit(0.0)
        )
        .otherwise(
            F.round(
                dbl(F.col("k") - 1)
                * dbl(
                    F.col("k") * F.col("sc2") - F.col("n") * F.col("n")
                )
                / dbl(F.col("k") * F.col("n") - F.col("sr2")),
                6,
            )
        )
        .alias("cochran_q"),
    )


@query(
    "events_bot_regularity_audit",
    """
WITH g AS (
  SELECT user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
), per_u AS (
  SELECT user_id, CAST(COUNT(gap) AS HUGEINT) AS ng,
         CAST(SUM(gap) AS HUGEINT) AS s,
         CAST(SUM(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS q
  FROM g WHERE gap IS NOT NULL GROUP BY user_id
), scored AS (
  SELECT user_id,
         CASE WHEN s = 0 THEN 0
              ELSE CAST((ng * q - s * s) * 1000000 // (s * s) AS BIGINT)
         END AS cv2_micro
  FROM per_u WHERE ng >= 19
)
SELECT CAST(LEAST(cv2_micro // 200000, 9) AS BIGINT) AS cv2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN cv2_micro < 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bot_flagged
FROM scored GROUP BY 1
""",
)
def events_bot_regularity_audit(spark, sf_dir):
    """Bot detection by inter-arrival REGULARITY — the curation filter
    a behavioral-training pipeline runs before trusting engagement
    signals: humans arrive bursty (squared coefficient of variation of
    gaps >= ~1 for Poisson), schedulers arrive metronomic (cv² ~ 0).
    Per-user gap moments (n, Σg, Σg²) come from one lag window + one
    aggregation — cv² = (nΣg² − S²)/S² is a ratio of exact integers,
    shipped in integer micro-units (zero-gap users are maximally
    regular by convention). Users need >= 20 events to be scored.
    Output is the bounded cv² decile histogram with the flagged count
    (cv² < 0.1) per bucket — the audit artifact, not a per-user dump."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")).alias(
            "gap"
        ),
    ).filter(F.col("gap").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_u = g.groupBy("user_id").agg(
        dec(F.count("gap")).alias("ng"),
        dec(F.sum("gap")).alias("s"),
        F.sum(dec(F.col("gap")) * dec(F.col("gap"))).alias("q"),
    )
    scored = per_u.filter(F.col("ng") >= 19).select(
        F.when(F.col("s") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("(ng * q - s * s) * 1000000 div (s * s)").cast("long")
        )
        .alias("cv2_micro")
    )
    return scored.groupBy(
        F.least(F.expr("cv2_micro div 200000"), F.lit(9).cast("long"))
        .cast("long")
        .alias("cv2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("cv2_micro") < 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_bot_flagged"),
    )
