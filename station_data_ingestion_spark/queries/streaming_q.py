"""Streaming surface exposed to the correctness gate: replay queries.

Each query replays the events table as a bounded file stream
(``trigger(availableNow=True)``) through a streaming/windows.py
operator, drains into a memory sink, and returns the sink as a batch
DataFrame -- so the DRIVER's DuckDB oracle exercises the streaming
engine itself, not just the batch twins (pytest already asserts
stream==batch equivalence; this makes the external gate see it too).

Determinism notes per entry:
- tumbling append-mode output = windows FINALIZED by the watermark
  (window end <= max(ts) - delay); the oracle applies the same filter.
- stateful running totals emit per-microbatch updates, so only the
  FINAL state per key (max over emissions) is compared.
- dedup keeps an arbitrary first row per id; only the key column is
  exposed to the oracle.
Replays cost one extra write of the sf events table to a temp dir:
negligible at gate scale (sf0.01), and the price of using the real
FileStreamSource instead of a mocked one.

[reference: none -- the reference has no streaming engine; SURVEY §2.8
marks this surface as engine-provided]
"""

from __future__ import annotations

import atexit
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from station_data_ingestion_spark.queries.registry import load, query
from station_data_ingestion_spark.streaming import windows as W

_MONEY = 'SUM(CAST(ROUND(value * 10000) AS BIGINT)) / 10000.0'


# staged replay sources, keyed by (Spark application id, sf_dir): the
# corpus is immutable, so the multi-file copy the stream source needs is
# written ONCE per session and shared by every replay query and bench
# repeat (r3 paid the copy on every invocation). Multi-file matters: the
# file stream source reads one file per task — a single-file source
# would stream with parallelism 1. applicationId is unique per session
# (id(spark) could be recycled by the allocator after a session is
# garbage-collected and silently reuse a stale dir — ADVICE r4); staged
# dirs are removed at interpreter exit.
_STAGED_SRC: dict[tuple[str, str], str] = {}


_CKPT_DIRS: list[str] = []


def _cleanup_staged() -> None:
    import shutil

    for d in list(_STAGED_SRC.values()) + _CKPT_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _STAGED_SRC.clear()
    _CKPT_DIRS.clear()


atexit.register(_cleanup_staged)


def _staged_events(spark: SparkSession, sf_dir: str) -> tuple[str, object]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STAGED_SRC:
        events = load(spark, sf_dir, "events")["events"]
        d = tempfile.mkdtemp(prefix="stream_replay_src_")
        events.write.parquet(f"{d}/src")
        _STAGED_SRC[key] = d
    d = _STAGED_SRC[key]
    schema = load(spark, sf_dir, "events")["events"].schema
    return f"{d}/src", schema


def _replay(spark: SparkSession, sf_dir: str, op, output_mode: str) -> DataFrame:
    """Run `op(stream)` over a file-stream replay of events; return the
    drained memory sink as a batch DataFrame."""
    src, schema = _staged_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="stream_replay_")  # checkpoint only
    _CKPT_DIRS.append(tmp)
    stream = spark.readStream.schema(schema).parquet(src)
    name = f"replay_{uuid.uuid4().hex[:12]}"
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "stream_tumbling_replay",
    f"""
WITH m AS (SELECT MAX(ts) AS mx FROM events),
agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
         COUNT(*) AS n_events, {_MONEY} AS total_value
  FROM events GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
       event_type, n_events, total_value
FROM agg, m
WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
""",
)
def stream_tumbling_replay(spark, sf_dir):
    """Watermarked tumbling-window counts via the STREAMING engine
    (append mode emits exactly the watermark-finalized windows)."""
    return _replay(spark, sf_dir, W.tumbling_counts, "append")


@query(
    "stream_sliding_replay",
    """
WITH m AS (SELECT MAX(ts) AS mx FROM events),
x AS (
  SELECT event_type,
         UNNEST([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
           AS ws
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
       event_type, COUNT(*) AS n_events
FROM x, m
WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
GROUP BY ws, event_type
""",
)
def stream_sliding_replay(spark, sf_dir):
    """Sliding windows (1h window / 30min slide) via the streaming
    engine. Every event lands in exactly two 30-min-aligned windows
    (start in (ts-1h, ts]); the oracle explodes each event into both and
    keeps the watermark-finalized ones."""
    return _replay(spark, sf_dir, W.sliding_counts, "append")


@query(
    "stream_stateful_totals_replay",
    """
SELECT user_id, COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 10000) AS BIGINT)) / 10000.0 AS total_value
FROM events GROUP BY user_id
""",
)
def stream_stateful_totals_replay(spark, sf_dir):
    """applyInPandasWithState running totals, reduced to final state.

    Update mode emits one row per (user, microbatch). n_events is
    strictly monotone per emission (a user only emits when the batch had
    rows), so max_by(total_value, n_events) selects the LAST emission —
    correct even when per-row values are negative, unlike max(total)
    which assumes monotone totals (ADVICE r3). The operator's state is
    exact scaled-integer, so the final emission equals the batch
    aggregate bit-for-bit."""
    sink = _replay(spark, sf_dir, W.running_user_totals, "update")
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@query(
    "stream_dedup_replay",
    "SELECT DISTINCT event_id FROM events",
)
def stream_dedup_replay(spark, sf_dir):
    """dropDuplicatesWithinWatermark replay; only the key column is
    deterministic (the surviving row per id is arrival-order)."""
    sink = _replay(spark, sf_dir, W.dedup_within_watermark, "append")
    return sink.select("event_id")


@query(
    "stream_interval_join_replay",
    """
SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS p_user,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
""",
)
def stream_interval_join_replay(spark, sf_dir):
    """Stream-stream interval join (purchase x preceding-hour clicks)
    through the streaming engine; inner-join matches over a bounded
    replay are exactly the batch join's matches."""
    sink = _replay(spark, sf_dir, W.stream_stream_click_purchase_join, "append")
    return sink.select(
        "p_id",
        "c_id",
        "p_user",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
    )


@query(
    "stream_session_replay",
    """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
islands AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM ordered
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         COUNT(*) AS n_events
  FROM islands GROUP BY user_id, sess
),
m AS (SELECT MAX(ts) AS mx FROM events)
SELECT user_id,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       n_events
FROM sessions, m
WHERE session_end + INTERVAL 30 MINUTE <= mx - INTERVAL 2 HOUR
""",
)
def stream_session_replay(spark, sf_dir):
    """Native session_window (30-min gap) through the streaming engine.
    Append mode finalizes sessions whose window end (last event + gap)
    is at or before the watermark; the oracle replays the same
    gaps-and-islands + finalization rule."""
    return _replay(spark, sf_dir, W.session_windows, "append")


@query(
    "stream_topk_ttl_replay",
    """
WITH tot AS (
  SELECT event_type, user_id,
         SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS scaled
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, scaled,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY scaled DESC, user_id) AS rnk
  FROM tot
)
SELECT event_type, CAST(rnk AS INT) AS rank, user_id,
       scaled / 10000.0 AS total_value
FROM r WHERE rnk <= 5
""",
)
def stream_topk_ttl_replay(spark, sf_dir):
    """Stateful streaming top-5 users by spend per event type, with
    event-time TTL eviction (streaming/windows.py
    topk_user_spend_with_ttl). The replay's TTL exceeds the corpus time
    span so nothing evicts and the FINAL emission per event_type (max
    n_seen — strictly monotone) equals the batch top-k with the same
    (spend DESC, user_id ASC) total order; eviction itself is pinned by
    a planted-gap pytest (no SQL analog of watermark-driven eviction)."""
    sink = _replay(
        spark, sf_dir, lambda s: W.topk_user_spend_with_ttl(s, k=5), "update"
    )
    final = Window.partitionBy("event_type")
    return (
        sink.withColumn("_mx", F.max("n_seen").over(final))
        .filter(F.col("n_seen") == F.col("_mx"))
        .select("event_type", "rank", "user_id", "total_value")
    )


@query(
    "stream_interval_left_join_replay",
    """
WITH m AS (
  -- the engine's global watermark is the MIN over both watermarked
  -- inputs of (max event time - delay): base it on the lagging stream
  SELECT least(
    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
    (SELECT MAX(ts) FROM events WHERE event_type = 'click')
  ) AS mx
),
p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'),
matched AS (
  SELECT p.p_id, c.c_id, p.user_id AS p_user, p.p_ts, c.c_ts
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
),
unmatched_closed AS (
  SELECT p.p_id, CAST(NULL AS BIGINT) AS c_id, p.user_id AS p_user,
         p.p_ts, CAST(NULL AS TIMESTAMP) AS c_ts
  FROM p, m
  WHERE NOT EXISTS (
    SELECT 1 FROM c WHERE c.user_id = p.user_id
      AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
  )
  AND p.p_ts <= mx - INTERVAL 2 HOUR
)
SELECT p_id, c_id, p_user,
       strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
FROM matched
UNION ALL
SELECT p_id, c_id, p_user,
       strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
FROM unmatched_closed
""",
)
def stream_interval_left_join_replay(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join through the streaming
    engine: matches emit as found (= the batch inner join), null-click
    rows emit only for purchases whose join state fully expired below
    the final watermark (p_ts <= max(ts) - 2h delay — the click window
    upper bound IS p_ts, so expiry is p_ts + delay). The oracle replays
    exactly that finalization rule; purchases too recent for the
    watermark to prove unmatched are correctly ABSENT from both sides."""
    sink = _replay(
        spark, sf_dir, W.stream_stream_click_purchase_left_join, "append"
    )
    return sink.select(
        "p_id",
        "c_id",
        "p_user",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
    )


@query(
    "stream_static_join_replay",
    f"""
WITH m AS (SELECT MAX(ts) AS mx FROM events),
j AS (
  SELECT e.ts, e.value, c.c_mktsegment AS segment
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
),
agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, segment,
         COUNT(*) AS n_events, {_MONEY} AS total_value
  FROM j GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
       segment, n_events, total_value
FROM agg, m
WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
""",
)
def stream_static_join_replay(spark, sf_dir):
    """Stream-STATIC join under the gate (the dimension-enrichment
    pattern): the event stream inner-joins a static customer dimension
    per micro-batch — stateless on the join, so only the windowed
    aggregate carries state — and the watermark-finalized per-segment
    windows must equal the batch oracle."""
    from station_data_ingestion_spark.streaming.windows import (
        static_enriched_counts,
    )

    dim = load(spark, sf_dir, "customer")["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return _replay(
        spark,
        sf_dir,
        lambda s: static_enriched_counts(s, dim),
        "append",
    )


@query(
    "stream_session_dynamic_gap_replay",
    """
WITH iv AS (
  SELECT user_id, ts,
         ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                   ELSE INTERVAL 30 MINUTE END AS e
  FROM events
),
flagged AS (
  SELECT user_id, ts, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   > ts THEN 0 ELSE 1 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, ts, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(e) AS session_end,
         COUNT(*) AS n_events
  FROM islands GROUP BY user_id, sess
),
m AS (SELECT MAX(ts) AS mx FROM events)
SELECT user_id,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       n_events
FROM sessions, m
WHERE session_end <= mx - INTERVAL 2 HOUR
""",
)
def stream_session_dynamic_gap_replay(spark, sf_dir):
    """session_window with a DYNAMIC per-event gap (60 min for
    purchases, 30 otherwise) through the streaming engine. Sessions are
    the interval union of [ts, ts+gap) per user — touching-but-not-
    overlapping windows stay separate (strict >), matching Spark's
    merge rule. The oracle replays the union + watermark finalization
    (session end = max event end <= final watermark)."""
    return _replay(spark, sf_dir, W.session_windows_dynamic_gap, "append")


@query(
    "stream_interval_full_join_replay",
    """
WITH m AS (
  SELECT least(
    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
    (SELECT MAX(ts) FROM events WHERE event_type = 'click')
  ) AS mx
),
p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'),
matched AS (
  SELECT p.p_id, c.c_id, p.user_id AS who, p.p_ts, c.c_ts
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
),
p_closed AS (
  SELECT p.p_id, CAST(NULL AS BIGINT) AS c_id, p.user_id AS who,
         p.p_ts, CAST(NULL AS TIMESTAMP) AS c_ts
  FROM p, m
  WHERE NOT EXISTS (
    SELECT 1 FROM c WHERE c.user_id = p.user_id
      AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
  )
  AND p.p_ts <= mx - INTERVAL 2 HOUR
),
c_closed AS (
  SELECT CAST(NULL AS BIGINT) AS p_id, c.c_id, c.user_id AS who,
         CAST(NULL AS TIMESTAMP) AS p_ts, c.c_ts
  FROM c, m
  WHERE NOT EXISTS (
    SELECT 1 FROM p WHERE p.user_id = c.user_id
      AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
  )
  AND c.c_ts + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
)
SELECT p_id, c_id, who,
       strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
FROM matched
UNION ALL SELECT p_id, c_id, who, strftime(p_ts, '%Y-%m-%d %H:%M:%S'),
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') FROM p_closed
UNION ALL SELECT p_id, c_id, who, strftime(p_ts, '%Y-%m-%d %H:%M:%S'),
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') FROM c_closed
""",
)
def stream_interval_full_join_replay(spark, sf_dir):
    """Stream-stream FULL OUTER interval join: both sides null-extend
    under watermark finalization. The click side's state window is one
    LOOKBACK longer than the purchase side's (a click can still match
    purchases up to c_ts + 1h), so its null rows finalize later — the
    oracle replays both expiry rules over the bounded replay."""
    sink = _replay(
        spark, sf_dir, W.stream_stream_click_purchase_full_join, "append"
    )
    return sink.select(
        "p_id",
        "c_id",
        "who",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
    )


@query(
    "stream_late_data_audit_replay",
    """
WITH e AS (SELECT ts, event_type, event_id % 2 AS par FROM events),
w1 AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM e WHERE par = 0),
w2 AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM e),
agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
         COUNT(*) FILTER (WHERE par = 0) AS n_even,
         COUNT(*) AS n_all
  FROM e GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
       CAST(CASE WHEN ws + INTERVAL 1 HOUR <= w1.wm THEN n_even
                 ELSE n_all END AS BIGINT) AS n_events
FROM agg, w1, w2
WHERE (ws + INTERVAL 1 HOUR <= w1.wm AND n_even > 0)
   OR (ws + INTERVAL 1 HOUR > w1.wm AND ws + INTERVAL 1 HOUR <= w2.wm)
""",
    doc="Watermark late-data semantics made auditable: two checkpointed "
    "availableNow runs; run 2 delivers the odd-id half late, finalized "
    "windows drop it, open windows absorb it; drop count asserted "
    "against the batch-predicted value.",
)
def stream_late_data_audit_replay(spark, sf_dir):
    """LATE-DATA AUDIT: what exactly does the watermark drop? The
    even-id half of events streams first (one availableNow run, which
    finalizes every window ending at or before w1 = max(even ts) - 2h
    and persists w1 in the checkpoint); the odd-id half then arrives
    LATE through a second run on the SAME checkpoint. Spark must (a)
    DROP late rows whose windows were already finalized, (b) ABSORB
    late rows into still-open windows (checkpointed state merges them
    with the even counts), and (c) emit exactly the windows finalized
    by the new watermark w2. The memory sinks of both runs union into
    the audited result; the oracle predicts all three behaviors from
    the raw table. In-query assert: the engine's own
    numRowsDroppedByWatermark must equal the batch-predicted count of
    late GROUPS in finalized windows (the counter sits above the
    map-side partial aggregate — measured, see inline note) — the
    audit a 100 TB pipeline needs before trusting its completeness
    SLOs (same counter, same semantics, any scale)."""
    import glob
    import shutil

    events = load(spark, sf_dir, "events")["events"].select(
        "ts", "event_type", "event_id"
    )
    d = tempfile.mkdtemp(prefix="stream_late_")
    _CKPT_DIRS.append(d)
    src = f"{d}/src"
    even = events.filter(F.col("event_id") % 2 == 0)
    odd = events.filter(F.col("event_id") % 2 == 1)
    even.repartition(2).write.parquet(src)

    schema = events.schema
    ckpt = f"{d}/ckpt"

    def _run(out_dir: str):
        # foreachBatch (not the memory sink): the second run must
        # RECOVER from the first run's checkpoint, which the memory
        # sink refuses; each run appends its finalized windows to its
        # own parquet dir
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
            )
        )

        def _sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            agg.writeStream.foreachBatch(_sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = 0
        for prog in q.recentProgress:
            for op in prog.get("stateOperators") or []:
                dropped += int(op.get("numRowsDroppedByWatermark") or 0)
        try:
            out = spark.read.parquet(out_dir)
        except Exception:  # a run that finalized nothing wrote no files
            out = spark.createDataFrame([], agg.schema)
        return out, dropped

    out1, dropped1 = _run(f"{d}/out1")
    if dropped1 != 0:
        raise RuntimeError(f"run 1 has no late data yet dropped {dropped1}")

    # deliver the odd half LATE: new files in the same source dir
    late_dir = f"{d}/late_stage"
    odd.repartition(2).write.parquet(late_dir)
    for i, f_ in enumerate(sorted(glob.glob(f"{late_dir}/part-*"))):
        shutil.move(f_, f"{src}/late-{i}.parquet")

    # batch-predicted drop count. Unit subtlety (measured, r8): for a
    # streaming AGGREGATION, numRowsDroppedByWatermark counts rows at
    # the STATE operator, which sits above the map-side partial
    # aggregate — i.e. dropped GROUPS (distinct (window, type) pairs
    # among late rows in finalized windows), not raw input rows.
    w1 = even.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    ).collect()[0]["wm"]
    expect_dropped = (
        odd.filter(F.window("ts", "1 hour").end <= F.lit(w1))
        .select(F.window("ts", "1 hour"), "event_type")
        .distinct()
        .count()
    )

    out2, dropped2 = _run(f"{d}/out2")
    if dropped2 != expect_dropped:
        raise RuntimeError(
            f"watermark dropped {dropped2} late rows; batch semantics "
            f"predict {expect_dropped}"
        )
    return out1.unionByName(out2)


# Moved from snapshot_q.py (pure move, registry name unchanged): a
# streaming replay that maintains KMV sketches in a snapshot table.
from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable
from station_data_ingestion_spark.queries.snapshot_q import _tmpdir


@query(
    "stream_kmv_distinct_replay",
    """
SELECT event_type AS key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events GROUP BY 1
""",
    doc="Streaming incrementally-maintained KMV distinct sketches: "
    "per-batch partials committed to a snapshot table, duplicated "
    "input AND a fresh-checkpoint re-run cannot change the folded "
    "answer (sketch union is idempotent).",
)
def stream_kmv_distinct_replay(spark, sf_dir):
    """Streaming COUNT(DISTINCT) via table-maintained KMV sketches
    (streaming/kmv_stream.py): events arrive in micro-batches (two
    full staged copies — every user hash arrives at least twice), each
    batch commits its per-group bottom-k partials, and the live answer
    folds all partials. The replay then RESTARTS with a brand-new
    checkpoint over the same source, re-ingesting everything under new
    batch ids — and the folded answer still equals COUNT(DISTINCT),
    because KMV merge is set union: at-least-once delivery is
    sufficient BY ALGEBRA, no exactly-once machinery needed. The gate
    compares against DuckDB's exact per-type distinct counts (k=4096
    far above any test-SF NDV, so the sketch is in its exact regime)."""
    from station_data_ingestion_spark.queries.registry import (
        ensure_session_confs,
    )
    from station_data_ingestion_spark.streaming.kmv_stream import (
        kmv_distinct_estimates,
        run_kmv_stream,
    )

    ensure_session_confs(spark)
    events = load(spark, sf_dir, "events")["events"].select(
        "user_id", "event_type"
    )
    tmp = _tmpdir(prefix="snap_kmvstream_")
    events.repartition(4).write.parquet(f"{tmp}/src")
    events.repartition(4).write.mode("append").parquet(f"{tmp}/src")
    t = SnapshotTable(
        spark, f"{tmp}/tbl", partition_cols=("batch_id",), stat_cols=()
    )
    k = 4096
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(f"{tmp}/src")
    )
    q = run_kmv_stream(stream, t, f"{tmp}/ckpt", "user_id", "event_type", k)
    q.awaitTermination()
    first = kmv_distinct_estimates(t, k)
    # fresh checkpoint = new deployment: everything re-ingests under new
    # batch ids; union idempotence must keep the answer identical
    stream2 = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 5)
        .parquet(f"{tmp}/src")
    )
    q2 = run_kmv_stream(
        stream2, t, f"{tmp}/ckpt2", "user_id", "event_type", k
    )
    q2.awaitTermination()
    second = kmv_distinct_estimates(t, k)
    assert first == second, "sketch union must absorb a full re-ingest"
    return spark.createDataFrame(second, "key string, distinct_users long")
