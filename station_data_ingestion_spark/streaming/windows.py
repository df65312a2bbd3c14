"""Streaming windowed aggregation + stateful operators over event streams.

The engine-provided streaming surface (SURVEY §2.8: absent in the
reference, required by the capability set): tumbling/sliding/session
windows with watermarks for late data, and a custom stateful operator via
applyInPandasWithState.

Scale notes: state is keyed on (window/user) -- high cardinality, even
spread; watermarks bound state size (late rows beyond the watermark are
dropped instead of growing state forever). The batch twins of these
shapes are oracle-checked in queries/events.py; streaming tests assert
stream==batch equivalence on a replayed file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..queries.registry import normalize_event_ts


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with a watermark."""
    events = normalize_event_ts(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (overlapping windows)."""
    events = normalize_event_ts(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows per user (gap-based)."""
    events = normalize_event_ts(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState (the engine's user-extensible stateful hook).

    State = (count, SCALED-INTEGER value-sum) per user, updated per
    micro-batch; emits the updated totals for users seen in the batch.
    Integer state (per-row round to 1e-4, int64-sum) is the same _MONEY
    determinism pattern the batch queries use: float state re-rounded
    each micro-batch drifts from the exact-integer oracle on boundary
    values once a replay spans multiple batches. Timeouts are omitted
    (totals are cumulative) -- a production TTL would use
    GroupStateTimeout.ProcessingTimeTimeout.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, scaled = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            scaled += int((pdf["value"] * 10000).round().astype("int64").sum())
        state.update((n, scaled))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [scaled / 10000.0],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total_scaled long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup on event_id.

    dropDuplicatesWithinWatermark keeps state only for the watermark
    horizon -- the scale-correct streaming analog of the batch
    dropDuplicates: at 100 TB/day the dedup state is bounded by (event
    rate x watermark), not by history.
    """
    events = normalize_event_ts(events)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_click_purchase_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks within the preceding `lookback`.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire join state -- the requirement for
    unbounded streams: state size ~ (rate x lookback), not history.
    """
    events = normalize_event_ts(events)
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL {lookback}"
        ),
    ).select("p_id", "c_id", "p_user", "p_ts", "c_ts")


def topk_user_spend_with_ttl(
    events: DataFrame,
    k: int = 5,
    ttl_ms: int = 3650 * 24 * 3600 * 1000,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-event-type top-k users by exact accumulated spend,
    with event-time TTL eviction of idle users (ROADMAP r5 item 3).

    State per event_type: cumulative row count ``n_seen`` plus parallel
    arrays (user, scaled-integer total, last-seen event-time ms). Each
    micro-batch folds its rows in, then evicts every user whose last
    activity is older than (current watermark - ttl_ms) — so state is
    bounded by the users ACTIVE within the TTL horizon (rate x ttl),
    not by all users ever seen. That is the point of the TTL: an
    unbounded stream cannot keep a total per historical user. Totals
    are scaled int64 (the _MONEY determinism pattern) so the final
    emission equals the batch aggregate bit-for-bit.

    Each emission carries ``n_seen`` (strictly monotone), so a batch
    consumer selects the final top-k as the rows with max n_seen per
    event_type. With ttl_ms larger than the replayed corpus' time span
    nothing is evicted and the final state matches the batch top-k
    exactly (the gate's oracle); eviction mechanics are pinned by a
    planted-gap pytest instead.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = normalize_event_ts(events)

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            n_seen, users, scaled, last = state.get
        else:
            n_seen, users, scaled, last = 0, [], [], []
        d = {int(u): [int(s), int(t)] for u, s, t in zip(users, scaled, last)}
        for pdf in pdfs:
            n_seen += len(pdf)
            vals = (pdf["value"] * 10000).round().astype("int64")
            # unit-safe epoch-ms regardless of the batch's datetime64 unit
            ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64")
            for u, v, t in zip(pdf["user_id"].astype("int64"), vals, ts_ms):
                ent = d.get(int(u))
                if ent is None:
                    d[int(u)] = [int(v), int(t)]
                else:
                    ent[0] += int(v)
                    if t > ent[1]:
                        ent[1] = int(t)
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            horizon = wm - ttl_ms
            d = {u: st for u, st in d.items() if st[1] >= horizon}
        us = sorted(d)
        state.update(
            (
                int(n_seen),
                us,
                [d[u][0] for u in us],
                [d[u][1] for u in us],
            )
        )
        top = sorted(d.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(top),
                "n_seen": np.full(len(top), n_seen, dtype="int64"),
                "rank": np.arange(1, len(top) + 1, dtype="int32"),
                "user_id": np.array([u for u, _ in top], dtype="int64"),
                "total_value": np.array(
                    [s for _, (s, _) in top], dtype="int64"
                )
                / 10000.0,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .select("event_type", "user_id", "value", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "event_type string, n_seen long, rank int, user_id long, "
                "total_value double"
            ),
            stateStructType=(
                "n_seen long, users array<long>, scaled array<long>, "
                "last array<long>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_click_purchase_left_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase emits —
    matched rows as matches arrive, and a null-click row once the
    watermark proves no match can still come (the purchase's join
    window has fully expired from state).

    The outer side is what distinguishes this from the inner join: the
    engine may only emit the null row after event time passes
    purchase_ts + lookback + watermark delay, so state stays bounded
    AND unmatched purchases are not lost — the streaming analog of a
    left join's null-extension.
    """
    events = normalize_event_ts(events)
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL {lookback}"
        ),
        "left_outer",
    ).select("p_id", "c_id", "p_user", "p_ts", "c_ts")


def static_enriched_counts(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each micro-batch
    inner-joins the STATIC dimension (no state, no watermark needed on
    the dim side — Spark re-plans it per batch, broadcast when small)
    and aggregates per (window, segment). The streaming-state story is
    unchanged from tumbling_counts; the join adds zero state."""
    events = normalize_event_ts(events)
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0
            ).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "segment",
            "n_events",
            "total_value",
        )
    )


def session_windows_dynamic_gap(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with a PER-EVENT gap expression: purchases hold
    the session open 60 minutes, everything else 30 — the
    engagement-weighted sessionization batch gaps-and-islands cannot
    express with one constant. Each event contributes [ts, ts+gap);
    Spark merges overlapping per-key windows, so the session is the
    interval union and its end is max(ts + gap(event))."""
    events = normalize_event_ts(events)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def stream_stream_click_purchase_full_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join: BOTH sides null-extend.
    Matches emit as they arrive; a null-click purchase row emits when
    the purchase's window expires (p_ts + delay below the watermark);
    a null-purchase click row emits when the CLICK's window expires —
    a click can match purchases up to c_ts + lookback, so its state
    (and the null emission) finalizes one lookback later than the
    purchase side's. State on both sides stays watermark-bounded."""
    events = normalize_event_ts(events)
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL {lookback}"
        ),
        "full_outer",
    ).select(
        "p_id",
        "c_id",
        F.coalesce("p_user", "c_user").alias("who"),
        "p_ts",
        "c_ts",
    )
