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
