"""Temporal join operators Spark lacks natively: as-of join, range join.

Neither exists in the reference (SURVEY.md §2.4 notes: "No theta/range/
as-of joins anywhere in the reference") nor as a single PySpark builtin,
so both are implemented as compositions of DataFrame ops chosen for their
shuffle behavior at 100 TB:

- **as-of join** (`asof_join`): the union + partitioned-window trick.
  Tag both inputs, union them, and take `last(right_value, ignorenulls)`
  over a window partitioned by the key and ordered by (ts, tag). ONE
  shuffle on the key -- same cost as a plain equi-join -- and no range
  explosion. This is the standard scalable formulation (pandas
  merge_asof semantics, direction='backward', inclusive).

- **range join** (`range_join_bucketed`): equi-join on (key, time-bucket)
  with the probe side exploded to every bucket its window overlaps, then
  an exact range filter. Turns an O(|L|x|R|)-per-key theta join into an
  equi-join whose fan-out is bounded by window_span/bucket_span + 1.
  Catalyst/AQE treat it as a normal shuffle join (skew handling, AQE
  re-planning all apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction='backward'``, pandas merge_asof default: latest
    right.ts <= left.ts) or at-or-after (``'forward'``: earliest
    right.ts >= left.ts) its timestamp.

    ``tolerance_seconds`` (pandas merge_asof ``tolerance`` parity):
    when set, a nearest match further than this from the left timestamp
    is treated as NO match (nulls) — a per-row predicate on the already-
    computed nearest struct, so the plan shape (one shuffle) is
    unchanged.

    Left rows with no match keep nulls. Returns all left columns plus
    each requested right column renamed ``<col><suffix>`` (plus
    ``<right_ts><suffix>`` for the matched timestamp).

    Implementation: union the two sides with a tag ordered so that at
    equal timestamps the right row falls INSIDE the left row's window
    frame (before it for backward, after it for forward — both
    inclusive), then propagate the nearest right-side struct with
    ``last``/``first(..., ignorenulls=True)`` over an unbounded window
    per key. One shuffle on `on`; no range blow-up, either direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    right_tag = 2 if direction == "forward" else 0
    r = right.select(
        *on,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(right_tag).alias("__side"),
        payload.alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    unioned = r.unionByName(l_side)
    wb = (
        Window.partitionBy(*on)
        .orderBy("__evt_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy("__evt_ts", "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = unioned.withColumn(
            "__m", F.last("__rv", ignorenulls=True).over(wb)
        )
    elif direction == "forward":
        matched = unioned.withColumn(
            "__m", F.first("__rv", ignorenulls=True).over(wf)
        )
    else:
        # NEAREST (pandas merge_asof direction='nearest'): both legs
        # ride the SAME sorted union — one shuffle, two window frames —
        # then the closer side wins; exact ties prefer backward. Right
        # rows at the left row's exact timestamp sort before it (tag 0),
        # so the backward leg owns gap-0 matches, which is precisely the
        # tie rule.
        both = unioned.withColumn(
            "__mb", F.last("__rv", ignorenulls=True).over(wb)
        ).withColumn("__mf", F.first("__rv", ignorenulls=True).over(wf))
        gb = F.unix_micros(F.col("__evt_ts")) - F.unix_micros(
            F.col("__mb.__ts")
        )
        gf = F.unix_micros(F.col("__mf.__ts")) - F.unix_micros(
            F.col("__evt_ts")
        )
        pick_back = F.col("__mf").isNull() | (
            F.col("__mb").isNotNull() & (gb <= gf)
        )
        matched = both.withColumn(
            "__m", F.when(pick_back, F.col("__mb")).otherwise(F.col("__mf"))
        ).drop("__mb", "__mf")
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col("__evt_ts")) - F.unix_micros(
            F.col("__m.__ts")
        )
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        within = gap <= F.lit(int(tolerance_seconds * 1_000_000))
        matched = matched.withColumn("__m", F.when(within, F.col("__m")))
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(c) for c in left.columns if c not in on]
        + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
        + [F.col("__m.__ts").alias(f"{right_ts}{suffix}")]
    )
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    include_start: bool = True,
    include_end: bool = False,
) -> DataFrame:
    """Join left rows to right intervals: on-keys equal AND left_ts
    within [right_start, right_end) — bound inclusivity configurable via
    ``include_start`` / ``include_end`` (so (start, end] windows need no
    second unbucketed tie-break join; VERDICT r4 flagged exactly that
    pattern as a whale-user cartesian hazard).

    `bucket_seconds` should be >= the typical interval length: each right
    interval explodes into (span / bucket_seconds + 1) bucket rows
    (sequence() covers the end bucket, so an inclusive end needs no extra
    buckets), each left row into exactly one, and the exact range
    predicate runs only on bucket-colocated pairs. All columns of both
    sides are preserved (caller projects).
    """
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / bucket_seconds).cast("long"),
            )
        ),
    )
    lo = (
        F.col(left_ts) >= F.col(right_start)
        if include_start
        else F.col(left_ts) > F.col(right_start)
    )
    hi = (
        F.col(left_ts) <= F.col(right_end)
        if include_end
        else F.col(left_ts) < F.col(right_end)
    )
    cond = lo & hi
    return lb.join(rb, on=[*on, "__bucket"]).filter(cond).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Join interval pairs that OVERLAP: on-keys equal AND
    [left_start, left_end) intersects [right_start, right_end)
    (half-open — touching endpoints do not overlap). The interval-
    interval sibling of range_join_bucketed's point-in-interval.

    BOTH sides explode into the epoch buckets their interval covers and
    meet on bucket equality, so the exact overlap predicate runs only on
    bucket-colocated pairs — never a per-key cartesian. A pair whose
    overlap spans several buckets matches in each; the final distinct-by
    construction de-duplicates on the exploded bucket only (dropDuplicates
    over the original columns), so callers get each overlapping pair once.
    Pick ``bucket_seconds`` near the typical interval length: cost is
    sum(span)/bucket per side, and the candidate set is pairs sharing a
    bucket — the same sizing rule as the point variant.
    """
    lcols, rcols = left.columns, right.columns
    dup = [c for c in rcols if c in lcols and c not in on]
    if dup:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {dup}; rename first"
        )

    def buckets(df, s, e):
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    (F.unix_timestamp(F.col(s)) / bucket_seconds).cast("long"),
                    (F.unix_timestamp(F.col(e)) / bucket_seconds).cast("long"),
                )
            ),
        )

    lb = buckets(left, left_start, left_end)
    rb = buckets(right, right_start, right_end)
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    return (
        lb.join(rb, on=[*on, "__bucket"])
        .filter(overlap)
        .drop("__bucket")
        .dropDuplicates([*on, *[c for c in lcols + rcols if c not in on]])
    )
