"""Unit tests for the as-of and bucketed range join operators."""

import datetime as dt

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), "p1"),
            ("u1", _ts("2024-01-01 12:00:00"), "p2"),
            ("u2", _ts("2024-01-01 09:00:00"), "p3"),  # no prior right row
        ],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), "c1"),
            ("u1", _ts("2024-01-01 12:00:00"), "c2"),  # equal ts: inclusive
            ("u2", _ts("2024-01-01 09:30:00"), "c3"),  # after left -> no match
        ],
        "user string, ts timestamp, cid string",
    )
    out = {
        r["pid"]: (r["cid_right"], r["ts_right"])
        for r in asof_join(
            left, right, on=["user"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert out["p1"] == ("c1", _ts("2024-01-01 09:30:00"))
    assert out["p2"] == ("c2", _ts("2024-01-01 12:00:00"))  # ties match
    assert out["p3"] == (None, None)  # left preserved with nulls


def test_asof_single_shuffle(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 1.0)], "user string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 2.0)], "user string, ts timestamp, w double"
    )
    qe = asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts"
    )._jdf.queryExecution()
    # union + window: exactly one shuffle (the window's), no join at all
    assert "Join" not in qe.optimizedPlan().toString()
    assert qe.executedPlan().toString().count("Exchange") == 1


def test_range_join_bucketed_boundaries(spark):
    events = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), "in-start"),
            ("u1", _ts("2024-01-01 10:59:59"), "in-end"),
            ("u1", _ts("2024-01-01 11:00:00"), "out-end-exclusive"),
            ("u1", _ts("2024-01-01 09:59:59"), "out-before"),
            ("u2", _ts("2024-01-01 10:30:00"), "out-wrong-user"),
        ],
        "user string, ts timestamp, tag string",
    )
    windows = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "w1")],
        "user string, s timestamp, e timestamp, wid string",
    )
    got = sorted(
        r["tag"]
        for r in range_join_bucketed(
            events,
            windows,
            on=["user"],
            left_ts="ts",
            right_start="s",
            right_end="e",
            bucket_seconds=1800,  # smaller than the interval: multi-bucket
        ).collect()
    )
    assert got == ["in-end", "in-start"]


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many buckets must not duplicate matches."""
    events = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:15:00"), 1.0)],
        "user string, ts timestamp, v double",
    )
    windows = spark.createDataFrame(
        [("u1", _ts("2024-01-01 08:00:00"), _ts("2024-01-01 20:00:00"), "w")],
        "user string, s timestamp, e timestamp, wid string",
    )
    rows = range_join_bucketed(
        events, windows, on=["user"], left_ts="ts",
        right_start="s", right_end="e", bucket_seconds=60,
    ).collect()
    assert len(rows) == 1


def test_asof_forward_inclusive_and_no_match(spark):
    """Forward as-of: earliest right at-or-after left.ts; equal
    timestamps MATCH (inclusive); trailing lefts with no later right
    keep nulls."""
    import datetime as dt

    from station_data_ingestion_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 7, t(0)), (2, 7, t(5)), (3, 7, t(30))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 7, t(5)), (101, 7, t(10))], "rid long, k long, ts timestamp"
    )
    j = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rid"], suffix="_r", direction="forward",
    )
    got = {r.lid: r.rid_r for r in j.collect()}
    assert got == {1: 100,   # next right after 10:00 is 10:05
                   2: 100,   # equal ts 10:05 matches (inclusive)
                   3: None}  # nothing after 10:30


def test_asof_direction_validation(spark):
    import pytest as _pytest

    from station_data_ingestion_spark.operators.temporal import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with _pytest.raises(ValueError):
        asof_join(df, df, on=["k"], left_ts="ts", right_ts="ts",
                  direction="sideways")


def test_range_join_bucketed_inclusive_end_exclusive_start(spark):
    """(start, end] bounds: the inclusive-end bucket needs no extra
    explode rows (sequence covers end's bucket) and the exclusive start
    drops the exact-start row."""
    events = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), "start-excluded"),
            ("u1", _ts("2024-01-01 10:00:01"), "in-after-start"),
            ("u1", _ts("2024-01-01 11:00:00"), "end-included"),
            ("u1", _ts("2024-01-01 11:00:01"), "out-after-end"),
        ],
        "user string, ts timestamp, tag string",
    )
    windows = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "w1")],
        "user string, s timestamp, e timestamp, wid string",
    )
    got = sorted(
        r["tag"]
        for r in range_join_bucketed(
            events, windows, on=["user"], left_ts="ts",
            right_start="s", right_end="e", bucket_seconds=1800,
            include_start=False, include_end=True,
        ).collect()
    )
    assert got == ["end-included", "in-after-start"]


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00")), ("u2", _ts("2024-01-01 12:00:00"))],
        "user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 11:59:00"), "fresh"),   # 60s back
            ("u2", _ts("2024-01-01 10:00:00"), "stale"),   # 2h back
        ],
        "user string, ts timestamp, tag string",
    )
    from station_data_ingestion_spark.operators.temporal import asof_join

    got = {
        r.user: r.tag_r
        for r in asof_join(
            left, right, on=["user"], left_ts="ts", right_ts="ts",
            right_cols=["tag"], suffix="_r", tolerance_seconds=300,
        ).collect()
    }
    assert got == {"u1": "fresh", "u2": None}


def test_interval_overlap_join_matches_brute_force(spark):
    """Bucketed interval-overlap join == the quadratic predicate join,
    including half-open touching endpoints and multi-bucket spans."""
    from pyspark.sql import functions as F

    from station_data_ingestion_spark.operators.temporal import (
        interval_overlap_join,
    )

    def mk(rows, pref):
        return spark.createDataFrame(
            [(k, i, s, e) for i, (k, s, e) in enumerate(rows)],
            f"k long, {pref}_id long, {pref}_s string, {pref}_e string",
        ).select(
            "k",
            f"{pref}_id",
            F.to_timestamp(f"{pref}_s").alias(f"{pref}_s"),
            F.to_timestamp(f"{pref}_e").alias(f"{pref}_e"),
        )

    left = mk(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            (1, "2024-01-01 02:00:00", "2024-01-01 05:00:00"),  # multi-bucket
            (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ],
        "a",
    )
    right = mk(
        [
            (1, "2024-01-01 00:30:00", "2024-01-01 00:45:00"),  # inside
            (1, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),  # touches both
            (1, "2024-01-01 04:59:00", "2024-01-01 06:00:00"),  # tail overlap
            (2, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),  # touch only
            (3, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),  # other key
        ],
        "b",
    )
    got = interval_overlap_join(
        left, right, ["k"], "a_s", "a_e", "b_s", "b_e", bucket_seconds=600
    )
    brute = left.join(right, "k").filter(
        (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
    )
    pairs = {(r.a_id, r.b_id) for r in got.collect()}
    expect = {(r.a_id, r.b_id) for r in brute.collect()}
    assert pairs == expect == {(0, 0), (1, 2)}
    # no duplicate emissions despite multi-bucket overlap
    assert got.count() == len(pairs)
