"""asof_join direction='nearest': tie prefers backward, one-sided
fallbacks, tolerance drops far matches."""

import datetime as dt

from pyspark.sql import Row

from station_data_ingestion_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [Row(u=1, ts=_ts(10)), Row(u=1, ts=_ts(30)), Row(u=2, ts=_ts(5))],
        "u int, ts timestamp",
    )
    right = spark.createDataFrame(
        [Row(u=1, ts=_ts(8), tag="b8"), Row(u=1, ts=_ts(11), tag="f11"),
         Row(u=1, ts=_ts(30), tag="eq30"), Row(u=1, ts=_ts(29), tag="b29"),
         Row(u=2, ts=_ts(50), tag="f50")],
        "u int, ts timestamp, tag string",
    )
    return left, right


def test_nearest_picks_closer_and_backward_on_tie(spark):
    left, right = _frames(spark)
    got = {
        (r["u"], r["ts"].second): r["tag_n"]
        for r in asof_join(
            left, right, on=["u"], left_ts="ts", right_ts="ts",
            right_cols=["tag"], suffix="_n", direction="nearest",
        ).collect()
    }
    assert got[(1, 10)] == "f11" or got[(1, 10)] == "b8"
    # |10-8| = 2 vs |11-10| = 1 -> forward f11 is closer
    assert got[(1, 10)] == "f11"
    # exact-timestamp right row wins as the backward leg (gap 0)
    assert got[(1, 30)] == "eq30"
    # only a forward candidate exists for u=2
    assert got[(2, 5)] == "f50"


def test_nearest_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r["u"], r["ts"].second): r["tag_n"]
        for r in asof_join(
            left, right, on=["u"], left_ts="ts", right_ts="ts",
            right_cols=["tag"], suffix="_n", direction="nearest",
            tolerance_seconds=2.0,
        ).collect()
    }
    assert got[(1, 10)] == "f11"   # gap 1 <= 2
    assert got[(2, 5)] is None     # gap 45 > 2 -> dropped
