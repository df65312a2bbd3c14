"""Distributed two-phase prefix sum == serial scan, on any layout."""

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.operators.prefix_sum import ordered_prefix_sum


def _serial_cumsum(spark, df):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return {r["k"]: r["c"] for r in df.withColumn("c", F.sum("v").over(w)).collect()}


def test_matches_serial_scan_across_partitionings(spark):
    rows = [(i, (i * 37) % 101) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    exp = _serial_cumsum(spark, df)
    for nparts in (1, 3, 32):
        got = {
            r["k"]: r["cum"]
            for r in ordered_prefix_sum(
                df.repartition(7), ["k"], "v", num_partitions=nparts
            ).collect()
        }
        assert got == exp, f"nparts={nparts}"


def test_skewed_and_tiny_inputs(spark):
    # fewer rows than partitions, plus a single-row frame
    df = spark.createDataFrame([(1, 10), (2, 0), (3, -5)], "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in ordered_prefix_sum(df, ["k"], "v", num_partitions=32).collect()
    }
    assert got == {1: 10, 2: 10, 3: 5}
    one = ordered_prefix_sum(
        spark.createDataFrame([(9, 4)], "k long, v long"), ["k"], "v"
    ).collect()
    assert [(r["k"], r["cum"]) for r in one] == [(9, 4)]


def test_keeps_plan_distributed(spark):
    """The point of the operator: no global window, and the data set
    shuffles exactly once (the range partition); the cumsum itself is a
    narrow Arrow stage."""
    import contextlib
    import io

    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    out = ordered_prefix_sum(df, ["k"], "v", num_partitions=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "MapInPandas" in plan
    # the one range shuffle runs inside the eager localCheckpoint, so the
    # visible plan is just the narrow Arrow pass over the checkpointed
    # RDD: NO exchange of any kind may appear after it
    assert "Exchange" not in plan and "hashpartitioning" not in plan
    # and the checkpointed frame really is range-partitioned 8 ways
    assert out.rdd.getNumPartitions() == 8


def test_multi_column_equals_two_single_passes(spark):
    """ordered_prefix_sums fuses N running sums into one pass; each
    output column must equal its single-column twin exactly (r11: the
    fixed costs of the two-phase scan are per-order, not per-column)."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sums,
    )

    rows = [(i, (i * 37) % 101, (i * 13) % 7 - 3) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long, w long")
    exp_v = {
        r["k"]: r["cum"]
        for r in ordered_prefix_sum(df, ["k"], "v", num_partitions=5).collect()
    }
    exp_w = {
        r["k"]: r["cum"]
        for r in ordered_prefix_sum(df, ["k"], "w", num_partitions=5).collect()
    }
    fused = ordered_prefix_sums(
        df.repartition(7),
        ["k"],
        {"cv": "v", "cw": F.col("w"), "rn": F.lit(1)},
        num_partitions=5,
    ).collect()
    assert {r["k"]: r["cv"] for r in fused} == exp_v
    assert {r["k"]: r["cw"] for r in fused} == exp_w
    assert {r["k"]: r["rn"] for r in fused} == {
        r[0]: i + 1 for i, r in enumerate(sorted(rows))
    }
