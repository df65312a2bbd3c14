"""Incremental view maintenance (operators/ivm.py)."""

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.ivm import apply_agg_delta
from station_data_ingestion_spark.operators.table_diff import keyed_diff


def _agg(df):
    return df.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("sv")
    )


def _as_rows(df):
    return {
        (r["g"], r["n_rows"], r["sv"]) for r in df.collect()
    }


def test_delta_equals_recompute_with_births_deaths_moves(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "k long, g string, v long",
    )
    # key 1: value update in place; key 2: moves a->b; key 3: deleted
    # (group b loses a member); key 4: deleted (group c DIES);
    # key 5: insert into brand-new group d
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "b", 20), (5, "d", 50)],
        "k long, g string, v long",
    )
    diff = keyed_diff(old, new, key=["k"])
    out = apply_agg_delta(
        _agg(old), diff, group_cols=["g"], sum_cols={"sv": "v"}
    )
    assert _as_rows(out) == _as_rows(_agg(new))


def test_null_group_keys_maintained(spark):
    old = spark.createDataFrame(
        [(1, None, 5), (2, "a", 7)], "k long, g string, v long"
    )
    new = spark.createDataFrame(
        [(1, None, 6), (2, "a", 7), (3, None, 1)],
        "k long, g string, v long",
    )
    diff = keyed_diff(old, new, key=["k"])
    out = apply_agg_delta(
        _agg(old), diff, group_cols=["g"], sum_cols={"sv": "v"}
    )
    assert _as_rows(out) == _as_rows(_agg(new))


def test_unchanged_rows_are_noops(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, g string, v long"
    )
    diff = keyed_diff(old, old, key=["k"])
    out = apply_agg_delta(
        _agg(old), diff, group_cols=["g"], sum_cols={"sv": "v"}
    )
    assert _as_rows(out) == _as_rows(_agg(old))


def test_change_feed_to_diff_multi_commit_updates(spark, tmp_path):
    """A key updated in TWO commits yields one changed row per commit,
    and replaying both through apply_agg_delta matches a recompute."""
    from pyspark.sql import functions as F

    from station_data_ingestion_spark.operators.ivm import (
        apply_agg_delta,
        change_feed_to_diff,
    )
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable

    t = SnapshotTable(
        spark, str(tmp_path / "ivm_feed"), partition_cols=(), stat_cols=()
    )
    t.commit_overwrite_partitions(
        spark.createDataFrame(
            [(i, "g1" if i % 2 else "g2", 10) for i in range(20)],
            "k long, g string, v long",
        )
    )
    v1 = t.latest_version()
    agg1 = t.read().groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("v"),
    ).localCheckpoint(eager=True)
    t.update_where(F.col("k") < 5, {"v": F.col("v") + 1})
    t.update_where(F.col("k") < 3, {"v": F.col("v") * 10})
    t.delete_where(F.col("k") == 1)
    feed = t.read_change_feed(v1)
    diff = change_feed_to_diff(feed, ["k"], ["g", "v"])
    assert diff.filter("change_type = 'changed'").count() == 8  # 5 + 3
    maintained = apply_agg_delta(agg1, diff, ["g"], {"v": "v"})
    recomputed = t.read().groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("v"),
    )
    assert maintained.exceptAll(recomputed).count() == 0
    assert recomputed.exceptAll(maintained).count() == 0
