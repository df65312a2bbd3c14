"""merge_dv: MERGE-ON-READ upsert (DV-delete + append, one commit)."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), partition_cols=("p",),
        stat_cols=("k",),
    )
    t.commit_overwrite_partitions(
        spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"),
            (F.col("id") * 10).alias("v"),
        )
    )
    return t


def _updates(spark):
    # k % 5 == 0: 0..25 -> matched; 35, 40 are new keys
    rows = [(k, str(k % 3), k * 10 + 1) for k in range(0, 45, 5)]
    return spark.createDataFrame(rows, "k long, p string, v long")


def test_merge_dv_semantics_and_no_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    files1 = {e["path"] for e in t._read_manifest(v1)["files"]}
    res = t.merge_dv(_updates(spark), ["k"])
    assert res == {"version": v1 + 1, "created": 3, "replaced": 6}
    m2 = t._read_manifest(res["version"])
    assert files1 <= {e["path"] for e in m2["files"]}  # zero rewrites
    assert m2.get("deletes"), "replaced rows must go through a DV"
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 33
    for k in range(0, 45, 5):
        assert got[k] == k * 10 + 1  # update image won
    assert got[1] == 10  # untouched
    # time travel still sees the pre-merge values
    assert {r["k"]: r["v"] for r in t.read(version=v1).collect()}[0] == 0


def test_merge_dv_change_feed_and_idempotence(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    t.merge_dv(_updates(spark), ["k"])
    feed = t.read_change_feed(v1)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_type == {
        "insert": 3, "update_preimage": 6, "update_postimage": 6
    }
    # replaying identical updates: nothing changed -> no-op, no commit
    v2 = t.latest_version()
    res2 = t.merge_dv(_updates(spark), ["k"])
    assert res2 == {"version": v2, "created": 0, "replaced": 0}
    assert t.latest_version() == v2


def test_merge_dv_multi_match_raises(spark, tmp_path):
    from station_data_ingestion_spark.operators.merge import RecordKeyError

    t = SnapshotTable(spark, str(tmp_path / "t2"), partition_cols=())
    t.commit_overwrite_partitions(
        spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20)], "k long, v long"
        )
    )
    with pytest.raises(Exception):  # multi-match surfaces loudly
        t.merge_dv(
            spark.createDataFrame([(1, 99)], "k long, v long"), ["k"]
        )
