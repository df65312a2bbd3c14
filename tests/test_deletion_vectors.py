"""Merge-on-read deletion vectors (snapshot_store.delete_where_dv)."""

from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path, n=100):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), partition_cols=("p",), stat_cols=("k",)
    )
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t.commit_overwrite_partitions(df)
    return t


def _files(t):
    return sorted(
        e["path"] for e in t._read_manifest(t.latest_version())["files"]
    )


def test_dv_delete_reads_correctly_without_rewriting_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _files(t)
    v = t.delete_where_dv(F.col("k") % 10 == 3)
    assert _files(t) == before  # no data file rewritten
    got = {r["k"] for r in t.read().select("k").collect()}
    assert got == {k for k in range(100) if k % 10 != 3}
    # time travel to the pre-delete version still sees everything
    assert t.read(version=v - 1).count() == 100


def test_dv_null_predicate_rows_survive(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), partition_cols=(), stat_cols=()
    )
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "k int, x int"
    )
    t.commit_overwrite_partitions(df)
    t.delete_where_dv(F.col("x") > 10)
    assert {r["k"] for r in t.read().collect()} == {1, 2}


def test_dv_stacks_and_append_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(F.col("k") < 10)
    t.delete_where_dv(F.col("k") >= 90)
    extra = spark.createDataFrame(
        [(1000, "0", 0)], "k long, p string, v long"
    ).select("k", "p", "v")
    # append replaces partition p=0 content? no — use a new partition
    extra = extra.withColumn("p", F.lit("9"))
    t.commit_overwrite_partitions(extra)
    got = {r["k"] for r in t.read().select("k").collect()}
    assert got == set(range(10, 90)) | {1000}


def test_dv_second_delete_does_not_rematch_deleted_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(F.col("k") < 50)
    v = t.latest_version()
    # rows already deleted can't match again: no-op delete keeps version
    assert t.delete_where_dv(F.col("k") < 40) == v


def test_materialize_deletes_rewrites_only_touched_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv((F.col("k") % 2 == 0) & (F.col("k") < 20))  # p=0 only
    before = dict(
        (e["path"], e)
        for e in t._read_manifest(t.latest_version())["files"]
    )
    t.materialize_deletes()
    after = t._read_manifest(t.latest_version())
    assert not after.get("deletes")
    # partition p=1 files kept exact identity
    p1_before = {p for p in before if "p=1" in p}
    p1_after = {e["path"] for e in after["files"] if "p=1" in e["path"]}
    assert p1_before == p1_after
    got = {r["k"] for r in t.read().select("k").collect()}
    assert got == {k for k in range(100) if not (k % 2 == 0 and k < 20)}


def test_cow_update_on_dv_table_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(F.col("k") == 4)
    t.update_where(F.col("k") == 6, {"v": F.lit(999)})
    rows = {r["k"]: r["v"] for r in t.read().select("k", "v").collect()}
    assert 4 not in rows and rows[6] == 999


def test_dv_change_feed_matches_cow_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.latest_version()
    t.delete_where_dv(F.col("k") >= 95)
    feed = t.read_change_feed(v0)
    rows = feed.select("k", "_change_type").collect()
    assert {r["k"] for r in rows} == {95, 96, 97, 98, 99}
    assert {r["_change_type"] for r in rows} == {"delete"}


def test_metadata_count_and_minmax_fall_back_under_dv(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.count_rows() == 100
    assert t.stats_min_max("k") == (0, 99)
    t.delete_where_dv(F.col("k") == 0)
    assert t.count_rows() is None
    assert t.stats_min_max("k") is None
    t.materialize_deletes()
    assert t.count_rows() == 99
    assert t.stats_min_max("k") == (1, 99)


def test_read_appends_flags_dv_change_as_non_append(spark, tmp_path):
    import pytest

    t = _mk(spark, tmp_path)
    _, cur = t.read_appends(None)
    t.delete_where_dv(F.col("k") == 7)
    with pytest.raises(RuntimeError, match="deletion vectors changed"):
        t.read_appends(cur)
    df, _ = t.read_appends(cur, on_rewrite="include")
    assert df is None  # no new files; at-least-once consumers see none


def test_clone_inherits_dvs_and_diverges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(F.col("k") < 5)
    c = t.clone_to(str(tmp_path / "clone"))
    assert c.read().count() == 95
    # clone-side delete doesn't affect the source
    c.delete_where_dv(F.col("k") >= 95)
    assert c.read().count() == 90
    assert t.read().count() == 95
    # source materialize doesn't break the clone (tokens root-pinned)
    t.materialize_deletes()
    assert c.read().count() == 90


def test_vacuum_keeps_live_dv_reaps_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(F.col("k") == 1)
    t.materialize_deletes()  # DV list cleared at LATEST, older vs reference it
    # retention 0: old manifests reaped, then the DV token is orphaned
    t.vacuum(older_than_sec=0.0)
    t.vacuum(older_than_sec=0.0)
    import os

    dv_dir = os.path.join(str(tmp_path / "tbl"), "_deletes")
    assert (not os.path.exists(dv_dir)) or os.listdir(dv_dir) == []
    assert t.read().count() == 99


def test_ranged_read_applies_dv(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), partition_cols=(), stat_cols=("k",)
    )
    df = spark.range(1000).select(F.col("id").alias("k"))
    t.commit_overwrite_partitions(df, cluster_by=("k",), cluster_partitions=4)
    t.delete_where_dv((F.col("k") >= 100) & (F.col("k") < 110))
    got = t.read(ranges={"k": (50, 150)}).filter(
        (F.col("k") >= 50) & (F.col("k") <= 150)
    )
    assert got.count() == 101 - 10


def test_mor_update_values_and_file_identity(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = set(_files(t))
    v0 = t.latest_version()
    t.update_where_dv(F.col("k") % 10 == 0, {"v": F.col("v") + 1})
    after = set(_files(t))
    assert before <= after  # old files all kept; postimage files added
    rows = {r["k"]: r["v"] for r in t.read().select("k", "v").collect()}
    assert len(rows) == 100
    for k in range(100):
        assert rows[k] == k * 10 + (1 if k % 10 == 0 else 0)
    assert t.read(version=v0).count() == 100


def test_mor_update_can_move_partitions(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # flip partition of k=3 from p=1 to p=0
    t.update_where_dv(F.col("k") == 3, {"p": F.lit("0")})
    got = t.read(partition={"p": "0"}).select("k")
    assert 3 in {r["k"] for r in got.collect()}
    assert t.read().count() == 100


def test_mor_update_change_feed_pre_and_post(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.latest_version()
    t.update_where_dv(F.col("k") == 42, {"v": F.lit(7)})
    feed = t.read_change_feed(v0).select("k", "v", "_change_type").collect()
    assert {(r["v"], r["_change_type"]) for r in feed} == {
        (420, "update_preimage"),
        (7, "update_postimage"),
    }


def test_mor_update_noop_keeps_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.latest_version()
    assert t.update_where_dv(F.col("k") > 10**9, {"v": F.lit(0)}) == v


def test_concurrent_dv_deletes_never_lose_an_update(spark, tmp_path):
    """Two racing merge-on-read deletes: either they serialize (both
    DVs in the final manifest) or the loser raises ConcurrentCommitError
    — a committed delete is NEVER silently dropped by a rival's commit."""
    import threading

    from station_data_ingestion_spark.plans.snapshot_store import (
        ConcurrentCommitError,
    )

    t = SnapshotTable(
        spark, str(tmp_path / "race"), partition_cols=("p",), stat_cols=()
    )
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    t.commit_overwrite_partitions(df)
    results = {}

    def run(name, pred):
        try:
            results[name] = ("ok", t.delete_where_dv(pred))
        except ConcurrentCommitError as e:
            results[name] = ("conflict", str(e))

    a = threading.Thread(target=run, args=("a", F.col("k") % 10 == 0))
    b = threading.Thread(target=run, args=("b", F.col("k") % 10 == 1))
    a.start(); b.start(); a.join(); b.join()
    survivors = {r["k"] for r in t.read().select("k").collect()}
    for name, pred_mod in (("a", 0), ("b", 1)):
        status = results[name][0]
        hit = {k for k in range(200) if k % 10 == pred_mod}
        if status == "ok":
            assert not (survivors & hit), f"{name} committed but rows survive"
        else:
            assert hit <= survivors, f"{name} conflicted but rows vanished"
    assert any(s == "ok" for s, _ in results.values())


def test_restore_preserves_deletion_vectors(spark, tmp_path):
    """RESTORE to a DV-bearing version must carry the DVs: dropping
    them resurrects deleted rows and un-guards metadata stats."""
    t = SnapshotTable(
        spark, str(tmp_path / "rdv"), partition_cols=("p",), stat_cols=()
    )
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    t.commit_overwrite_partitions(df)
    t.delete_where_dv(F.col("k") % 5 == 0)
    v_dv = t.latest_version()
    n_after_dv = t.read().count()
    t.commit_overwrite_partitions(
        spark.range(100, 120).select(
            F.col("id").alias("k"), F.lit("9").alias("p")
        )
    )
    t.restore(v_dv)
    assert t.read().count() == n_after_dv  # 40, not 50
    assert {r["k"] for r in t.read().select("k").collect()} == {
        k for k in range(50) if k % 5 != 0
    }


def test_dv_survives_rename_and_drop_column(spark, tmp_path):
    """Metadata-only column evolution must carry deletion vectors
    forward: before the fix, rename_column/drop_column wrote manifests
    without the deletes list and resurrected every DV-deleted row."""
    from pyspark.sql import functions as F

    from station_data_ingestion_spark.plans.snapshot_store import (
        SnapshotTable,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"), partition_cols=())
    t.commit_overwrite_partitions(
        spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit("x").alias("aux"),
        )
    )
    t.delete_where_dv(F.col("k") % 4 == 0)
    assert t.read().count() == 30
    t.rename_column("v", "val")
    assert t.read().count() == 30  # rename must not resurrect
    assert "val" in t.read().columns
    t.drop_column("aux")
    assert t.read().count() == 30  # drop must not resurrect
    assert "aux" not in t.read().columns
