"""Row tracking: stable table-unique row ids that survive rewrites.
[reference: Delta Lake row tracking (row_id = base + position,
materialize-on-rewrite) / Iceberg row lineage]
"""

import pytest
from pyspark.sql import Row, functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path, name="t"):
    return SnapshotTable(
        spark, str(tmp_path / name), partition_cols=("batch",)
    )


def _rows(spark, pairs, batch):
    return spark.createDataFrame(
        [Row(k=k, val=v, batch=batch) for k, v in pairs],
        "k int, val string, batch int",
    )


def _ids(t, **kw):
    return {
        r["k"]: r["_row_id"]
        for r in t.read(with_row_ids=True, **kw).collect()
    }


def test_ids_assigned_and_plain_read_hides_them(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(_rows(spark, [(1, "a"), (2, "b")], 1))
    t.enable_row_tracking()
    ids = _ids(t)
    assert sorted(ids.values()) == [0, 1]
    assert "_row_id" not in t.read().columns


def test_read_without_tracking_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(_rows(spark, [(1, "a")], 1))
    with pytest.raises(ValueError, match="row tracking"):
        t.read(with_row_ids=True)


def test_appends_get_fresh_contiguous_ranges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(_rows(spark, [(1, "a"), (2, "b")], 1))
    t.enable_row_tracking()
    t.commit_overwrite_partitions(_rows(spark, [(3, "c"), (4, "d")], 2))
    ids = _ids(t)
    assert len(ids) == 4
    assert len(set(ids.values())) == 4  # unique
    assert {ids[1], ids[2]} == {0, 1}
    assert {ids[3], ids[4]} <= {2, 3}


def test_update_preserves_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], 1)
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.update_where(F.col("k") == 2, {"val": F.lit("B")})
    after = _ids(t)
    assert after == before
    vals = {r["k"]: r["val"] for r in t.read().collect()}
    assert vals[2] == "B"


def test_delete_rewrite_preserves_survivor_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], 1)
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.delete_where("k = 2")
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if k != 2}


def test_dv_delete_preserves_ids_for_free(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], 1)
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.delete_where_dv(F.col("k") == 1)
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if k != 1}
    # and DV materialization (a rewrite) keeps them too
    t.materialize_deletes()
    assert _ids(t) == after


def test_double_rewrite_keeps_ids(spark, tmp_path):
    """Materialized ids must survive a SECOND rewrite (physical column
    wins over a recomputed base)."""
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(
        _rows(spark, [(1, "a"), (2, "b"), (3, "c")], 1)
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.update_where(F.col("k") == 1, {"val": F.lit("A")})
    t.update_where(F.col("k") == 3, {"val": F.lit("C")})
    assert _ids(t) == before


def test_recluster_preserves_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(
        _rows(spark, [(5, "e"), (1, "a"), (3, "c")], 1)
    )
    t.enable_row_tracking()
    before = _ids(t)
    t.recluster_partition({"batch": "1"}, cluster_by=("k",))
    assert _ids(t) == before


def test_time_travel_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(_rows(spark, [(1, "a"), (2, "b")], 1))
    t.enable_row_tracking()
    v0 = t.latest_version()
    before = _ids(t)
    t.update_where(F.col("k") == 1, {"val": F.lit("A")})
    assert _ids(t, version=v0) == before


def test_enable_is_idempotent_and_stats_required(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit_overwrite_partitions(_rows(spark, [(1, "a")], 1))
    v1 = t.enable_row_tracking()
    assert t.enable_row_tracking() == v1


def test_multi_partition_single_commit_basename_collision(spark, tmp_path):
    """One commit writing several partitions emits identically-named
    part files in different dirs — the id map must key on the full
    relative path or ids collide/duplicate."""
    t = _mk(spark, tmp_path)
    df = _rows(spark, [(1, "a"), (2, "b")], 1).unionByName(
        _rows(spark, [(3, "c"), (4, "d")], 2)
    )
    t.commit_overwrite_partitions(df)
    t.enable_row_tracking()
    ids = _ids(t)
    assert len(ids) == 4
    assert sorted(ids.values()) == [0, 1, 2, 3]
