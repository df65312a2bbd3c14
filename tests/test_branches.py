"""Tags and branches (Iceberg refs) on the snapshot store: isolated
branch writes, metadata-only fast-forward publish, divergence
detection, and ref-pinned vacuum protection."""

import os

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import (
    ConcurrentCommitError,
    SnapshotTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


def _mk(spark, tmp_path, name="tbl"):
    t = SnapshotTable(
        spark, str(tmp_path / name), partition_cols=("p",), stat_cols=("k",)
    )
    t.commit_overwrite_partitions(_df(spark, 0, 60))
    return t


def _rows(df):
    return {(r["k"], r["v"]) for r in df.select("k", "v").collect()}


def test_branch_isolated_until_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    main_before = _rows(t.read())
    br = t.create_branch("exp")
    assert t.branches() == {"exp": 1}
    # branch: append new rows AND rewrite a partition (COW delete)
    br.commit_overwrite_partitions(
        _df(spark, 60, 90).withColumn("p", F.lit("9"))
    )
    br.delete_where(F.col("k") % 4 == 1)
    want = _rows(br.read())
    # main readers saw nothing
    assert _rows(t.read()) == main_before
    assert t.latest_version() == 1
    v = t.fast_forward("exp")
    assert v == 2
    assert _rows(t.read()) == want
    # branch consumed: ref and tree are gone
    assert t.branches() == {}
    assert not os.path.exists(str(tmp_path / "tbl" / "_branches" / "exp"))
    # published files are main-local: vacuum + re-read stays whole
    t.vacuum(older_than_sec=0.0)
    assert _rows(t.read()) == want


def test_fast_forward_on_diverged_main_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    br.commit_overwrite_partitions(
        _df(spark, 60, 70).withColumn("p", F.lit("9"))
    )
    # main moves after the fork
    t.commit_overwrite_partitions(
        _df(spark, 100, 110).withColumn("p", F.lit("8"))
    )
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        t.fast_forward("exp")
    # abandon cleanly; main unaffected
    t.delete_branch("exp")
    assert t.branches() == {}
    assert t.read().count() == 70


def test_tag_survives_churn_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    want_v1 = _rows(t.read())
    t.tag("rel1")
    assert t.tags() == {"rel1": 1}
    # churn: rewrite every partition twice, then vacuum with zero
    # retention — without the tag pin, v1's manifest and files die
    t.delete_where(F.col("k") % 2 == 0)
    t.commit_overwrite_partitions(_df(spark, 200, 260))
    t.vacuum(older_than_sec=0.0)
    assert _rows(t.read(ref="rel1")) == want_v1
    assert t.resolve_ref("rel1") == 1
    # untagged intermediate version IS reaped
    with pytest.raises(FileNotFoundError):
        t.read(version=2).collect()
    # tags are create-once; moving requires delete + re-tag
    with pytest.raises(ValueError, match="already exists"):
        t.tag("rel1")
    t.delete_tag("rel1")
    assert t.tags() == {}


def test_live_branch_protects_shared_files_from_main_vacuum(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    want = _rows(br.read())
    # main rewrites partitions the branch still references via the fork
    t.delete_where(F.col("k") % 2 == 0)
    t.commit_overwrite_partitions(_df(spark, 300, 360))
    t.vacuum(older_than_sec=0.0)
    # the branch head still reads every fork-version row
    assert _rows(t.branch("exp").read()) == want
    # deleting the branch releases the pins; next vacuum reaps
    t.delete_branch("exp")
    assert t.vacuum(older_than_sec=0.0)


def test_branch_dv_moves_across_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    br.delete_where_dv(F.col("k") % 5 == 0)
    want = _rows(br.read())
    t.fast_forward("exp")
    assert _rows(t.read()) == want
    # the DV token now lives under MAIN and survives main's vacuum
    t.vacuum(older_than_sec=0.0)
    assert _rows(t.read()) == want
    assert t.read().count() == 48


def test_branch_dv_over_branch_local_files_fast_forward(spark, tmp_path):
    """DVs recorded against BRANCH-LOCAL data files reference the files'
    pre-move URIs; fast-forward renames those files into main's data
    tree, so the DV must be rewritten with remapped coordinates or the
    read-path anti-join silently resurrects the deleted rows."""
    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    # append NEW rows on the branch (branch-local files)...
    br.commit_overwrite_partitions(
        _df(spark, 60, 120).withColumn("p", F.lit("9"))
    )
    # ...then DV-delete a slice of exactly those appended rows
    br.delete_where_dv((F.col("k") >= 60) & (F.col("k") % 5 == 0))
    want = _rows(br.read())
    assert len(want) == 60 + 60 - 12
    t.fast_forward("exp")
    got = _rows(t.read())
    assert got == want  # no resurrected k % 5 == 0 rows
    # the rewritten DV lives under main: survives vacuum, and a further
    # COW delete on main composes with it
    t.vacuum(older_than_sec=0.0)
    assert _rows(t.read()) == want


def test_fast_forward_lost_race_with_branch_local_dv(spark, tmp_path):
    """A lost publish CAS must also remove the rewritten main-side DV
    copies; the branch keeps its own DV file and stays retryable."""
    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    br.commit_overwrite_partitions(
        _df(spark, 60, 90).withColumn("p", F.lit("9"))
    )
    br.delete_where_dv(F.col("k") == 66)
    want = _rows(br.read())
    real_cas = t._write_manifest_exclusive
    t._write_manifest_exclusive = lambda v, m: False
    try:
        with pytest.raises(ConcurrentCommitError, match="left intact"):
            t.fast_forward("exp")
    finally:
        t._write_manifest_exclusive = real_cas
    main_dv_dir = str(tmp_path / "tbl" / "_deletes")
    assert not os.path.exists(main_dv_dir) or os.listdir(main_dv_dir) == []
    assert _rows(t.branch("exp").read()) == want
    t.fast_forward("exp")
    assert _rows(t.read()) == want
    assert (66, 660) not in _rows(t.read())


def test_ref_name_validation_and_read_param_exclusivity(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.tag("ok")
    with pytest.raises(ValueError):
        t.tag("../escape")
    with pytest.raises(ValueError):
        t.read(ref="ok", version=1)
    with pytest.raises(ValueError):
        t.resolve_ref("missing")


def test_change_feed_refuses_across_dv_fast_forward(spark, tmp_path):
    """A fast-forward carrying branch-side DVs changes rows while the
    file set stays append-only: the change feed must REFUSE (no images
    recorded), never silently report no changes."""
    from station_data_ingestion_spark.plans.snapshot_store import (
        ChangeFeedUnavailableError,
    )

    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    br = t.create_branch("exp")
    br.delete_where_dv(F.col("k") % 5 == 0)
    t.fast_forward("exp")
    with pytest.raises(ChangeFeedUnavailableError, match="deletion vectors"):
        t.read_change_feed(v1)


def test_fast_forward_lost_race_leaves_branch_intact(spark, tmp_path):
    """Losing the publish CAS must move every rehomed file BACK: the
    branch stays readable and retryable, nothing orphans in main."""
    from station_data_ingestion_spark.plans.snapshot_store import (
        ConcurrentCommitError,
    )

    t = _mk(spark, tmp_path)
    br = t.create_branch("exp")
    br.commit_overwrite_partitions(
        _df(spark, 60, 90).withColumn("p", F.lit("9"))
    )
    want = _rows(br.read())
    real_cas = t._write_manifest_exclusive
    t._write_manifest_exclusive = lambda v, m: False  # rival wins
    try:
        with pytest.raises(ConcurrentCommitError, match="left intact"):
            t.fast_forward("exp")
    finally:
        t._write_manifest_exclusive = real_cas
    # branch still whole and still registered
    assert t.branches() == {"exp": 1}
    assert _rows(t.branch("exp").read()) == want
    # and a later, un-raced fast-forward succeeds
    t.fast_forward("exp")
    assert _rows(t.read()) == want


def test_clone_to_pinned_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_rows = _rows(t.read())
    t.commit_overwrite_partitions(
        _df(spark, 100, 120).withColumn("p", F.lit("8"))
    )
    c = t.clone_to(str(tmp_path / "c1"), version=1)
    assert _rows(c.read()) == v1_rows


def test_branch_fork_readable_after_main_churn_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    fork_rows = _rows(t.read())
    t.create_branch("exp")
    t.delete_where(F.col("k") % 2 == 0)
    t.commit_overwrite_partitions(
        _df(spark, 300, 330).withColumn("p", F.lit("7"))
    )
    t.vacuum(older_than_sec=0.0)
    # the fork point is an implicit tag while the branch lives
    assert _rows(t.read(ref="exp")) == fork_rows


def test_vacuum_skips_dangling_tag_ref(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t._write_ref_exclusive("ghost", {"type": "tag", "version": 99})
    t.vacuum(older_than_sec=0.0)  # must not crash
    assert _rows(t.read())  # table unharmed
