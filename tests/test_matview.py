"""Incremental materialized views over catalog transactions."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.matview import MaterializedView
from station_data_ingestion_spark.plans.catalog import Catalog
from station_data_ingestion_spark.plans.snapshot_store import (
    ConcurrentCommitError,
)


def _base(spark, lo, hi, price=10):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.lit(price) * (1 + F.col("id") % 4)).cast("long").alias("cents"),
    )


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.init()
    txn = cat.transaction()
    txn.create_table(
        "fact", _base(spark, 0, 90), partition_cols=("p",), stat_cols=()
    )
    txn.commit()
    mv = MaterializedView(
        cat, "fact_by_p", "fact",
        group_cols=["p"], sum_cols={"cents": "cents"}, key_cols=["k"],
    )
    mv.create()
    return cat, mv


def _recompute(snap):
    return {
        (r["p"], r["n_rows"], r["cents"])
        for r in snap.read("fact")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .collect()
    }


def _view(snap, mv):
    return {
        (r["p"], r["n_rows"], r["cents"])
        for r in snap.read(mv.name).collect()
    }


def test_create_matches_full_recompute(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    s = cat.snapshot()
    assert _view(s, mv) == _recompute(s)
    assert mv.staleness() == 0


def test_append_then_incremental_refresh(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    txn = cat.transaction()
    extra = _base(spark, 90, 130, price=7).withColumn("p", F.lit("9"))
    txn.write("fact", extra)
    txn.commit()
    assert mv.staleness() == 1
    mv.refresh()
    s = cat.snapshot()
    assert mv.staleness() == 0
    assert _view(s, mv) == _recompute(s)


def test_update_via_recorded_changes_refresh(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    txn = cat.transaction()
    old = txn.read("fact", partition={"p": "0"}).select("k", "p", "cents")
    new = old.withColumn("cents", F.col("cents") + 5)
    changes = old.withColumn(
        "_change_type", F.lit("update_preimage")
    ).unionByName(new.withColumn("_change_type", F.lit("update_postimage")))
    txn.write("fact", new, changes=changes)
    txn.commit()
    mv.refresh()
    s = cat.snapshot()
    assert _view(s, mv) == _recompute(s)


def test_dead_branch_changes_do_not_poison_refresh(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    # an aborted txn stages a write WITH a recorded change frame: its
    # table version exists but was never pinned — a naive range walk of
    # the change feed would absorb these phantom deltas
    ghost = cat.transaction()
    g_old = ghost.read("fact", partition={"p": "1"}).select("k", "p", "cents")
    g_new = g_old.withColumn("cents", F.col("cents") * 100)
    g_changes = g_old.withColumn(
        "_change_type", F.lit("update_preimage")
    ).unionByName(
        g_new.withColumn("_change_type", F.lit("update_postimage"))
    )
    ghost.write("fact", g_new, changes=g_changes)
    ghost.abort()
    # a real append lands after the ghost
    txn = cat.transaction()
    txn.write(
        "fact", _base(spark, 200, 220).withColumn("p", F.lit("9"))
    )
    txn.commit()
    mv.refresh()
    s = cat.snapshot()
    assert _view(s, mv) == _recompute(s)


def test_refresh_is_atomic_with_cursor(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.write("fact", _base(spark, 300, 330).withColumn("p", F.lit("8")))
    txn.commit()
    s_stale = cat.snapshot()
    mv.refresh()
    # the stale snapshot is still internally consistent: its view
    # matches a recompute of the fact AT THE CURSOR it carries
    cursor = int(s_stale.props(mv.name)["mv_cursor"])
    fact_at_cursor = s_stale.table("fact").read(version=cursor)
    want = {
        (r["p"], r["n_rows"], r["cents"])
        for r in fact_at_cursor.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .collect()
    }
    assert _view(s_stale, mv) == want
    # and the fresh snapshot agrees with the fresh fact
    s = cat.snapshot()
    assert _view(s, mv) == _recompute(s)


def test_concurrent_refreshes_serialize(spark, tmp_path):
    cat, mv = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.write("fact", _base(spark, 400, 420).withColumn("p", F.lit("7")))
    txn.commit()
    mv2 = MaterializedView(
        cat, "fact_by_p", "fact",
        group_cols=["p"], sum_cols={"cents": "cents"}, key_cols=["k"],
    )
    # interleave: build both refresh txns against the same snapshot by
    # running refresh() twice; the second must either no-op (cursor
    # already advanced) — here sequential, so it no-ops
    mv.refresh()
    v = cat.latest_version()
    assert mv2.refresh() == v  # no-op: nothing stale
    # true conflict: stale view pin CAS — simulate with a manual txn
    a, b = cat.transaction(), cat.transaction()
    a.write("fact_by_p", a.read("fact_by_p"))
    b.write("fact_by_p", b.read("fact_by_p"))
    a.commit()
    with pytest.raises(ConcurrentCommitError):
        b.commit()
