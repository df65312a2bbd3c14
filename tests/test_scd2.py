"""SCD type-2 merge operator: history-preserving upsert semantics."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.scd2 import scd2_apply, scd2_init


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "A", 100), (2, "B", 200), (3, "C", 300)],
        "id long, seg string, cents long",
    )
    return scd2_init(snap, key=["id"], tracked=["seg", "cents"])


def test_scd2_changed_new_and_noop(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [(1, "A2", 100),   # changed (seg)
         (2, "B", 200),    # genuine no-op
         (9, "Z", 900)],   # new key
        "id long, seg string, cents long",
    )
    out = scd2_apply(dim, updates, ["id"], ["seg", "cents"], effective_version=2)
    rows = {(r.id, r.seg, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()}
    assert rows == {
        (1, "A", 1, 2, False),    # closed old version
        (1, "A2", 2, None, True), # new open version
        (2, "B", 1, None, True),  # untouched (no-op update)
        (3, "C", 1, None, True),  # untouched (no update)
        (9, "Z", 2, None, True),  # brand new
    }


def test_scd2_second_wave_preserves_history(spark):
    dim = _dim(spark)
    v2 = scd2_apply(
        dim,
        spark.createDataFrame([(1, "A2", 100)], "id long, seg string, cents long"),
        ["id"], ["seg", "cents"], effective_version=2,
    )
    v3 = scd2_apply(
        v2,
        spark.createDataFrame([(1, "A3", 150)], "id long, seg string, cents long"),
        ["id"], ["seg", "cents"], effective_version=3,
    )
    hist = sorted(
        (r.seg, r.valid_from, r.valid_to, r.is_current)
        for r in v3.filter(F.col("id") == 1).collect()
    )
    assert hist == [("A", 1, 2, False), ("A2", 2, 3, False),
                    ("A3", 3, None, True)]
    # closed history rows never rejoin: only ONE current row per key
    assert v3.filter("is_current").groupBy("id").count().filter(
        "count > 1"
    ).count() == 0


def test_scd2_null_tracked_values_nullsafe(spark):
    snap = spark.createDataFrame([(1, None, 100)], "id long, seg string, cents long")
    dim = scd2_init(snap, ["id"], ["seg", "cents"])
    # null == null must be NO-OP (eqNullSafe), not a spurious new version
    out = scd2_apply(
        dim,
        spark.createDataFrame([(1, None, 100)], "id long, seg string, cents long"),
        ["id"], ["seg", "cents"], effective_version=2,
    )
    assert out.count() == 1 and out.first().valid_from == 1
    # null -> value IS a change
    out2 = scd2_apply(
        dim,
        spark.createDataFrame([(1, "S", 100)], "id long, seg string, cents long"),
        ["id"], ["seg", "cents"], effective_version=2,
    )
    assert out2.count() == 2


def test_scd2_exact_duplicate_updates_collapse(spark):
    """ADVICE r4: duplicate update keys fanned through the full-outer
    join and emitted multiple is_current rows. Exact duplicates must
    collapse to ONE new version (idempotent), like merge_plan."""
    snap = spark.createDataFrame([(1, "A", 10)], "id long, seg string, cents long")
    dim = scd2_init(snap, ["id"], ["seg", "cents"])
    ups = spark.createDataFrame(
        [(1, "B", 20), (1, "B", 20), (1, "B", 20)],
        "id long, seg string, cents long",
    )
    out = scd2_apply(dim, ups, ["id"], ["seg", "cents"], effective_version=2)
    assert out.count() == 2  # closed old + one open new
    assert out.filter("is_current").count() == 1


def test_scd2_conflicting_duplicate_updates_raise(spark):
    snap = spark.createDataFrame([(1, "A", 10)], "id long, seg string, cents long")
    dim = scd2_init(snap, ["id"], ["seg", "cents"])
    ups = spark.createDataFrame(
        [(1, "B", 20), (1, "C", 30)], "id long, seg string, cents long"
    )
    out = scd2_apply(dim, ups, ["id"], ["seg", "cents"], effective_version=2)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "conflicting duplicate" in str(ei.value)
