"""Row-level security policies on the snapshot store: carry, drop,
fail-closed reads, rename interplay, restore semantics."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O", i * 100, str(i % 2))
         for i in range(30)],
        "k long, status string, cents long, b string",
    )
    t = SnapshotTable(
        spark, str(tmp_path / "t"), partition_cols=("b",), stat_cols=()
    )
    t.commit_overwrite_partitions(df)
    return t


def test_governed_read_applies_and_composes(table):
    table.set_row_filter("no_f", "status <> 'F'")
    assert table.read_governed().count() == 20
    table.set_row_filter("rich", "cents >= 1500")
    got = {r["k"] for r in table.read_governed().collect()}
    assert got == {i for i in range(15, 30) if i % 3 != 0}


def test_policies_carry_across_commits(spark, table):
    table.set_row_filter("no_f", "status <> 'F'")
    more = spark.createDataFrame(
        [(100, "O", 1, "x"), (101, "F", 2, "x")],
        "k long, status string, cents long, b string",
    )
    table.commit_overwrite_partitions(more)  # new partition = append
    assert table.row_filters() == {"no_f": "status <> 'F'"}
    ks = {r["k"] for r in table.read_governed().collect()}
    assert 100 in ks and 101 not in ks


def test_invalid_policy_refused_and_drop_unknown(table):
    with pytest.raises(ValueError, match="does not analyze"):
        table.set_row_filter("bad", "nope > 1")
    with pytest.raises(ValueError, match="no row filter"):
        table.drop_row_filter("ghost")


def test_fail_closed_when_column_dropped(table):
    table.set_row_filter("rich", "cents >= 1500")
    table.drop_column("cents")
    with pytest.raises(RuntimeError, match="failing\\s+closed"):
        table.read_governed().count()


def test_rename_refuses_referenced_column(table):
    table.set_row_filter("rich", "cents >= 1500")
    with pytest.raises(RuntimeError, match="referenced by row filter"):
        table.rename_column("cents", "pennies")
    # unreferenced columns still rename fine
    table.rename_column("status", "st")
    assert "st" in table.read().columns


def test_policies_survive_restore_and_time_travel(spark, table):
    v1 = table.latest_version()
    table.set_row_filter("no_f", "status <> 'F'")
    table.commit_overwrite_partitions(
        spark.createDataFrame(
            [(200, "O", 5, "y")], "k long, status string, cents long, b string"
        )
    )
    table.restore(v1)
    # governance is CURRENT policy, not part of the data rollback
    assert table.row_filters() == {"no_f": "status <> 'F'"}
    assert table.read_governed(version=v1).filter(
        F.col("status") == "F"
    ).count() == 0


def test_drop_restores_visibility(table):
    table.set_row_filter("no_f", "status <> 'F'")
    assert table.read_governed().count() == 20
    table.drop_row_filter("no_f")
    assert table.read_governed().count() == 30
    assert table.row_filters() == {}


def test_masks_apply_after_filters(table):
    table.set_row_filter("no_f", "status <> 'F'")
    table.set_column_mask("status", "hash")
    df = table.read_governed()
    rows = df.select("status").distinct().collect()
    # masked values are sha256 hex, and the filtered-out class is gone
    assert all(len(r["status"]) == 64 for r in rows)
    assert df.count() == 20
