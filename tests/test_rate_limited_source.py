"""read_appends_bounded: the maxFilesPerTrigger streaming-source path —
commit-granular walk, intra-commit offsets, rewrite refusal, cursor
interchange with read_appends."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _df(spark, lo, hi, b):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(b).alias("b"),
        (F.col("id") * 3).alias("v"),
    )


def _mk(spark, tmp_path, files_per_commit=4, commits=3):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), partition_cols=("b",), stat_cols=()
    )
    for i in range(commits):
        t.commit_overwrite_partitions(
            _df(spark, i * 100, i * 100 + 40, str(i)).repartition(
                files_per_commit
            )
        )
    return t


def test_bounded_walk_drains_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path)
    seen = []
    cursor = None
    batches = 0
    while True:
        df, cursor = t.read_appends_bounded(cursor, max_files=3)
        if df is None:
            break
        batches += 1
        assert (
            df.select(F.col("_metadata.file_path")).distinct().count() <= 3
        )
        seen.extend(r["k"] for r in df.select("k").collect())
    assert batches == 4  # 12 files / 3
    assert sorted(seen) == sorted(
        r["k"] for r in t.read().select("k").collect()
    )
    assert cursor == t.latest_version()
    # caught-up cursor stays put
    df, cursor2 = t.read_appends_bounded(cursor, max_files=3)
    assert df is None and cursor2 == cursor


def test_mid_commit_cursor_roundtrips(spark, tmp_path):
    t = _mk(spark, tmp_path, files_per_commit=5, commits=1)
    df1, c1 = t.read_appends_bounded(None, max_files=2)
    assert isinstance(c1, dict) and c1 == {"version": 0, "offset": 2}
    df2, c2 = t.read_appends_bounded(c1, max_files=2)
    df3, c3 = t.read_appends_bounded(c2, max_files=2)
    assert c3 == 1  # fully consumed -> int cursor, read_appends-compatible
    ks = set()
    for d in (df1, df2, df3):
        ks |= {r["k"] for r in d.select("k").collect()}
    assert ks == {r["k"] for r in t.read().select("k").collect()}
    # the int cursor feeds straight into the unbounded source
    df, _ = t.read_appends(c3)
    assert df is None


def test_rewrite_step_refuses_then_include_delivers(spark, tmp_path):
    t = _mk(spark, tmp_path, files_per_commit=2, commits=1)
    df, cursor = t.read_appends_bounded(None, max_files=10)
    assert cursor == 1
    t.delete_where(F.col("k") % 2 == 0)
    with pytest.raises(RuntimeError, match="non-append"):
        t.read_appends_bounded(cursor, max_files=10)
    inc, c2 = t.read_appends_bounded(cursor, max_files=10, on_rewrite="include")
    assert inc is not None and c2 == t.latest_version()


def test_bad_cursor_and_budget_raise(spark, tmp_path):
    t = _mk(spark, tmp_path, files_per_commit=1, commits=1)
    with pytest.raises(ValueError, match="max_files"):
        t.read_appends_bounded(None, max_files=0)
    with pytest.raises(ValueError, match="inverted"):
        t.read_appends_bounded(99, max_files=1)


def test_bounded_cursor_refuses_vacuumed_gap(spark, tmp_path):
    t = _mk(spark, tmp_path, files_per_commit=1, commits=3)
    t.vacuum(older_than_sec=0.0)  # reaps all but the latest manifest
    with pytest.raises(FileNotFoundError, match="bounded cursors"):
        t.read_appends_bounded(None, max_files=2)
