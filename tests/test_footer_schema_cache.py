"""Footer-schema cache for merged reads (VERDICT r10 #2): an evolved
table's read must not re-open every live footer per read. The explicit
.schema(...) fast path must return exactly what mergeSchema returns,
fall back on uncertifiable arrow types, and open each footer at most
once per process across repeated reads."""

import os

import pytest
from pyspark.sql import functions as F

import station_data_ingestion_spark.plans.snapshot_store as ss
from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk_evolved(spark, tmp_path, name="t"):
    """Table with real schema evolution: files written both before and
    after an ADD COLUMN (no default), so the two file generations have
    different physical schemas and the read needs schema merging."""
    t = SnapshotTable(spark, str(tmp_path / name), partition_cols=("p",))
    t.commit_overwrite_partitions(
        spark.range(0, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            (F.col("id") * 10).alias("v"),
        )
    )
    t.commit_overwrite_partitions(
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") * 10).alias("v"),
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("tag"),
        )
    )
    return t


def _rows(df):
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    )


def test_explicit_schema_read_equals_mergeschema_read(spark, tmp_path):
    t = _mk_evolved(spark, tmp_path)
    fast = t.read()
    os.environ["SPARK_GRAFT_FOOTER_SCHEMA"] = "0"
    try:
        slow = t.read()
    finally:
        os.environ.pop("SPARK_GRAFT_FOOTER_SCHEMA", None)
    assert fast.columns == slow.columns
    assert dict(fast.dtypes) == dict(slow.dtypes)
    assert _rows(fast) == _rows(slow)
    # evolved column null-fills on pre-add files under both paths
    assert fast.filter(F.col("tag").isNull()).count() == 20


def test_each_footer_opened_once_across_repeated_reads(
    spark, tmp_path, monkeypatch
):
    t = _mk_evolved(spark, tmp_path, "t_once")
    opens = []
    orig = ss._read_footer_schema
    monkeypatch.setattr(
        ss,
        "_read_footer_schema",
        lambda p: opens.append(p) or orig(p),
    )
    t.read().count()
    first = len(opens)
    n_files = len(t._read_manifest(t.latest_version())["files"])
    assert first == n_files  # cold read: one open per live file
    for _ in range(3):
        t.read().count()
    assert len(opens) == first, "warm reads must not re-open footers"


def test_uncertifiable_type_falls_back_to_mergeschema(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t_ts"), partition_cols=())
    t.commit_overwrite_partitions(
        spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        )
    )
    paths = [
        f"{t.path}/data/{e['path']}"
        for e in t._read_manifest(t.latest_version())["files"]
    ]
    assert ss._merged_footer_schema(spark, paths) is None
    got = t.read()
    assert dict(got.dtypes)["ts"].startswith("timestamp")
    assert got.count() == 5


def test_merged_schema_handles_arrays_and_order(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t_arr"), partition_cols=())
    t.commit_overwrite_partitions(
        spark.range(0, 4).select(
            F.col("id").alias("k"),
            F.array(F.col("id").cast("double")).alias("emb"),
        )
    )
    paths = [
        f"{t.path}/data/{e['path']}"
        for e in t._read_manifest(t.latest_version())["files"]
    ]
    merged = ss._merged_footer_schema(spark, paths)
    assert merged is not None
    assert [f.name for f in merged.fields] == ["k", "emb"]
    assert merged["emb"].dataType.simpleString() == "array<double>"


def test_kill_switch(spark, tmp_path):
    t = _mk_evolved(spark, tmp_path, "t_kill")
    paths = [
        f"{t.path}/data/{e['path']}"
        for e in t._read_manifest(t.latest_version())["files"]
    ]
    os.environ["SPARK_GRAFT_FOOTER_SCHEMA"] = "0"
    try:
        assert ss._merged_footer_schema(spark, paths) is None
    finally:
        os.environ.pop("SPARK_GRAFT_FOOTER_SCHEMA", None)
    assert ss._merged_footer_schema(spark, paths) is not None
