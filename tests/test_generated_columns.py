"""Generated columns: computed on write when omitted, validated when
supplied, declared via metadata-only commits."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), partition_cols=("p",), stat_cols=()
    )
    t.commit_overwrite_partitions(
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.lit("a").alias("p"),
            (F.col("id") * 3).alias("v"),
        )
    )
    return t


def test_computed_when_omitted_null_for_pre_declare_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_generated_column("v2", "v * 2")
    t.commit_overwrite_partitions(
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.lit("b").alias("p"),
            (F.col("id") * 3).alias("v"),
        )
    )
    got = {r["k"]: r["v2"] for r in t.read().collect()}
    assert got[12] == 72  # computed: v=36, v2=72
    assert got[3] is None  # pre-declaration file: NULL


def test_supplied_values_validated(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_generated_column("v2", "v * 2")
    t.commit_overwrite_partitions(
        spark.range(20, 25).select(
            F.col("id").alias("k"),
            F.lit("c").alias("p"),
            (F.col("id") * 3).alias("v"),
            (F.col("id") * 6).alias("v2"),  # correct: v*2 == id*6
        )
    )
    assert t.read().filter(F.col("p") == "c").count() == 5
    v_before = t.latest_version()
    with pytest.raises(Exception, match="generated column 'v2' violated"):
        t.commit_overwrite_partitions(
            spark.range(30, 35).select(
                F.col("id").alias("k"),
                F.lit("d").alias("p"),
                (F.col("id") * 3).alias("v"),
                F.lit(999).cast("bigint").alias("v2"),  # wrong
            )
        )
    assert t.latest_version() == v_before  # aborted pre-publish


def test_declaration_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        t.add_generated_column("v", "k + 1")
    with pytest.raises(Exception):  # typo'd expr fails at declare time
        t.add_generated_column("bad", "nonexistent_col * 2")
    with pytest.raises(ValueError, match="partition_transforms"):
        t.add_generated_column("p", "k")


def test_spec_survives_unrelated_ddl_and_reopen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_generated_column("v2", "v * 2")
    t.add_column("tag", "string", default="x")
    t.rename_column("v", "val")  # NOTE: breaks the expr's source name
    fresh = SnapshotTable(
        spark, t.path, partition_cols=("p",), stat_cols=()
    )
    assert fresh.generated_columns() == {"v2": "v * 2"}
    # the next write fails LOUDLY (expr references the renamed column)
    with pytest.raises(Exception):
        fresh.commit_overwrite_partitions(
            spark.range(40, 42).select(
                F.col("id").alias("k"),
                F.lit("e").alias("p"),
                (F.col("id") * 3).alias("val"),
                F.lit("y").alias("tag"),
            )
        )
