"""Size-targeted parquet export tests (operators/export.py)."""

import glob

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.export import (
    estimate_row_bytes,
    write_sized_parquet,
)


def _wide(spark, n):
    return spark.range(n).select(
        "id", F.repeat(F.lit("x"), 1000).alias("pad")
    )


def test_small_frame_writes_one_file(spark, tmp_path):
    df = spark.range(100).repartition(8)  # 8 tasks would mean 8 tiny files
    out = str(tmp_path / "small")
    n_files = write_sized_parquet(df, out, target_mb=64)
    assert n_files == 1
    assert len(glob.glob(f"{out}/part-*.parquet")) == 1
    assert spark.read.parquet(out).count() == 100


def test_large_frame_splits_to_target(spark, tmp_path):
    # ~1KB/row x 20k rows ~ 20MB of Arrow bytes -> 5 files at 4MB target
    df = _wide(spark, 20_000)
    out = str(tmp_path / "sized")
    n_files = write_sized_parquet(df, out, target_mb=4)
    assert 4 <= n_files <= 7, n_files
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n_files
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20_000))


def test_estimate_row_bytes_scales_with_width(spark):
    narrow = estimate_row_bytes(spark.range(500).select("id"))
    wide = estimate_row_bytes(_wide(spark, 500))
    assert wide > narrow * 10


def test_empty_frame(spark, tmp_path):
    df = spark.range(0)
    out = str(tmp_path / "empty")
    assert write_sized_parquet(df, out, target_mb=64) == 1
    assert spark.read.parquet(out).count() == 0


def test_rejects_bad_target(spark, tmp_path):
    with pytest.raises(ValueError):
        write_sized_parquet(spark.range(1), str(tmp_path / "x"), target_mb=0)


def test_estimate_row_bytes_unbiased_on_size_ordered_data(spark):
    """Data clustered by payload width (tiny rows first) must not fool
    the estimator: with total_rows known it samples across the table."""
    df = (
        spark.range(20_000)
        .select(
            "id",
            F.expr(
                "repeat('x', CASE WHEN id < 19000 THEN 1 ELSE 2000 END)"
            ).alias("payload"),
        )
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    head_est = estimate_row_bytes(df, sample_rows=1024)  # sees tiny rows only
    rand_est = estimate_row_bytes(df, sample_rows=1024, total_rows=20_000)
    # true mean ~ (19000*1 + 1000*2000)/20000 ~ 101 bytes of payload
    assert rand_est > head_est * 3, (head_est, rand_est)
