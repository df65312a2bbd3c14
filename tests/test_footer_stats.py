"""Footer-stats fast path: manifest zone-map stats read from parquet
footers must be bit-identical to the exact Spark-scan stats, and every
uncertifiable case (float NaN risk, partition-dir stat cols, dropped
long-binary stats, INT96 timestamps) must fall back to the scan."""

import os

import pytest

from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import (
    SnapshotTable,
    _footer_one_file,
    _footer_stats_distributed,
)


@pytest.fixture()
def staged(spark, tmp_path):
    """A hive-partitioned staging dir + a probe table for _file_stats."""
    df = spark.range(0, 4000, 1, 4).select(
        (F.col("id") % 3).cast("string").alias("part"),
        F.col("id").alias("k"),
        F.col("id").cast("int").alias("ki"),
        F.concat(
            F.lit("v"), F.lpad(F.col("id").cast("string"), 6, "0")
        ).alias("s"),
        F.date_add(
            F.to_date(F.lit("1996-01-01")), (F.col("id") % 400).cast("int")
        ).alias("d"),
        (F.col("id") * 1.5).alias("f"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("sparse"),
        F.lit(None).cast("string").alias("all_null"),
    )
    staging = str(tmp_path / "staging")
    df.write.partitionBy("part").parquet(staging)
    t = SnapshotTable(
        spark, str(tmp_path / "probe"), partition_cols=("part",),
        stat_cols=("k",),
    )
    return t, staging


def _scan_stats(t, staging, cols):
    os.environ["SPARK_GRAFT_FOOTER_STATS"] = "0"
    try:
        return t._file_stats(staging, cols)
    finally:
        os.environ.pop("SPARK_GRAFT_FOOTER_STATS", None)


def test_footer_matches_exact_scan(staged):
    t, staging = staged
    cols = ["k", "ki", "s", "d", "sparse", "all_null"]
    scan = _scan_stats(t, staging, cols)
    footer = t._footer_stats(staging, sorted(scan), cols)
    assert footer is not None
    assert footer == scan


def test_float_column_falls_back(staged):
    t, staging = staged
    scan = _scan_stats(t, staging, ["k", "f"])
    assert t._footer_stats(staging, sorted(scan), ["k", "f"]) is None


def test_partition_dir_stat_col_falls_back(staged):
    t, staging = staged
    scan = _scan_stats(t, staging, ["part"])
    assert t._footer_stats(staging, sorted(scan), ["part"]) is None


def test_kill_switch_disables_fast_path(staged):
    t, staging = staged
    os.environ["SPARK_GRAFT_FOOTER_STATS"] = "0"
    try:
        assert t._footer_stats(staging, ["x"], ["k"]) is None
    finally:
        os.environ.pop("SPARK_GRAFT_FOOTER_STATS", None)


def test_long_binary_stats_fall_back(spark, tmp_path):
    # parquet-mr drops min/max for >4 KB binary values; the footer path
    # must refuse rather than prune on missing bounds
    staging = str(tmp_path / "big")
    spark.createDataFrame(
        [("a" * 5000,), ("b" * 5000,)], "big string"
    ).coalesce(1).write.parquet(staging)
    t = SnapshotTable(
        spark, str(tmp_path / "probe"), partition_cols=(), stat_cols=("big",)
    )
    scan = _scan_stats(t, staging, ["big"])
    assert t._footer_stats(staging, sorted(scan), ["big"]) is None
    # and the public path (_file_stats with the fast path enabled)
    # transparently serves the scan result instead
    assert t._file_stats(staging, ["big"]) == scan


def test_timestamp_int96_falls_back(spark, tmp_path):
    staging = str(tmp_path / "ts")
    spark.sql(
        "SELECT TIMESTAMP'1996-03-01 12:00:00' AS ts"
    ).coalesce(1).write.parquet(staging)
    t = SnapshotTable(
        spark, str(tmp_path / "probe"), partition_cols=(), stat_cols=("ts",)
    )
    if spark.conf.get("spark.sql.parquet.outputTimestampType") != "INT96":
        pytest.skip("writer not in INT96 mode")
    scan = _scan_stats(t, staging, ["ts"])
    assert t._footer_stats(staging, sorted(scan), ["ts"]) is None


def test_distributed_footer_read_matches_driver_loop(staged, spark):
    t, staging = staged
    cols = ["k", "s"]
    scan = _scan_stats(t, staging, cols)
    rels = sorted(scan)
    abs_paths = [f"{staging}/{r}" for r in rels]
    dist = _footer_stats_distributed(spark, abs_paths, cols)
    loop = [_footer_one_file(p, cols) for p in abs_paths]
    # json round-trip stringifies dates; these cols are str/int so the
    # two transports must agree exactly
    assert dist == loop


def test_count_written_matches_scan(staged, spark):
    t, staging = staged
    assert t._count_written(staging) == spark.read.parquet(staging).count()
    assert t._count_written(staging + "_missing") == 0


def test_commit_prunes_identically_under_both_paths(spark, tmp_path):
    """End to end: a ranged read against footer-stat manifests keeps
    exactly the rows the scan-stat manifests keep."""
    df = spark.range(0, 2000, 1, 1).select(
        F.lit("x").alias("part"),
        F.date_format(
            F.date_add(
                F.to_date(F.lit("1996-01-01")),
                (F.col("id") % 365).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("odate"),
        F.col("id").alias("k"),
    )
    results = {}
    for mode in ("1", "0"):
        os.environ["SPARK_GRAFT_FOOTER_STATS"] = mode
        try:
            t = SnapshotTable(
                spark, str(tmp_path / f"t{mode}"),
                partition_cols=("part",), stat_cols=("odate",),
            )
            t.commit_overwrite_partitions(
                df, cluster_by=("odate",), cluster_partitions=4
            )
            got = t.read(ranges={"odate": ("1996-03-01", "1996-04-30")})
            assert got is not None
            kept = got.inputFiles()
            assert len(kept) < 4  # pruning actually happened
            results[mode] = sorted(
                (r["odate"], r["k"])
                for r in got.filter(
                    F.col("odate").between("1996-03-01", "1996-04-30")
                ).collect()
            )
        finally:
            os.environ.pop("SPARK_GRAFT_FOOTER_STATS", None)
    assert results["1"] == results["0"]


def test_zero_row_file_identical_under_both_paths(spark, tmp_path):
    """A staged ZERO-ROW parquet file (0 row groups) must produce the
    same manifest entry under footer and scan paths: {col: [None, None],
    "__rows": 0}. Before the r11 fix the scan path silently omitted the
    file (groupBy(input_file_name) yields no group row)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    staging = tmp_path / "staging0"
    staging.mkdir()
    schema = pa.schema([("k", pa.int64()), ("s", pa.string())])
    pq.write_table(
        pa.table({"k": [1, 2, 3], "s": ["a", "b", "c"]}, schema=schema),
        staging / "full.parquet",
    )
    pq.write_table(schema.empty_table(), staging / "empty.parquet")
    t = SnapshotTable(spark, str(tmp_path / "probe0"), stat_cols=("k",))
    cols = ["k", "s"]
    scan = _scan_stats(t, str(staging), cols)
    footer = t._footer_stats(str(staging), sorted(scan), cols)
    assert footer is not None
    assert footer == scan
    assert scan["empty.parquet"] == {"k": [None, None], "s": [None, None],
                                     "__rows": 0}
    assert scan["full.parquet"]["__rows"] == 3
