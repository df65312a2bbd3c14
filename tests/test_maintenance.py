"""Small-file compaction: fewer files, identical data, untouched slices."""

import glob

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.maintenance import compact_slice


def _files(table, datatype, period):
    return sorted(
        glob.glob(f"{table}/datatype={datatype}/period={period}/*.parquet")
    )


def test_compact_slice(spark, tmp_path):
    table = str(tmp_path / "obs")
    obs = spark.range(0, 2000).select(
        F.concat(F.lit("s"), (F.col("id") % 50)).alias("station_id"),
        F.date_format(
            F.date_add(F.lit("2022-01-01").cast("date"), (F.col("id") % 365).cast("int")),
            "yyyy-MM-dd",
        ).alias("date"),
        (F.col("id") * 0.5).alias("value"),
        F.when(F.col("id") % 2 == 0, "temperature").otherwise("rainfall").alias("datatype"),
        F.lit("day").alias("period"),
    )
    # 16 small files per slice
    obs.repartition(16).write.partitionBy("datatype", "period").parquet(table)
    before_t = _files(table, "temperature", "day")
    before_r = _files(table, "rainfall", "day")
    assert len(before_t) == 16 and len(before_r) == 16
    expected = sorted(
        map(tuple, spark.read.parquet(table).filter(F.col("datatype") == "temperature").collect())
    )

    n = compact_slice(
        spark,
        table,
        {"datatype": "temperature", "period": "day"},
        target_file_bytes=64 * 1024 * 1024,
    )
    assert n == 1
    after_t = _files(table, "temperature", "day")
    assert len(after_t) == 1
    # untouched slice keeps its exact files
    assert _files(table, "rainfall", "day") == before_r
    got = sorted(
        map(tuple, spark.read.parquet(table).filter(F.col("datatype") == "temperature").collect())
    )
    assert got == expected


def test_compact_sizes_from_slice_not_table(spark, tmp_path):
    """Regression: sizing must use the slice's own bytes. With
    target_file_bytes == the slice's exact size, exactly ONE file must
    come out -- sizing from whole-table bytes (the DataFrame.inputFiles
    trap) would request 2+."""
    from station_data_ingestion_spark.operators.maintenance import (
        partition_dir_bytes,
    )

    table = str(tmp_path / "obs2")
    obs = spark.range(0, 4000).select(
        F.concat(F.lit("s"), (F.col("id") % 50)).alias("station_id"),
        (F.col("id") * 0.5).alias("value"),
        F.when(F.col("id") % 2 == 0, "temperature").otherwise("rainfall").alias("datatype"),
        F.lit("day").alias("period"),
    )
    obs.repartition(8).write.partitionBy("datatype", "period").parquet(table)
    slice_dir = f"{table}/datatype=temperature/period=day"
    b = partition_dir_bytes(spark, slice_dir)
    assert 0 < b < partition_dir_bytes(spark, table)
    n = compact_slice(
        spark,
        table,
        {"datatype": "temperature", "period": "day"},
        target_file_bytes=b,
    )
    assert n == 1
    assert len(_files(table, "temperature", "day")) == 1


def test_compact_table_all_slices(spark, tmp_path):
    from station_data_ingestion_spark.operators.maintenance import (
        compact_table,
        list_partition_values,
    )

    table = str(tmp_path / "obs3")
    obs = spark.range(0, 2000).select(
        F.concat(F.lit("s"), (F.col("id") % 50)).alias("station_id"),
        (F.col("id") * 0.5).alias("value"),
        F.when(F.col("id") % 2 == 0, "temperature").otherwise("rainfall").alias("datatype"),
        F.lit("day").alias("period"),
    )
    obs.repartition(8).write.partitionBy("datatype", "period").parquet(table)
    expected = sorted(map(tuple, spark.read.parquet(table).collect()))
    vals = list_partition_values(spark, table)
    assert sorted(v["datatype"] for v in vals) == ["rainfall", "temperature"]
    out = compact_table(spark, table)
    assert out == {("rainfall", "day"): 1, ("temperature", "day"): 1}
    assert len(_files(table, "temperature", "day")) == 1
    assert len(_files(table, "rainfall", "day")) == 1
    assert sorted(map(tuple, spark.read.parquet(table).collect())) == expected


def test_compact_handles_escaped_partition_values(spark, tmp_path):
    """Hive-escaped partition values (datatype 'temp:avg' -> dir
    'datatype=temp%3Aavg') round-trip through listing and compaction."""
    from station_data_ingestion_spark.operators.maintenance import (
        compact_table,
        list_partition_values,
    )

    table = str(tmp_path / "obs4")
    obs = spark.range(0, 400).select(
        F.concat(F.lit("s"), F.col("id")).alias("station_id"),
        (F.col("id") * 0.5).alias("value"),
        F.lit("temp:avg").alias("datatype"),
        F.lit("day").alias("period"),
    )
    obs.repartition(6).write.partitionBy("datatype", "period").parquet(table)
    vals = list_partition_values(spark, table)
    assert vals == [{"datatype": "temp:avg", "period": "day"}]
    out = compact_table(spark, table)
    assert out == {("temp:avg", "day"): 1}
    back = spark.read.parquet(table)
    assert back.count() == 400
    assert back.select("datatype").distinct().collect()[0][0] == "temp:avg"
