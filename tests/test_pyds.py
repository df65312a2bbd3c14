"""Spark 4 Python Data Source (sources/pyds.py): partition planning,
filter pushdown claims, null semantics, schema coercion."""

import json
import os

from pyspark.sql import functions as F

from station_data_ingestion_spark.sources.pyds import register_jsonl_source

DDL = "k bigint, cat string, v double"


def _stage(tmp_path, n_files=3):
    d = tmp_path / "src"
    d.mkdir()
    rows = [
        {"k": i, "cat": ["a", "b", None][i % 3], "v": i * 1.5}
        for i in range(30)
    ]
    for f_ in range(n_files):
        with open(d / f"part-{f_}.jsonl", "w") as fh:
            for r in rows[f_::n_files]:
                fh.write(json.dumps(r) + "\n")
    return str(d)


def test_one_partition_per_file_and_full_read(spark, tmp_path):
    src = _stage(tmp_path)
    register_jsonl_source(spark)
    df = spark.read.format("jsonl_pyds").schema(DDL).option("path", src).load()
    assert df.count() == 30
    assert df.select(F.spark_partition_id()).distinct().count() == 3
    got = {r["k"]: (r["cat"], r["v"]) for r in df.collect()}
    assert got[4] == ("b", 6.0)
    assert got[2] == (None, 3.0)


def test_pushed_filters_keep_sql_semantics(spark, tmp_path):
    src = _stage(tmp_path)
    register_jsonl_source(spark)
    df = spark.read.format("jsonl_pyds").schema(DDL).option("path", src).load()
    # EqualTo on a column with NULLs: NULL rows must NOT match
    assert df.filter(F.col("cat") == "a").count() == 10
    # range pushdown
    assert df.filter(F.col("k") >= 20).count() == 10
    # IS NOT NULL pushdown
    assert df.filter(F.col("cat").isNotNull()).count() == 20
    # a shape the reader declines (contains) still evaluates correctly
    # above the scan
    assert df.filter(F.col("cat").contains("a")).count() == 10
    # combined claimed + declined
    assert (
        df.filter((F.col("k") < 9) & F.col("cat").contains("b")).count()
        == 3
    )


def test_missing_keys_read_null_and_empty_dir_raises(spark, tmp_path):
    d = tmp_path / "src2"
    d.mkdir()
    with open(d / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"k": 1}) + "\n")
    register_jsonl_source(spark)
    df = (
        spark.read.format("jsonl_pyds")
        .schema(DDL)
        .option("path", str(d))
        .load()
    )
    row = df.collect()[0]
    assert row["k"] == 1 and row["cat"] is None and row["v"] is None
    empty = tmp_path / "src3"
    empty.mkdir()
    try:
        spark.read.format("jsonl_pyds").schema(DDL).option(
            "path", str(empty)
        ).load().count()
        raise AssertionError("expected failure on empty source dir")
    except Exception as e:
        assert "no JSONL files" in str(e)
