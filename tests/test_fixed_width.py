"""Fixed-width source: padding/NULL/strict-cast semantics and overflow
guard on the writer twin."""

import pytest
from pyspark.sql import Row

from station_data_ingestion_spark.sources.fixed_width import (
    format_fixed_width,
    scan_fixed_width,
)

SPECS = [("id", 1, 5, "bigint"), ("name", 6, 8, "string"), ("v", 14, 6, "bigint")]


def test_roundtrip_nulls_and_padding(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(id=1, name="alpha", v=42), Row(id=2, name=None, v=None)],
        "id long, name string, v long",
    )
    p = str(tmp_path / "fw")
    format_fixed_width(df, SPECS).write.text(p)
    back = {r["id"]: (r["name"], r["v"]) for r in scan_fixed_width(spark, p, SPECS).collect()}
    assert back == {1: ("alpha", 42), 2: (None, None)}


def test_strict_cast_raises_on_garbage(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame([Row(value="1    junk    oops  ")], "value string").write.text(p)
    with pytest.raises(Exception, match="non-bigint"):
        scan_fixed_width(spark, p, SPECS).collect()
    # lax mode nulls instead
    got = scan_fixed_width(spark, p, SPECS, strict=False).collect()[0]
    assert got["id"] == 1 and got["v"] is None


def test_writer_overflow_raises(spark):
    df = spark.createDataFrame([Row(id=123456, name="x", v=1)], "id long, name string, v long")
    with pytest.raises(Exception, match="overflows"):
        format_fixed_width(df, SPECS).collect()
