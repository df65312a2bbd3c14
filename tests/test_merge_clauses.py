"""merge_when_clauses: ordered first-wins dispatch, unconditional-last
rule, duplicate-source guard, delete/update/no-clause passthrough."""

import pytest
from pyspark.sql import Row, functions as F

from station_data_ingestion_spark.operators.merge import (
    RecordKeyError,
    merge_when_clauses,
)


def _t(spark):
    return spark.createDataFrame(
        [Row(k=1, v=10, s="keep"), Row(k=2, v=20, s="keep"),
         Row(k=3, v=30, s="keep"), Row(k=4, v=40, s="keep")],
        "k int, v int, s string",
    )


def _s(spark):
    # k=1: beats clause1 AND clause2 -> clause1 wins (order!)
    # k=2: only clause2 (delete); k=3: matches neither -> passthrough
    # k=9: unmatched -> insert
    return spark.createDataFrame(
        [Row(k=1, v=100, s="x", kind="del"), Row(k=2, v=5, s="x", kind="del"),
         Row(k=3, v=5, s="x", kind="other"), Row(k=9, v=99, s="new", kind="ins")],
        "k int, v int, s string, kind string",
    )


def CLAUSES():
    # built lazily: Column exprs need an active SparkContext
    return [
        (F.col("src_v") > F.col("v"),
         {"v": F.col("src_v"), "s": F.lit("upd")}),
        (F.col("src_kind") == "del", "delete"),
    ]


def test_first_wins_order_and_passthrough(spark):
    out = {
        r["k"]: (r["v"], r["s"])
        for r in merge_when_clauses(_t(spark), _s(spark), ["k"], CLAUSES()).collect()
    }
    assert out[1] == (100, "upd")      # clause 1 claimed it before delete
    assert 2 not in out                # clause 2 deleted
    assert out[3] == (30, "keep")      # matched, no clause -> unchanged
    assert out[4] == (40, "keep")      # unmatched target -> unchanged
    assert out[9] == (99, "new")       # unmatched source -> insert


def test_insert_unmatched_false(spark):
    out = merge_when_clauses(
        _t(spark), _s(spark), ["k"], CLAUSES(), insert_unmatched=False
    )
    assert 9 not in {r["k"] for r in out.collect()}


def test_unconditional_only_last(spark):
    with pytest.raises(ValueError, match="unconditional"):
        merge_when_clauses(
            _t(spark), _s(spark), ["k"],
            [(None, "delete"), (F.col("src_v") > 0, "delete")],
        )


def test_duplicate_source_key_raises(spark):
    dup = _s(spark).unionAll(_s(spark).limit(1))
    with pytest.raises(RecordKeyError):
        merge_when_clauses(_t(spark), dup, ["k"], CLAUSES())


def test_null_condition_is_no_match(spark):
    t = spark.createDataFrame([Row(k=1, v=None, s="keep")], "k int, v int, s string")
    s = spark.createDataFrame([Row(k=1, v=5, s="x", kind="other")],
                              "k int, v int, s string, kind string")
    out = merge_when_clauses(t, s, ["k"], CLAUSES()).collect()
    # src_v > NULL is NULL -> clause doesn't fire; row passes through
    assert [(r["k"], r["v"], r["s"]) for r in out] == [(1, None, "keep")]
