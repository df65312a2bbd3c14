"""Scale operators: salted join equivalence, bucketed co-located joins."""

import contextlib
import io

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from station_data_ingestion_spark.operators.skew import salted_join


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a tail
    big = spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k3", 3.0)], "k string, w double"
    )
    plain = big.join(small, on=["k"]).select("rid", "k", "v", "w")
    salted = salted_join(
        big, small, on=["k"], n_salt=8, big_unique_cols=["rid"]
    ).select("rid", "k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "rid long, k string"
    )
    small = spark.createDataFrame([("a", 10), ("b", 20)], "k string, w long")
    out = {
        r["rid"]: r["w"]
        for r in salted_join(
            big, small, on=["k"], n_salt=4, big_unique_cols=["rid"], how="left"
        ).collect()
    }
    assert out == {1: 10, 2: 20, 3: None}


def test_salted_join_deterministic_salt(spark):
    """Same inputs -> same salts (no rand()): re-computation is stable."""
    big = spark.range(0, 100).select(F.col("id").alias("rid"), F.lit("x").alias("k"))
    small = spark.createDataFrame([("x", 1)], "k string, w long")
    a = salted_join(big, small, on=["k"], n_salt=16, big_unique_cols=["rid"])
    assert a.count() == 100 and a.count() == 100


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        4,
    )
    # force the shuffle-join path so the test proves bucketing (a broadcast
    # would hide the missing exchange)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        p = _plan(j)
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # and it still computes the right thing
        expected = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
