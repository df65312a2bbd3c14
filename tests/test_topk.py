"""Two-phase grouped top-k (operators/topk.py)."""

import pytest
from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.operators.topk import grouped_topk


def _direct(df, k):
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("k").asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def test_equals_full_window_on_skewed_groups(spark):
    import random

    rng = random.Random(7)
    rows = [(i, f"g{rng.randint(0, 4) if i % 3 else 0}", rng.randint(0, 999))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, g string, v long").repartition(16)
    got = {
        (r["g"], r["k"], r["v"], r["rk"])
        for r in grouped_topk(
            df, ["g"], [("v", True), ("k", False)], k=7
        ).collect()
    }
    exp = {
        (r["g"], r["k"], r["v"], r["rk"]) for r in _direct(df, 7).collect()
    }
    assert got == exp


def test_phase1_bounds_shuffled_rows(spark):
    """The whole point of the operator: rows reaching the exchange are
    bounded by partitions x groups x k, not the input size."""
    import pandas as pd

    rows = [(i, f"g{i % 3}", i) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, g string, v long").repartition(8)

    # phase 1 in isolation: replicate the operator's partial pass and
    # COUNT its output -- the exchange input
    sort_by, ascending = ["v", "k"], [False, True]

    def partial(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            both = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                both.sort_values(sort_by, ascending=ascending, kind="stable")
                .groupby(["g"], sort=False, dropna=False)
                .head(2)
            )
        if acc is not None:
            yield acc

    survivors = df.mapInPandas(partial, df.schema).count()
    assert survivors <= 8 * 3 * 2, survivors
    assert survivors < 3000, "phase 1 must prune, not pass through"

    out = grouped_topk(df, ["g"], [("v", True), ("k", False)], k=2)
    per_group = {}
    for r in out.collect():
        per_group.setdefault(r["g"], []).append(r["rk"])
    assert set(per_group) == {"g0", "g1", "g2"}
    for g, rks in per_group.items():
        assert sorted(rks) == [1, 2]


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "a", 1)], "k long, g string, v long")
    with pytest.raises(ValueError, match="k must be"):
        grouped_topk(df, ["g"], [("v", True)], k=0)
