"""KLL sketch + sketch-guided exact quantiles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.kll import (
    KLLSketch,
    kll_build,
    kll_exact_quantiles,
)


def _want(values, phi):
    s = sorted(values)
    return s[math.ceil(phi * len(s)) - 1]


def test_sketch_rank_error_is_bounded():
    rng = np.random.default_rng(3)
    data = rng.normal(size=50_000)
    sk = KLLSketch(k=200)
    sk.update_many(data)
    s = np.sort(data)
    for phi in (0.1, 0.5, 0.9):
        est = sk.quantile(phi)
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - phi) < 0.05, (phi, rank)
    assert sk.size() < 10 * 200  # compaction keeps it sketch-sized


def test_merge_equals_single_stream():
    rng = np.random.default_rng(4)
    a, b = rng.uniform(size=20_000), rng.exponential(size=20_000)
    parts = KLLSketch(k=128)
    for chunk in (a, b):
        p = KLLSketch(k=128)
        p.update_many(chunk)
        parts.merge(p)
    whole = np.concatenate([a, b])
    s = np.sort(whole)
    for phi in (0.25, 0.75):
        rank = np.searchsorted(s, parts.quantile(phi)) / len(s)
        assert abs(rank - phi) < 0.06


@pytest.mark.parametrize("delta", [0.05, 0.0])  # 0.0 forces the fallback path
def test_exact_quantiles_match_numpy(spark, delta):
    rng = np.random.default_rng(5)
    # duplicates + skew: half the rows share 10 values
    vals = np.concatenate(
        [rng.normal(100, 30, 5000), np.repeat(rng.uniform(0, 200, 10), 500)]
    )
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).repartition(16)
    got = dict(kll_exact_quantiles(df, "x", [0.1, 0.5, 0.9, 1.0], delta=delta))
    for phi in (0.1, 0.5, 0.9, 1.0):
        assert got[phi] == _want(vals, phi), phi


def test_exact_quantiles_with_nulls_and_small_collect(spark):
    df = spark.createDataFrame(
        [(float(i % 97),) for i in range(3000)] + [(None,)] * 50, "x double"
    )
    got = dict(
        kll_exact_quantiles(df, "x", [0.5], collect_limit=10)  # force refinement
    )
    vals = [float(i % 97) for i in range(3000)]
    assert got[0.5] == _want(vals, 0.5)


def test_validation(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="phi"):
        kll_exact_quantiles(df, "x", [1.5])
    with pytest.raises(ValueError, match="no non-null"):
        kll_exact_quantiles(df.filter("x > 99"), "x", [0.5])
    with pytest.raises(ValueError, match="k must"):
        KLLSketch(k=2)
    with pytest.raises(ValueError, match="empty"):
        KLLSketch().quantile(0.5)
    assert kll_build(df, "x").quantile(0.5) in {0.0, 1.0, 2.0, 3.0, 4.0}
