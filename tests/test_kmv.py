"""KMV bottom-k distinct sketch: exactness below k, estimator accuracy
above k, merge algebra, and the Spark two-phase pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.kmv import (
    _hash_u64,
    kmv_estimate,
    kmv_sketches,
    merge_hashes,
)


def _sketch_of(values, k):
    return merge_hashes([np.unique(_hash_u64(values))], k)


def test_exact_below_k():
    vals = [f"key{i}" for i in range(300)] * 7  # duplicates collapse
    sk = _sketch_of(vals, k=1024)
    assert kmv_estimate(sk, 1024) == 300


def test_estimator_within_relative_error_above_k():
    k = 512
    n = 200_000
    vals = np.arange(n).astype(str)
    sk = _sketch_of(vals, k)
    assert len(sk) == k  # saturated
    est = kmv_estimate(sk, k)
    # ~1/sqrt(k) = 4.4% expected; allow 4 sigma
    assert abs(est - n) / n < 4 / np.sqrt(k), est


def test_merge_is_union_and_order_free():
    k = 256
    a = [f"a{i}" for i in range(400)]
    b = [f"b{i}" for i in range(400)]
    both = _sketch_of(a + b, k)
    merged_ab = merge_hashes([_sketch_of(a, k), _sketch_of(b, k)], k)
    merged_ba = merge_hashes([_sketch_of(b, k), _sketch_of(a, k)], k)
    assert np.array_equal(both, merged_ab)
    assert np.array_equal(merged_ab, merged_ba)
    # overlapping sets: union semantics, not addition
    overl = merge_hashes([_sketch_of(a, k), _sketch_of(a, k)], k)
    assert np.array_equal(overl, _sketch_of(a, k))


def test_spark_pipeline_matches_exact_distinct(spark):
    rows = [(i % 5, f"u{i % 137}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, u string").repartition(8)
    got = {
        r["grp"]: kmv_estimate(np.frombuffer(r["hashes"], np.uint64), 256)
        for r in kmv_sketches(df, "u", "g", k=256).collect()
    }
    want = {
        str(r["g"]): r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("d")).collect()
    }
    assert got == want  # per-group NDV <= 137 < k: sketch is exact


def test_spark_pipeline_saturated_group(spark):
    # one group with NDV >> k: estimator kicks in, stays within bounds
    df = spark.createDataFrame(
        [(1, f"user{i}") for i in range(30_000)], "g int, u string"
    ).repartition(16)
    [row] = kmv_sketches(df, "u", "g", k=256).collect()
    est = kmv_estimate(np.frombuffer(row["hashes"], np.uint64), 256)
    assert abs(est - 30_000) / 30_000 < 4 / np.sqrt(256)


def test_estimate_empty_and_tiny():
    assert kmv_estimate(np.empty(0, np.uint64), 16) == 0
    assert kmv_estimate(_sketch_of(["x"], 16), 16) == 1
