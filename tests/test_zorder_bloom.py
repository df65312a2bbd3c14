"""Z-order interleave + Bloom semi-join operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom_bits,
    _probe_indices,
)
from station_data_ingestion_spark.operators.zorder import zvalue2


def _morton_ref(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue2_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 37, 63) for b in (0, 2, 31, 63)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zvalue2(F.col("a"), F.col("b"), bits=6).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_ref(r.a, r.b, 6), (r.a, r.b)


def test_zvalue2_masks_out_of_range(spark):
    df = spark.createDataFrame([(1 << 10, 3)], "a long, b long").select(
        zvalue2(F.col("a"), F.col("b"), bits=6).alias("z")
    )
    # a's bit 10 exceeds the 6-bit mask -> contributes nothing
    assert df.first().z == _morton_ref(0, 3, 6)


def test_bloom_bits_no_false_negatives_low_fp():
    keys = list(range(0, 5000, 5))
    bits = build_bloom_bits(keys, m_bits=1 << 16, k=4)
    idx = _probe_indices(keys, 1 << 16, 4)
    hits = (bits[idx // 8] & (1 << (idx % 8)).astype("uint8")) != 0
    assert hits.all(), "Bloom filters NEVER have false negatives"
    probe = [x for x in range(1, 5000, 7) if x % 5 != 0]
    idx2 = _probe_indices(probe, 1 << 16, 4)
    fp = ((bits[idx2 // 8] & (1 << (idx2 % 8)).astype("uint8")) != 0).all(axis=1)
    assert fp.mean() < 0.05, f"false-positive rate {fp.mean():.3f} too high"


def test_bloom_semi_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i, i * 10) for i in range(2000)], "okey long, v long"
    )
    small = spark.createDataFrame([(i,) for i in range(0, 2000, 17)], "okey long")
    got = sorted(
        (r.okey, r.v) for r in bloom_semi_join(big, small, "okey").collect()
    )
    want = sorted((r.okey, r.v) for r in big.join(small, "okey").collect())
    assert got == want and len(got) == len(range(0, 2000, 17))


def test_bloom_semi_join_rejects_outer(spark):
    df = spark.createDataFrame([(1,)], "okey long")
    with pytest.raises(ValueError):
        bloom_semi_join(df, df, "okey", how="left")


def test_bloom_prefilter_reduces_rows_never_drops_matches(spark):
    """The point of the pre-filter is shuffle-volume reduction: with a
    selective dim side, the surviving row count must be FAR below the
    big side (modulo the fp rate) while containing every true match."""
    from station_data_ingestion_spark.operators.bloom import bloom_prefilter

    big = spark.createDataFrame(
        [(i, i) for i in range(20_000)], "okey long, v long"
    )
    small = spark.createDataFrame(
        [(i,) for i in range(0, 20_000, 100)], "okey long"  # 0.2% selective
    )
    kept = bloom_prefilter(big, small, "okey", m_bits=1 << 18).collect()
    kept_keys = {r.okey for r in kept}
    true_keys = set(range(0, 20_000, 100))
    assert true_keys <= kept_keys, "pre-filter dropped a true match"
    # 200 true + false positives; must be a small fraction of 20k
    assert len(kept) < 2_000, f"pre-filter kept {len(kept)} of 20000"
