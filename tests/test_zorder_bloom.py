"""Z-order interleave + Bloom semi-join operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.bloom import (
    bloom_prefilter,
    bloom_semi_join,
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


def test_bloom_words_no_false_negatives_low_fp(spark):
    keys = spark.createDataFrame([(i,) for i in range(0, 5000, 5)], "okey long")
    hits = bloom_prefilter(keys, keys, "okey", m_bits=1 << 16).count()
    assert hits == keys.count(), "Bloom filters NEVER have false negatives"
    probe = spark.createDataFrame(
        [(x,) for x in range(1, 5000, 7) if x % 5 != 0], "okey long"
    )
    fp = bloom_prefilter(probe, keys, "okey", m_bits=1 << 16).count() / probe.count()
    assert fp < 0.05, f"false-positive rate {fp:.3f} too high"


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


def test_bloom_prefilter_is_jvm_only_and_narrow(spark):
    """The r4 regression to guard forever: the probe must be a pure JVM
    filter (no Python/Arrow stage on the fact side) so the scan stays
    narrow and codegen'd."""
    big = spark.createDataFrame([(i, i * 2) for i in range(100)], "okey long, v long")
    small = spark.createDataFrame([(3,), (7,)], "okey long")
    plan = bloom_prefilter(big, small, "okey")._jdf.queryExecution().executedPlan().toString()
    for marker in ("mapInPandas", "MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, f"Python stage leaked into the bloom probe:\n{plan}"


def test_bloom_float_keys_no_false_negatives(spark):
    """ADVICE r4 (medium): str()-based hashing diverged between driver
    floats and pandas float32 renderings -> silent false negatives. The
    JVM build/probe hash the same typed value via xxhash64; float keys
    (including a float32 fact side vs float64 dim side) must keep every
    true match."""
    vals = [0.3, 0.1 + 0.2, 1e-7, 123456.789, float(np.float32(0.3))]
    big = spark.createDataFrame(
        [(float(np.float32(v)), i) for i, v in enumerate(vals)],
        "okey float, v long",
    )
    # dim side arrives as float64; bloom_prefilter casts it to the fact type
    small = spark.createDataFrame([(v,) for v in vals], "okey double")
    kept = bloom_prefilter(big, small, "okey").count()
    matched = big.join(
        small.select(F.col("okey").cast("float").alias("okey")), "okey", "left_semi"
    ).count()
    assert kept >= matched and matched > 0


def test_bloom_mismatched_int_types_no_false_negatives(spark):
    big = spark.createDataFrame([(i, i) for i in range(500)], "okey long, v long")
    small = spark.createDataFrame([(i,) for i in range(0, 500, 9)], "okey int")
    got = sorted(r.okey for r in bloom_semi_join(big, small.select(F.col("okey").cast("long").alias("okey")), "okey").collect())
    assert got == sorted(range(0, 500, 9))
