"""Perceptual-hash near-dup operator tests (operators/phash.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.phash import (
    N_BANDS,
    N_BITS,
    phash_neardup_pairs,
    with_ahash,
)


def _mk_payload(rng, n=2000):
    return bytes(rng.integers(0x20, 0x7F, size=n, dtype=np.uint8))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_planted_neardups_found_unrelated_not(spark):
    rng = np.random.default_rng(7)
    base = bytearray(_mk_payload(rng))
    near = bytearray(base)
    # perturb a couple of spots hard enough to flip a few blocks
    near[100:130] = b"~" * 30
    other = _mk_payload(np.random.default_rng(99))
    df = _df(spark, [(1, bytes(base)), (2, bytes(near)), (3, other)])
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in phash_neardup_pairs(df, "doc_id", "payload").collect()
    }
    assert (1, 2) in pairs, "perturbed copy must stay within the threshold"
    assert pairs[(1, 2)] <= 11
    assert (1, 3) not in pairs and (2, 3) not in pairs, (
        "unrelated random payloads must not pair (expected hamming ~30)"
    )


def test_identical_payloads_hamming_zero(spark):
    p = _mk_payload(np.random.default_rng(1))
    df = _df(spark, [(1, p), (2, p)])
    rows = phash_neardup_pairs(df, "doc_id", "payload").collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in rows] == [(1, 2, 0)]


def test_band_bucketing_is_lossless_vs_brute_force(spark):
    """Every brute-force pair within the threshold must come out of the
    banded path — the pigeonhole guarantee, checked empirically over a
    corpus of random payloads plus planted perturbations."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(20):
        b = bytearray(_mk_payload(rng))
        rows.append((i * 10, bytes(b)))
        mut = bytearray(b)
        pos = rng.integers(0, len(mut) - 40)
        mut[pos : pos + 40] = b"!" * 40
        rows.append((i * 10 + 1, bytes(mut)))
    df = _df(spark, rows)
    hashes = {
        r.row_id: r.phash for r in with_ahash(df, "doc_id", "payload").collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 11
    }
    banded = {
        (r.a_id, r.b_id): r.hamming
        for r in phash_neardup_pairs(df, "doc_id", "payload").collect()
    }
    assert banded == brute and len(brute) >= 10


def test_short_payloads_dropped(spark):
    df = _df(spark, [(1, b"tiny"), (2, b"x" * (N_BITS - 1))])
    assert with_ahash(df, "doc_id", "payload").count() == 0


def test_threshold_must_fit_bands(spark):
    df = _df(spark, [(1, b"x" * 100)])
    with pytest.raises(ValueError):
        phash_neardup_pairs(df, "doc_id", "payload", max_hamming=N_BANDS)
