"""semantic_dedup: exact recall guarantee of the cluster-bounded plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.semantic_dedup import (
    semantic_dedup_prune,
    semantic_near_pairs,
)


def _corpus(spark, seed=7, n=120, dim=16, n_clusters=5):
    """Clustered vectors with planted near-duplicates: cluster centers
    far apart, members tightly around them (the SemDeDup regime)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        x = c + rng.normal(scale=0.02 if i % 3 == 0 else 0.6, size=dim)
        rows.append((i, [float(v) for v in x]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        rows,
    )


def _brute_pairs(rows, tau):
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n = np.linalg.norm(x, axis=1)
    sims = (x @ x.T) / np.outer(n, n)
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if sims[i, j] >= tau:
                out.add((rows[i][0], rows[j][0]))
    return out


@pytest.mark.parametrize("tau", [0.95, 0.99])
def test_pairs_match_brute_force_exactly(spark, tau):
    df, rows = _corpus(spark)
    got = {
        (r.a_id, r.b_id)
        for r in semantic_near_pairs(df, tau=tau, k=4, n_iter=2).collect()
    }
    want = _brute_pairs(rows, tau)
    assert want, "fixture must plant near-duplicates"
    # the margin replication makes the cluster-bounded candidate set a
    # SUPERSET of the true pairs; the exact rerank then equalizes
    assert got == want


def test_prune_keeps_lowest_id_representative(spark):
    df, rows = _corpus(spark)
    pairs = semantic_near_pairs(df, tau=0.95, k=4, n_iter=2)
    out = semantic_dedup_prune(df, pairs)
    got = {r.vec_id: r.pruned_by for r in out.collect()}
    assert len(got) == len(rows)
    want_pairs = _brute_pairs(rows, 0.95)
    for vid, pruned_by in got.items():
        dominators = [a for a, b in want_pairs if b == vid]
        assert pruned_by == (min(dominators) if dominators else None)
    # at least one doc pruned and one kept
    assert any(v is not None for v in got.values())
    assert any(v is None for v in got.values())


def test_tau_validation(spark):
    df, _ = _corpus(spark)
    with pytest.raises(ValueError, match="tau"):
        semantic_near_pairs(df, tau=1.5)


def test_replication_stats_alarm_on_uniform_vectors(spark):
    """Pathologically uniform (mutually near-identical) vectors make
    every centroid fall within the margin of every vector: the realized
    replication factor approaches k — exactly the condition a pipeline
    must alarm on before paying for quadratic pair generation. A
    clusterable corpus stays near 1."""
    from station_data_ingestion_spark.operators.semantic_dedup import (
        replication_stats,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    uniform = [
        (i, [float(v) for v in base + rng.normal(scale=1e-3, size=16)])
        for i in range(80)
    ]
    udf_ = spark.createDataFrame(
        uniform, "vec_id long, embedding array<double>"
    )
    hot = replication_stats(udf_, tau=0.95, k=4, n_iter=2)
    assert hot["n_vectors"] == 80
    assert hot["replication_factor"] >= 3.5  # ~k: every block holds all
    assert hot["max_block_rows"] >= 75
    assert sum(hot["block_rows"].values()) == hot["replicated_rows"]

    # a GENUINELY clusterable corpus (tight clusters around far-apart
    # centers — the SemDeDup regime) must read near factor 1 and far
    # fewer candidate pairs; the loose _corpus fixture is deliberately
    # in-between and belongs to the exactness tests, not the alarm
    # contrast
    rng2 = np.random.default_rng(5)
    centers = rng2.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    tight = [
        (i, [float(v) for v in centers[i % 4] + rng2.normal(scale=0.01, size=16)])
        for i in range(80)
    ]
    clustered = spark.createDataFrame(
        tight, "vec_id long, embedding array<double>"
    )
    cool = replication_stats(clustered, tau=0.95, k=4, n_iter=4)
    assert cool["replication_factor"] <= 2.0  # vs ~k on the uniform blob
    assert cool["candidate_pairs"] < hot["candidate_pairs"] // 2


def test_stats_out_matches_standalone_and_auto_k(spark):
    from station_data_ingestion_spark.operators.semantic_dedup import (
        auto_k,
        replication_stats,
    )

    df, _ = _corpus(spark)
    inline: dict = {}
    semantic_near_pairs(
        df, tau=0.95, k=4, n_iter=2, stats_out=inline
    ).collect()
    standalone = replication_stats(df, tau=0.95, k=4, n_iter=2)
    assert inline == standalone
    assert auto_k(0) == 8 and auto_k(100) == 10
    assert auto_k(1_000_000) == 1000 and auto_k(10**9) == 4096


def test_block_size_cap_overflows_loudly(spark):
    """A hot block past max_block_rows must raise with actionable
    guidance, not silently OOM/burn O(n^2)."""
    df, _ = _corpus(spark)
    with pytest.raises(Exception, match="max_block_rows"):
        semantic_near_pairs(
            df, tau=0.95, k=2, n_iter=1, max_block_rows=10
        ).collect()


@pytest.mark.parametrize("chunk_bytes", [1, 8 * 3 * 120, 256 << 20])
def test_chunked_rerank_equals_single_matmul(spark, chunk_bytes):
    """The rerank computes sims in row chunks; chunk size (forced down
    to 1 row here) must not change the exact pair set."""
    import pandas as pd

    from station_data_ingestion_spark.operators.semantic_dedup import (
        _block_pairs,
    )

    _, rows = _corpus(spark)
    x = pd.DataFrame(
        {
            "block": [0] * len(rows),
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
        }
    )
    full = _block_pairs(0.95, 100_000, chunk_bytes=chunk_bytes)(x)
    got = {(int(a), int(b)) for a, b in zip(full["a_id"], full["b_id"])}
    assert got == _brute_pairs(rows, 0.95)


def test_auto_falls_back_to_single_block_on_uniform_corpus(spark):
    """The measured ladder: an unclusterable corpus degenerates the
    margin blocking (factor -> k), so auto must walk k down to 1 (one
    exact all-pairs block) and still produce the exact pair set —
    instead of paying k-fold duplicated brute force."""
    from station_data_ingestion_spark.operators.semantic_dedup import (
        semantic_near_pairs_auto,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    rows = [
        (i, [float(v) for v in base + rng.normal(scale=5e-4, size=16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats: dict = {}
    got = {
        (r.a_id, r.b_id)
        for r in semantic_near_pairs_auto(
            df, tau=0.95, n_iter=2, stats_out=stats
        ).collect()
    }
    assert stats["chosen_k"] == 1
    assert got == _brute_pairs(rows, 0.95)  # all pairs: near-identical


def test_auto_exact_on_clustered_corpus_and_cap_raises(spark):
    from station_data_ingestion_spark.operators.semantic_dedup import (
        semantic_near_pairs_auto,
    )

    df, rows = _corpus(spark)
    stats: dict = {}
    got = {
        (r.a_id, r.b_id)
        for r in semantic_near_pairs_auto(
            df, tau=0.95, n_iter=2, stats_out=stats
        ).collect()
    }
    assert got == _brute_pairs(rows, 0.95)
    assert stats["chosen_k"] >= 1 and stats["n_vectors"] == len(rows)
    # a tiny block cap rules the blocked sizes out; the k=1 group-pair
    # decomposition must still deliver the exact pair set (distributed
    # brute force, never a raise for memory)
    small: dict = {}
    got_small = {
        (r.a_id, r.b_id)
        for r in semantic_near_pairs_auto(
            df, tau=0.95, n_iter=2, max_block_rows=20, stats_out=small
        ).collect()
    }
    assert got_small == _brute_pairs(rows, 0.95)
    # the explicit WORK budget is the loud guard now: measured
    # candidate pairs over budget must raise before the quadratic runs
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        semantic_near_pairs_auto(
            df, tau=0.95, n_iter=2, max_candidate_pairs=10
        )


def test_auto_tiny_corpus_below_auto_k_floor(spark):
    """auto_k clamps UP to 8; a corpus with fewer vectors must clamp
    back down to n (through to the k=1 exact path) instead of raising
    'k exceeds available vectors' from kmeans_fit."""
    from station_data_ingestion_spark.operators.semantic_dedup import (
        semantic_near_pairs_auto,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats: dict = {}
    got = {
        (r.a_id, r.b_id)
        for r in semantic_near_pairs_auto(
            df, tau=0.95, n_iter=2, stats_out=stats
        ).collect()
    }
    assert got == {(0, 1)}
    assert 1 <= stats["chosen_k"] <= 3 and stats["n_vectors"] == 3
    # degenerate corpora: one vector and zero vectors both yield the
    # trivial empty pair set, no raise
    one = spark.createDataFrame(rows[:1], "vec_id long, embedding array<double>")
    assert semantic_near_pairs_auto(one, tau=0.9).count() == 0
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_near_pairs_auto(empty, tau=0.9).count() == 0
