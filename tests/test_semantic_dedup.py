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
