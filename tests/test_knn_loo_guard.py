"""ml_knn_loo_accuracy's eval budget: an over-budget corpus must raise
loudly (never silently run the quadratic / driver collect), and the
opt-in deterministic down-sample must equal an exact numpy LOO replica
computed on the same md5-selected sample."""

import hashlib

import numpy as np
import pytest

from station_data_ingestion_spark.queries.ml_q import ml_knn_loo_accuracy
from station_data_ingestion_spark.queries.registry import load

SF_DIR = "/root/testdata/sf0.001"


def test_over_budget_raises(spark):
    with pytest.raises(RuntimeError, match="max_eval_rows"):
        ml_knn_loo_accuracy(spark, SF_DIR, max_eval_rows=50)


def test_within_budget_runs(spark):
    out = ml_knn_loo_accuracy(spark, SF_DIR, max_eval_rows=10_000)
    assert out.count() > 0


def _loo_replica(rows):
    """Exact 5-NN LOO in numpy, mirroring the query's tie rules."""
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    lab = np.array([r["label"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    sims = np.round((mat @ mat.T) / np.outer(nrm, nrm), 6)
    np.fill_diagonal(sims, -np.inf)
    # self-exclusion is by id, not position (ids are unique here so the
    # diagonal fill is equivalent)
    n_lab = int(lab.max()) + 1
    per = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:5]
        counts = np.bincount(lab[order], minlength=n_lab)
        pred = int(np.argmax(counts))
        n, c = per.get(lab[i], (0, 0))
        per[lab[i]] = (n + 1, c + (1 if pred == lab[i] else 0))
    return {
        int(k): (n, c, c * 1_000_000 // n) for k, (n, c) in per.items()
    }


def test_sampled_run_matches_replica_on_the_sample(spark):
    budget = 60
    out = ml_knn_loo_accuracy(
        spark, SF_DIR, max_eval_rows=budget, sample_over_budget=True
    )
    got = {
        int(r["label"]): (int(r["n"]), int(r["n_correct"]), int(r["acc_ppm"]))
        for r in out.collect()
    }
    # rebuild the md5 bottom-k sample the query selects and replicate
    rows = load(spark, SF_DIR, "embeddings")["embeddings"].collect()
    rows = sorted(
        rows, key=lambda r: hashlib.md5(str(r["vec_id"]).encode()).hexdigest()
    )[:budget]
    assert got == _loo_replica(rows)
    assert sum(n for n, _, _ in got.values()) == budget


def test_sample_is_deterministic(spark):
    a = ml_knn_loo_accuracy(
        spark, SF_DIR, max_eval_rows=60, sample_over_budget=True
    ).collect()
    b = ml_knn_loo_accuracy(
        spark, SF_DIR, max_eval_rows=60, sample_over_budget=True
    ).collect()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(a) == key(b)
