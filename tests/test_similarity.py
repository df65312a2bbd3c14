"""Similarity-search quality: ANN recall against the brute-force baseline."""

from station_data_ingestion_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _topk_pairs(spark, name):
    return {
        (r["q_id"], r["c_id"])
        for r in QUERIES[name].fn(spark, SF).collect()
    }


def test_lsh_ann_recall_against_brute_force(spark):
    truth = _topk_pairs(spark, "sim_brute_topk")
    ann = _topk_pairs(spark, "sim_ann_lsh_bucketed")
    assert truth, "brute force returned nothing"
    recall = len(truth & ann) / len(truth)
    # 2 bands x 8 bits on 64-dim data: high-similarity neighbors should
    # collide in at least one band most of the time
    assert recall >= 0.6, f"ANN recall {recall:.2f} too low ({ann & truth})"


def test_blocked_equals_lambda_brute_force(spark):
    assert _topk_pairs(spark, "sim_brute_topk") == _topk_pairs(
        spark, "sim_brute_topk_blocked"
    )


def test_neardup_finds_planted_pairs(spark, tmp_path):
    """sim_neardup_embeddings matches a numpy oracle on a corpus with
    PLANTED >0.98-cosine pairs (the sf corpora have none, so the driver's
    0-row oracle match proves nothing about the positive path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(123)
    n, dim, n_labels = 120, 64, 4
    base = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (np.arange(n) % n_labels).astype(np.int32)
    # plant near-dups INSIDE label blocks (ids i and i+60 share i%4 vs
    # (i+60)%4 -- 60 % 4 == 0, so same label) and one high-cos pair
    # SPLIT across labels (61 -> label changes) that must NOT be found
    for i in range(8):
        base[60 + i] = base[i] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    base[101] = base[40] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    assert labels[101] != labels[40]

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in base],
                                      pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    got = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in QUERIES["sim_neardup_embeddings"].fn(spark, str(tmp_path)).collect()
    }

    # numpy oracle: all within-label pairs with cos > 0.98
    x = base.astype(np.float64)
    norms = np.linalg.norm(x, axis=1)
    sims = (x @ x.T) / np.outer(norms, norms)
    exp = {
        (int(a), int(b)): round(float(sims[a, b]), 6)
        for a in range(n)
        for b in range(a + 1, n)
        if labels[a] == labels[b] and sims[a, b] > 0.98
    }
    assert len(exp) >= 8, "fixture failed to plant enough near-dups"
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 2e-6, (k, got[k], exp[k])
    assert (40, 101) not in got, "cross-label pair must be outside blocks"
