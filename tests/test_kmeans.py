"""K-means operator vs an exact numpy replica of the same algorithm."""

import numpy as np

from station_data_ingestion_spark.operators.kmeans import kmeans_assign, kmeans_fit

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(x, k, n_iter):
    centroids = x[:k].copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for c in range(k):
            m = labels == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
    d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return centroids, d2.argmin(axis=1)


def test_kmeans_matches_numpy(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in e.collect()), key=lambda t: t[0]
    )
    x = np.array([v for _, v in rows], dtype=np.float64)
    ref_centroids, ref_labels = _numpy_kmeans(x, k=4, n_iter=3)

    centroids = kmeans_fit(e, k=4, n_iter=3)
    # centroids agree to float tolerance (partition-order summation only
    # differs in the last ulps)
    assert np.allclose(centroids, ref_centroids, rtol=1e-9, atol=1e-9)

    got = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(e, centroids).collect()
    }
    agree = sum(
        1 for (vid, _), lbl in zip(rows, ref_labels) if got[vid] == lbl
    )
    assert agree / len(rows) > 0.995


def test_k_exceeding_rows_raises(spark):
    import pytest

    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(3)
    with pytest.raises(ValueError, match="exceeds the 3 available"):
        kmeans_fit(e, k=8, n_iter=1)
