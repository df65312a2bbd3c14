"""Distributed k-means over an embedding column.

The iterative-algorithm pattern for Spark (SURVEY §2.9's "similarity"
family, scale path for corpus clustering): centroids live driver-side
(k x dim floats -- tiny), each iteration broadcasts them into ONE
Arrow-batched assignment+partial-aggregation pass, and the driver reduces
the per-partition partial sums. No shuffle of the vectors, ever; the only
data movement per iteration is (partitions x k x dim) partial sums to the
driver -- the treeAggregate shape, O(iterations) passes over the data.

Determinism: seed-free -- initial centroids are the first k vectors by
key order; all arithmetic is float64; partial sums are accumulated
per-partition then reduced in partition order, so reruns on the same
partitioning are bit-identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Squared distances via the matmul norm expansion.

    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 as an (n, k) matrix: one BLAS
    matmul, no (n, k, dim) difference tensor (which at 10k-row batches x
    k=100 x dim=768 would allocate ~6 GB per batch and OOM the worker).
    Clamped at 0 against negative round-off.
    """
    d2 = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ centroids.T)
        + (centroids * centroids).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


def _assign_partials(centroids: np.ndarray):
    k, dim = centroids.shape

    def run(batches):
        import pandas as pd

        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = _dist2(x, centroids)
            labels = d2.argmin(axis=1)
            for c in range(k):
                m = labels == c
                if m.any():
                    sums[c] += x[m].sum(axis=0)
                    counts[c] += int(m.sum())
        yield pd.DataFrame(
            {
                "cluster": np.arange(k),
                "count": counts,
                "vec_sum": [sums[c].tolist() for c in range(k)],
            }
        )

    return run


def _assign_labels(centroids: np.ndarray):
    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = _dist2(x, centroids)
            labels = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": labels.astype(np.int32),
                    "dist": np.round(np.sqrt(d2.min(axis=1)), 4),
                }
            )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's iterations; returns the final (k, dim) centroid matrix.

    Initial centroids = the first k vectors by `id_col` (deterministic,
    no RNG). Empty clusters keep their previous centroid.
    """
    first = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("embedding"))
        .collect()
    )
    if len(first) < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the {len(first)} available vectors"
        )
    centroids = np.array([r["embedding"] for r in first], dtype=np.float64)
    vecs = df.select(F.col(vec_col).alias("embedding"))
    for _ in range(n_iter):
        partials = vecs.mapInPandas(
            _assign_partials(centroids),
            f"cluster int, count long, vec_sum array<double>",
        ).collect()
        dim = centroids.shape[1]
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for r in partials:
            sums[r["cluster"]] += np.asarray(r["vec_sum"])
            counts[r["cluster"]] += r["count"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def kmeans_assign(df: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Label every row with its nearest centroid and the distance."""
    return df.select("vec_id", "embedding").mapInPandas(
        _assign_labels(centroids), "vec_id long, cluster int, dist double"
    )
