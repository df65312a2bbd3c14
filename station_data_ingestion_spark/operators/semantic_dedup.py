"""Semantic (embedding-cluster) dedup — SemDeDup with an exactness
guarantee.

SemDeDup (Abbas et al. 2023) clusters corpus embeddings with k-means and
prunes documents whose intra-cluster cosine similarity exceeds a
threshold. Vanilla SemDeDup is approximate: a near-duplicate pair split
across two clusters is silently missed. This operator keeps the
cluster-bounded candidate generation (never all-pairs) but closes the
recall hole with a triangle-inequality margin, so the emitted pair set
is EXACTLY the set of pairs with cosine >= tau — auditable against a
brute-force SQL oracle.

The guarantee: on the unit sphere, cos(a,b) >= tau  <=>
||a'-b'|| <= r where a',b' are the normalized vectors and
r = sqrt(2 - 2*tau). Each vector is assigned to every centroid within
``dmin(x) + r`` of it, where dmin(x) is the distance to its nearest
centroid. For any qualifying pair (a,b), let a be the endpoint with the
smaller dmin; then ||b' - c_a|| <= ||b'-a'|| + ||a'-c_a||
<= r + dmin(a) <= r + dmin(b), so b is replicated into a's primary
block and the pair co-occurs there. Exact recall, candidate pairs
bounded per block.

Scale shape: k-means centroids are driver-side (k x dim doubles); the
replication pass is ONE Arrow-batched map (no shuffle); pair generation
is one shuffle on the block id with per-block numpy matmuls; the only
all-to-all is over SURVIVING pairs (a tiny fraction). The replication
factor is data-dependent: on clusterable corpora (the semantic-dedup
use case) most vectors land in 1-2 blocks; on pathologically uniform
data blocks overlap heavily — ``replication_stats`` reports the
realized factor so a pipeline can alarm instead of silently burning a
quadratic. tau close to 1 (near-duplicates, the intended regime) keeps
r — and with it the margin — small.

[reference: none — the reference has no embedding operators; LLM-
pipeline surface (SemDeDup / FAISS IVF exact-reassignment family),
same family as queries/llm_similarity.py]
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.kmeans import kmeans_fit


def _replicate_batches(centroids: np.ndarray, margin: float):
    """vec -> one row per block whose centroid is within dmin+margin
    (always includes the nearest centroid). Vectors are normalized for
    the BLOCKING geometry only; the raw vector rides along so the
    rerank computes cosine exactly as a brute-force oracle would."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(x, axis=1)
            xn = x / norms[:, None]
            d2 = (
                (xn * xn).sum(axis=1)[:, None]
                - 2.0 * (xn @ centroids.T)
                + (centroids * centroids).sum(axis=1)[None, :]
            )
            d = np.sqrt(np.maximum(d2, 0.0))
            cutoff = d.min(axis=1)[:, None] + margin
            rows, cols = np.nonzero(d <= cutoff)
            yield pd.DataFrame(
                {
                    "block": cols.astype(np.int32),
                    "vec_id": pdf["vec_id"].to_numpy()[rows],
                    "embedding": [x[i].tolist() for i in rows],
                }
            )

    return run


def _block_pairs(tau: float):
    """All a<b pairs inside one block with UNROUNDED cosine >= tau.
    Cosine is dot/(|a||b|) on the raw float64 vectors — the same
    formula as the SQL oracle, so the surviving set matches exactly."""

    def run(pdf):
        import pandas as pd

        x = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        n = np.linalg.norm(x, axis=1)
        sims = (x @ x.T) / np.outer(n, n)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= tau
        return pd.DataFrame(
            {
                "a_id": np.minimum(ids[iu], ids[ju])[keep],
                "b_id": np.maximum(ids[iu], ids[ju])[keep],
                "sim": np.round(sims[iu, ju][keep], 6),
            }
        )

    return run


def semantic_near_pairs(
    df: DataFrame,
    tau: float,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT set of (a_id < b_id, sim) pairs with cosine >= tau, found
    via cluster-bounded candidate generation (see module docstring).

    Deterministic: kmeans_fit is seed-free (first-k init by id), the
    margin guarantee makes the pair set independent of the clustering,
    and sims are rounded to 6 decimals.
    """
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    r = math.sqrt(2.0 - 2.0 * tau)
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias(
            "embedding"
        ),
    )
    # unit-normalize the kmeans input: blocking geometry lives on the
    # sphere, where cos >= tau <=> L2 <= r exactly
    normed = vecs.withColumn(
        "_n",
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    ).select(
        "vec_id",
        F.transform("embedding", lambda v: v / F.col("_n")).alias("embedding"),
    )
    centroids = kmeans_fit(normed, k=k, n_iter=n_iter)
    replicated = vecs.mapInPandas(
        _replicate_batches(centroids, margin=r),
        "block int, vec_id long, embedding array<double>",
    )
    pairs = replicated.groupBy("block").applyInPandas(
        _block_pairs(tau), "a_id long, b_id long, sim double"
    )
    # a pair co-occurring in several blocks scores identically (same
    # float64 formula on the same vectors); min is a deterministic pick
    return pairs.groupBy("a_id", "b_id").agg(F.min("sim").alias("sim"))


def semantic_dedup_prune(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup keep-one rule, exact: a document is pruned iff some
    LOWER-id document is cosine-near it; ``pruned_by`` is the smallest
    such id (NULL = kept representative). One broadcast-sized agg join —
    the pair set is tiny relative to the corpus."""
    dominated = pairs.groupBy("b_id").agg(F.min("a_id").alias("pruned_by"))
    return corpus.select(id_col).join(
        dominated, on=F.col(id_col) == F.col("b_id"), how="left"
    ).select(id_col, "pruned_by")
