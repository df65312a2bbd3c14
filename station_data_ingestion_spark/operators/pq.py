"""PRODUCT QUANTIZATION (PQ) for approximate nearest neighbor search:
vectors are split into m subspaces, each quantized to a small per-
subspace codebook; a vector compresses to m small codes and distances
are approximated by Asymmetric Distance Computation (ADC) — the query
stays exact, each code looks its partial distance up in a per-query
table. [Jegou, Douze, Schmid: "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public method]

Spark shape: codebooks train on a DETERMINISTIC bounded sample (m
independent k-means over sliced sub-vectors, driver state m*k*sub
doubles); encoding is one Arrow mapInPandas pass; ADC scoring is one
more pass with the m*k distance tables broadcast per query — the corpus
is never pairwise-joined, and the scan stays a single pass no matter
how many queries ride it. The exact rerank of the top-C candidates
bounds the approximation error the way IVF's probe rerank does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.operators.kmeans import kmeans_fit


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 3,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train m per-subspace codebooks; returns (m, k, dim//m) float64.

    ``sample_mod``: train on the deterministic 1/sample_mod hash sample
    (xxhash64(id) % sample_mod == 0) — at 100 TB codebooks need a
    bounded sample, not the corpus; quantization quality saturates
    quickly with training size."""
    train = df
    if sample_mod > 1:
        train = df.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        )
    dim = len(train.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = train.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding"),
        )
        books.append(
            kmeans_fit(sliced, k=k, n_iter=n_iter, id_col=id_col)
        )
    return np.stack(books)  # (m, k, sub)


def pq_encode(df: DataFrame, books: np.ndarray) -> DataFrame:
    """One Arrow pass: each vector -> its m nearest-codeword indices."""
    m, k, sub = books.shape

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # ||xs - c||^2 argmin via the expanded form, one matmul
                d = (
                    (xs * xs).sum(1)[:, None]
                    - 2.0 * xs @ books[j].T
                    + (books[j] * books[j]).sum(1)[None, :]
                )
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    return df.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, codes array<int>"
    )


def pq_dist_tables(
    queries: list[tuple[int, np.ndarray]],
    books: np.ndarray,
    quantize_micro: int | None = None,
) -> list[tuple[int, np.ndarray]]:
    """Per-query (m, k) ADC lookup tables: entry [j, c] is the L2^2
    distance between the query's j-th sub-vector and codeword c.

    ``quantize_micro`` rounds each entry to integer micro-units
    (rint(dist * quantize_micro) as int64). Integer tables make the
    downstream ADC sum EXACT and engine-independent — candidate-set
    cutoffs then agree bit-for-bit between Spark and a SQL oracle
    summing the same table, which float accumulation order cannot
    guarantee. Distances here are O(100), so micro-units stay well
    inside both double-exactness and int64."""
    m, k, sub = books.shape
    tables = []
    for qid, qv in queries:
        t = np.empty((m, k))
        for j in range(m):
            qs = qv[j * sub : (j + 1) * sub]
            t[j] = ((books[j] - qs[None, :]) ** 2).sum(1)
        if quantize_micro:
            t = np.rint(t * quantize_micro).astype(np.int64)
        tables.append((qid, t))
    return tables


def pq_adc_scores(
    encoded: DataFrame, queries: list[tuple[int, np.ndarray]],
    books: np.ndarray,
    quantize_micro: int | None = None,
) -> DataFrame:
    """ADC approximate L2^2 of every (query, corpus row) pair — one
    Arrow pass over the encoded corpus with the per-query (m, k)
    lookup tables broadcast in the closure. With ``quantize_micro`` the
    tables are integer micro-units and ``adc`` is an exact long (see
    pq_dist_tables)."""
    m, k, sub = books.shape
    tables = pq_dist_tables(queries, books, quantize_micro)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            cols = np.arange(m)
            out = []
            for qid, t in tables:
                d = t[cols[None, :], codes].sum(1)  # (n,)
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(len(codes), qid, dtype=np.int64),
                            "c_id": pdf["vec_id"],
                            "adc": d,
                        }
                    )
                )
            yield pd.concat(out)

    adc_type = "long" if quantize_micro else "double"
    return encoded.mapInPandas(run, f"q_id long, c_id long, adc {adc_type}")
