"""PRODUCT QUANTIZATION (PQ) for approximate nearest neighbor search:
vectors are split into m subspaces, each quantized to a small per-
subspace codebook; a vector compresses to m small codes and distances
are approximated by Asymmetric Distance Computation (ADC) — the query
stays exact, each code looks its partial distance up in a per-query
table. [Jegou, Douze, Schmid: "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public method]

Spark shape: codebooks train on a DETERMINISTIC bounded sample (FUSED
Lloyd's — one Arrow pass per iteration covers all m subspaces, driver
state m*k*sub doubles); encoding is one Arrow mapInPandas pass; ADC
scoring is one
more pass with the m*k distance tables broadcast per query — the corpus
is never pairwise-joined, and the scan stays a single pass no matter
how many queries ride it. The exact rerank of the top-C candidates
bounds the approximation error the way IVF's probe rerank does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.operators.kmeans import _dist2 as _km_dist2



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
    # All m subspaces train FUSED: one init collect + one Arrow pass per
    # Lloyd iteration computes partial (count, sum) for every (subspace,
    # cluster) pair at once — m*n_iter jobs collapse to n_iter+1 (32 ->
    # 4 Spark actions for the default m=8/n_iter=3; at 100 TB this is
    # the difference between 4 and 32 scans of the training sample).
    # Same math as per-subspace kmeans_fit: identical deterministic init
    # (first k vectors by id, sliced), identical update rule, empty
    # clusters keep their previous centroid.
    first = (
        train.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("embedding"))
        .collect()
    )
    if len(first) < k:
        raise ValueError(
            f"pq_train: k={k} exceeds the {len(first)} available vectors"
        )
    init = np.array([r["embedding"] for r in first], dtype=np.float64)
    dim = init.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # (m, k, sub): subspace j's centroids start as the init slice
    books = np.stack(
        [init[:, j * sub : (j + 1) * sub] for j in range(m)]
    )
    vecs = train.select(F.col(vec_col).alias("embedding"))
    for _ in range(n_iter):
        partials = vecs.mapInPandas(
            _pq_assign_partials(books),
            "j int, cluster int, count long, vec_sum array<double>",
        ).collect()
        sums = np.zeros((m, k, sub))
        counts = np.zeros((m, k), dtype=np.int64)
        for r in partials:
            sums[r["j"], r["cluster"]] += np.asarray(r["vec_sum"])
            counts[r["j"], r["cluster"]] += r["count"]
        nonempty = counts > 0
        books = books.copy()
        books[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return books  # (m, k, sub)


def _pq_assign_partials(books: np.ndarray):
    """Per-Arrow-batch partial (count, vector sum) for every (subspace,
    nearest-cluster) pair — the map-side combine of fused Lloyd's."""
    m, k, sub = books.shape

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            js, cs, ns, ss = [], [], [], []
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # same clamped distance as kmeans_fit's _dist2 so ties
                # under near-zero round-off resolve identically to the
                # per-subspace path (ADVICE r10)
                lab = _km_dist2(xs, books[j]).argmin(1)
                for c in np.unique(lab):
                    sel = xs[lab == c]
                    js.append(j)
                    cs.append(int(c))
                    ns.append(len(sel))
                    ss.append(sel.sum(0))
            yield pd.DataFrame(
                {"j": js, "cluster": cs, "count": ns, "vec_sum": ss}
            )

    return run


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
