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
from pyspark.sql import DataFrame, Observation
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


def _block_pairs(tau: float, max_block_rows: int, chunk_bytes: int = 256 << 20):
    """All a<b pairs inside one block with UNROUNDED cosine >= tau.
    Cosine is dot/(|a||b|) on the raw float64 vectors — the same
    formula as the SQL oracle, so the surviving set matches exactly.

    Memory: the sims matrix is computed in ROW CHUNKS (≤ ~256 MB per
    chunk), never n×n at once. Compute: per-block work is still
    O(n²·dim) — a hot block (skewed cluster, k too small for the
    corpus) would silently burn quadratic CPU, so blocks beyond
    ``max_block_rows`` raise loudly instead."""

    def run(pdf):
        import pandas as pd

        n_rows = len(pdf)
        if n_rows > max_block_rows:
            block = int(pdf["block"].iloc[0]) if "block" in pdf else -1
            raise ValueError(
                f"semantic-dedup block {block} holds {n_rows} vectors "
                f"(cap {max_block_rows}): the per-block rerank is "
                "O(n^2) — raise k toward sqrt(n_vectors) (see auto_k), "
                "or raise max_block_rows if the quadratic cost is "
                "intended. replication_stats() reports the realized "
                "block-size distribution."
            )
        x = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(x, axis=1)
        out_a, out_b, out_s = [], [], []
        # chunk×n float64 sims slab ≤ chunk_bytes; n×n never materializes
        chunk = max(1, chunk_bytes // (8 * max(n_rows, 1)))
        for lo in range(0, n_rows, chunk):
            hi = min(lo + chunk, n_rows)
            sims = (x[lo:hi] @ x.T) / np.outer(norms[lo:hi], norms)
            # strict upper triangle of the full matrix, chunk-local rows
            ci, cj = np.nonzero(sims >= tau)
            keep = ci + lo < cj
            ci, cj = ci[keep], cj[keep]
            gi = ci + lo
            out_a.append(np.minimum(ids[gi], ids[cj]))
            out_b.append(np.maximum(ids[gi], ids[cj]))
            out_s.append(np.round(sims[ci, cj], 6))
        if not out_a:
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []})
        return pd.DataFrame(
            {
                "a_id": np.concatenate(out_a),
                "b_id": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return run


def auto_k(n_vectors: int) -> int:
    """Block-count guidance: k ≈ sqrt(n) keeps expected block size
    ≈ sqrt(n) too, so per-block O(n_block²) work stays ~linear in the
    corpus overall. Clamped to [8, 4096] — below 8 the blocking buys
    nothing, above 4096 the driver-side centroid matrix and the
    per-vector centroid scan start to cost more than they save."""
    return max(8, min(4096, int(math.isqrt(max(n_vectors, 0)))))


def _replicated_blocks(
    df: DataFrame,
    tau: float,
    k: int,
    n_iter: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The margin-replicated (block, vec_id, embedding) frame shared by
    pair generation and replication_stats."""
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
    centroids = kmeans_fit(
        _hash_seeded(normed), k=k, n_iter=n_iter, id_col="_init_order"
    )
    return vecs.mapInPandas(
        _replicate_batches(centroids, margin=r),
        "block int, vec_id long, embedding array<double>",
    )


def _hash_seeded(normed: DataFrame) -> DataFrame:
    """Init spread for the k-means fit: first-k-by-id initial centroids
    sample an ID PREFIX, which on id-structured corpora (replicated
    shards, source-ordered crawls) can land every centroid inside one
    shard and leave whole regions centroid-free — the blocking then
    measures as degenerate even though the corpus clusters fine.
    Ordering the init by a deterministic hash of the id samples the
    whole corpus, still with no RNG."""
    return normed.withColumn("_init_order", F.xxhash64(F.col("vec_id")))


def replication_stats(
    df: DataFrame,
    tau: float,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Realized replication shape of the margin blocking — the alarm a
    100 TB pipeline checks BEFORE paying for the pair generation. On
    clusterable corpora the factor sits near 1; pathologically uniform
    vectors (or k far too small) drive it toward k, which means the
    'cluster-bounded' candidate set is quietly going quadratic.

    One aggregation over the replicated frame (k grouped rows — never a
    collect of the vectors). Returns::

        {"n_vectors", "replicated_rows", "replication_factor",
         "n_blocks", "max_block_rows", "candidate_pairs",
         "block_rows": {block: rows}}
    """
    rep = _replicated_blocks(df, tau, k, n_iter, id_col, vec_col)
    return _stats_from(rep, df.count())


def _stats_from(replicated: DataFrame, n: int) -> dict:
    per_block = (
        replicated.groupBy("block").agg(F.count("*").alias("rows")).collect()
    )
    block_rows = {int(r["block"]): int(r["rows"]) for r in per_block}
    replicated_rows = sum(block_rows.values())
    return {
        "n_vectors": n,
        "replicated_rows": replicated_rows,
        "replication_factor": round(replicated_rows / n, 3) if n else 0.0,
        "n_blocks": len(block_rows),
        "max_block_rows": max(block_rows.values(), default=0),
        "candidate_pairs": sum(m * (m - 1) // 2 for m in block_rows.values()),
        "block_rows": block_rows,
    }


def _eval_prefix_blockings(centroids: np.ndarray, margin: float, sizes):
    """One Arrow pass measuring EVERY candidate blocking at once.

    The margin-replication guarantee holds for ANY centroid set, so
    prefixes of one fitted centroid matrix are all valid blockings —
    distances to the k0 centroids are computed once per vector and the
    per-prefix nearest/within-margin counts fall out of cumulative
    minima, making the k sweep O(n·k0) total instead of one k-means fit
    per ladder step. Emits (s, block, cnt) partial rows."""

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
            out_s, out_b, out_c = [], [], []
            for s in sizes:
                ds = d[:, :s]
                cutoff = ds.min(axis=1)[:, None] + margin
                hit = ds <= cutoff
                rows, cols = np.nonzero(hit)
                blocks, cnts = np.unique(cols, return_counts=True)
                out_s.append(np.full(len(blocks), s, dtype=np.int32))
                out_b.append(blocks.astype(np.int32))
                out_c.append(cnts.astype(np.int64))
            yield pd.DataFrame(
                {
                    "s": np.concatenate(out_s),
                    "block": np.concatenate(out_b),
                    "cnt": np.concatenate(out_c),
                }
            )

    return run


def _cross_pairs(tau: float, chunk_bytes: int = 256 << 20):
    """Pair kernel for the group-pair decomposition: one task holds one
    (gi, gj) group pair. Diagonal tasks (side-0 rows only) emit the
    within-group triangle; off-diagonal tasks emit side-0 × side-1
    pairs only — every unordered pair lands in exactly ONE task, so
    total work is exactly n(n-1)/2 sims with G(G+1)/2-way parallelism
    and memory bounded by the group size (chunked, like _block_pairs)."""

    def run(pdf):
        import pandas as pd

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if len(b) == 0:
            block = a.drop(columns=["side"]).assign(block=0)
            return _block_pairs(tau, 1 << 62, chunk_bytes)(block)
        xa = np.array(list(a["embedding"]), dtype=np.float64)
        xb = np.array(list(b["embedding"]), dtype=np.float64)
        ia = a["vec_id"].to_numpy()
        ib = b["vec_id"].to_numpy()
        na = np.linalg.norm(xa, axis=1)
        nb = np.linalg.norm(xb, axis=1)
        out_a, out_b, out_s = [], [], []
        chunk = max(1, chunk_bytes // (8 * max(len(b), 1)))
        for lo in range(0, len(a), chunk):
            hi = min(lo + chunk, len(a))
            sims = (xa[lo:hi] @ xb.T) / np.outer(na[lo:hi], nb)
            ci, cj = np.nonzero(sims >= tau)
            out_a.append(np.minimum(ia[ci + lo], ib[cj]))
            out_b.append(np.maximum(ia[ci + lo], ib[cj]))
            out_s.append(np.round(sims[ci, cj], 6))
        if not out_a:
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []})
        return pd.DataFrame(
            {
                "a_id": np.concatenate(out_a),
                "b_id": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return run


def _all_pairs_distributed(
    vecs: DataFrame, tau: float, n: int, max_block_rows: int
) -> DataFrame:
    """EXACT all-pairs cosine via group-PAIR decomposition — the
    distributed floor when measured blocking cannot beat brute force
    (a corpus with no cluster structure at the margin scale). Rows
    hash into G bounded groups; each of the G(G+1)/2 group pairs is
    one independent task, so the unavoidable O(n²) sims spread across
    the cluster with per-task memory bounded by the group size —
    unlike a single k=1 block, which would serialize the quadratic on
    one core."""
    group_rows = max(1, min(max_block_rows, max(4096, -(-n // 8))))
    g_count = max(1, -(-n // group_rows))
    spark = vecs.sparkSession
    mapping = spark.createDataFrame(
        [
            (gi, gi * g_count + gj, 0)
            for gi in range(g_count)
            for gj in range(gi, g_count)
        ]
        + [
            (gj, gi * g_count + gj, 1)
            for gi in range(g_count)
            for gj in range(gi, g_count)
            if gj != gi
        ],
        "g int, pid int, side int",
    )
    tagged = vecs.withColumn(
        "g", (F.pmod(F.xxhash64("vec_id"), F.lit(g_count))).cast("int")
    ).join(F.broadcast(mapping), "g")
    pairs = tagged.groupBy("pid").applyInPandas(
        _cross_pairs(tau), "a_id long, b_id long, sim double"
    )
    # each unordered pair appears in exactly one task; the agg is kept
    # for shape parity with the blocked path (and is a cheap no-op)
    return pairs.groupBy("a_id", "b_id").agg(F.min("sim").alias("sim"))


def semantic_near_pairs_auto(
    df: DataFrame,
    tau: float,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int = 100_000,
    stats_out: dict | None = None,
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """:func:`semantic_near_pairs` with MEASURED k selection — the
    replication alarm wired to act instead of just report.

    Margin blocking only pays when the measured candidate-pair count
    beats plain all-pairs: on a corpus with no cluster structure at the
    margin scale (every centroid within dmin+r of every vector) the
    replication factor degenerates toward k — k-fold DUPLICATED brute
    force — while an over-fine k on a clusterable corpus multiplies
    within-cluster work. So: ONE k-means fit at ``auto_k(n)``, then one
    Arrow pass evaluates the geometric ladder of centroid PREFIXES
    (k0, k0/4, …, 1 — the exactness guarantee holds for any centroid
    set, so prefixes are valid blockings) and the k with the fewest
    candidate pairs wins; blocked sizes whose hottest block exceeds
    ``max_block_rows`` are ruled out. k=1 is the honest floor for an
    unclusterable corpus and runs as the GROUP-PAIR decomposition
    (:func:`_all_pairs_distributed`): exact brute force with zero
    duplicated work, G(G+1)/2-way parallelism, per-task memory bounded
    by ``max_block_rows`` — never one serial mega-block. The measured
    cost is always visible (``ladder`` in ``stats_out``); pass
    ``max_candidate_pairs`` to make an over-budget corpus raise loudly
    instead of running the quadratic — the alarm a 100 TB pipeline
    sets.

    Total measurement cost: one k-means fit + one linear evaluation
    pass, regardless of how many k values are compared.
    ``stats_out`` receives the winner's stats plus ``chosen_k`` and
    the per-size candidate counts (``ladder``)."""
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias(
            "embedding"
        ),
    )
    # ITERATIVE-REUSE checkpoint (guide §5): the measurement machinery
    # below re-reads this projection ~6x (k-means init + n_iter Lloyd
    # passes + the ladder evaluation) and the winning blocking reads it
    # once more — without cutting the lineage every pass re-executes
    # the caller's full upstream plan (for the gate query that plan is
    # a self-JOIN). Only the narrow (id, embedding) projection is
    # pinned, never the caller's frame; n rides the checkpoint action
    # as an observed metric instead of a separate COUNT job.
    obs = Observation()
    vecs = vecs.observe(
        obs, F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    n = int(obs.get["n"])
    # auto_k clamps UP to 8, so a corpus with fewer vectors than that
    # must clamp back down or kmeans_fit raises; below 2 vectors there
    # is no blocking to measure at all — go straight to the k=1 floor
    k0 = max(1, min(auto_k(n), n))
    if k0 == 1:
        pairs_n = n * (n - 1) // 2
        if max_candidate_pairs is not None and pairs_n > max_candidate_pairs:
            raise ValueError(
                f"semantic-dedup: {pairs_n} candidate pairs at k=1 "
                f"exceed the max_candidate_pairs budget {max_candidate_pairs}"
            )
        if stats_out is not None:
            stats_out.update(
                n_vectors=n,
                replicated_rows=n,
                replication_factor=1.0 if n else 0.0,
                n_blocks=1 if n else 0,
                max_block_rows=n,
                candidate_pairs=pairs_n,
                block_rows={0: n} if n else {},
                chosen_k=1,
                ladder={1: pairs_n},
            )
        return _all_pairs_distributed(vecs, tau, n, max_block_rows)
    sizes = []
    s = k0
    while s > 1:
        sizes.append(s)
        s //= 4
    sizes.append(1)
    r = math.sqrt(2.0 - 2.0 * tau)
    normed = vecs.withColumn(
        "_n",
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    ).select(
        "vec_id",
        F.transform("embedding", lambda v: v / F.col("_n")).alias(
            "embedding"
        ),
    )
    centroids = kmeans_fit(
        _hash_seeded(normed), k=k0, n_iter=n_iter, id_col="_init_order"
    )
    per_block = (
        vecs.mapInPandas(
            _eval_prefix_blockings(centroids, r, sizes),
            "s int, block int, cnt long",
        )
        .groupBy("s", "block")
        .agg(F.sum("cnt").alias("rows"))
        .collect()
    )
    by_size: dict[int, dict[int, int]] = {s: {} for s in sizes}
    for row in per_block:
        by_size[int(row["s"])][int(row["block"])] = int(row["rows"])
    ladder = {
        s: sum(m * (m - 1) // 2 for m in blocks.values())
        for s, blocks in by_size.items()
    }
    # s=1 is ALWAYS feasible: it runs as the group-pair decomposition
    # (exact brute force, G(G+1)/2-way parallel, memory bounded), so
    # the blocked sizes only stay in play when their hot block fits
    # the cap AND they actually beat brute force
    feasible = [
        s
        for s in sizes
        if s == 1 or max(by_size[s].values(), default=0) <= max_block_rows
    ]
    chosen = min(feasible, key=lambda s: (ladder[s], s))
    if max_candidate_pairs is not None and ladder[chosen] > max_candidate_pairs:
        raise ValueError(
            f"semantic-dedup measured {ladder[chosen]} candidate pairs "
            f"at the best blocking (k={chosen}), over the "
            f"max_candidate_pairs budget {max_candidate_pairs}. The "
            "corpus has no cluster structure at the margin scale "
            "sqrt(2-2*tau) — raise tau, shard the corpus, or raise the "
            f"budget if the quadratic cost is intended. Ladder: {ladder}"
        )
    blocks = by_size[chosen]
    replicated_rows = sum(blocks.values())
    if stats_out is not None:
        stats_out.update(
            n_vectors=n,
            replicated_rows=replicated_rows,
            replication_factor=round(replicated_rows / n, 3) if n else 0.0,
            n_blocks=len(blocks),
            max_block_rows=max(blocks.values(), default=0),
            candidate_pairs=ladder[chosen],
            block_rows=blocks,
            chosen_k=chosen,
            ladder=ladder,
        )
    if chosen == 1:
        return _all_pairs_distributed(vecs, tau, n, max_block_rows)
    replicated = vecs.mapInPandas(
        _replicate_batches(centroids[:chosen], margin=r),
        "block int, vec_id long, embedding array<double>",
    )
    pairs = replicated.groupBy("block").applyInPandas(
        _block_pairs(tau, max_block_rows), "a_id long, b_id long, sim double"
    )
    return pairs.groupBy("a_id", "b_id").agg(F.min("sim").alias("sim"))


def semantic_near_pairs(
    df: DataFrame,
    tau: float,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int = 100_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """EXACT set of (a_id < b_id, sim) pairs with cosine >= tau, found
    via cluster-bounded candidate generation (see module docstring).

    Deterministic: kmeans_fit is seed-free (first-k init by id), the
    margin guarantee makes the pair set independent of the clustering,
    and sims are rounded to 6 decimals. Pick ``k`` with :func:`auto_k`
    (≈ sqrt(n)); a block exceeding ``max_block_rows`` raises loudly
    instead of silently burning O(n²) on a hot cluster — check
    :func:`replication_stats` to see the realized distribution.

    Pass ``stats_out={}`` to get the replication-shape numbers filled
    in eagerly (same fields as :func:`replication_stats`, sharing this
    call's k-means fit — one extra replication pass, no second fit).
    """
    replicated = _replicated_blocks(df, tau, k, n_iter, id_col, vec_col)
    if stats_out is not None:
        stats_out.update(_stats_from(replicated, df.count()))
    pairs = replicated.groupBy("block").applyInPandas(
        _block_pairs(tau, max_block_rows), "a_id long, b_id long, sim double"
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
