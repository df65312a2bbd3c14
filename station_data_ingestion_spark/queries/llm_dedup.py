"""Deduplication operators for LLM training-data pipelines.

Four tiers over `documents` (SURVEY §2.9 / BASELINE north-star):

1. exact        -- md5 hash groups (generalizes the reference's exact-key
                   merge dedup J5)
2. n-gram Jaccard -- exact near-dup pairs via the scalable explode-join
                   (NEVER a cross join: explode shingles, self-join on the
                   shingle, count common -- at 100 TB this shuffles on
                   shingle, a high-cardinality key, and only true-overlap
                   pairs materialize)
3. MinHash+LSH  -- 32-perm signatures, 16 bands x 2 rows, band-bucket
                   self-join for candidates, exact-Jaccard rerank. The
                   rerank makes the output equal to tier 2 above the
                   threshold (oracle-checkable); LSH only bounds the
                   candidate set. P(miss) for a j=0.9 pair ~ (1-0.9^2)^16
                   ~ 4e-12.
4. SimHash-48   -- 48-bit fingerprint from md5 nibble votes, expressed
                   with pure relational ops on BOTH engines (the SQL is
                   generated from the same nibble loop).

All hashing is md5-based because md5 is bit-identical across Spark and
DuckDB; Spark-only xxhash64 appears solely inside the (non-oracle-visible)
MinHash permutations.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

from station_data_ingestion_spark.queries.registry import load, query

# Filled by dedup_semantic_clusters on each run (cleared first): the
# realized replication shape of the margin blocking, so bench's scale
# probe can publish the block-size distribution next to the timing.
LAST_SEMANTIC_REPLICATION_STATS: dict = {}

# --- tier 1: exact -----------------------------------------------------------


@query(
    "dedup_exact_hash",
    """
WITH hashed AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
groups AS (SELECT text_hash, MIN(doc_id) AS rep_id, COUNT(*) AS group_size
           FROM hashed GROUP BY text_hash)
SELECT h.doc_id, g.rep_id, g.group_size,
       CAST(h.doc_id <> g.rep_id AS INT) AS is_dup
FROM hashed h JOIN groups g ON h.text_hash = g.text_hash
""",
)
def dedup_exact_hash(spark, sf_dir):
    """Exact dedup: hash-group, keep min doc_id as representative."""
    d = load(spark, sf_dir, "documents")["documents"]
    hashed = d.select("doc_id", F.md5("text").alias("text_hash"))
    groups = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("group_size")
    )
    return hashed.join(groups, "text_hash").select(
        "doc_id",
        "rep_id",
        "group_size",
        (F.col("doc_id") != F.col("rep_id")).cast("int").alias("is_dup"),
    )


# --- shared shingle machinery ------------------------------------------------

_SHINGLE_SQL = """
shingled AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sset
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
),
exploded AS (SELECT doc_id, UNNEST(sset) AS shingle FROM shingled),
sizes AS (SELECT doc_id, len(sset) AS n FROM shingled),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jacc AS (
  SELECT a_id, b_id,
         CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS j
  FROM common JOIN sizes sa ON sa.doc_id = a_id
              JOIN sizes sb ON sb.doc_id = b_id
)
"""

_JACCARD_ORACLE = f"""
WITH {_SHINGLE_SQL}
SELECT a_id, b_id, ROUND(j, 4) AS jaccard FROM jacc WHERE j >= 0.8
"""


def _shingle_set(text: str) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _shingle_rows_batch(batches):
    """(doc_id, text) -> one (doc_id, n, shingle) row per distinct shingle.

    Python-side shingling beats Spark's interpreted higher-order array
    lambdas by a wide margin; carrying the per-doc shingle count `n` in
    every row lets the downstream pair-join compute Jaccard without two
    extra joins against a sizes table.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ssets = [list(_shingle_set(t)) for t in pdf["text"]]
        counts = np.array([len(s) for s in ssets])
        keep = counts > 0
        if not keep.any():
            continue
        counts = counts[keep]
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy()[keep], counts),
                "n": np.repeat(counts.astype(np.int32), counts),
                "shingle": np.concatenate(
                    [np.asarray(s, dtype=object) for s, k in zip(ssets, keep) if k]
                ),
            }
        )


def _pair_jaccard_batch(batches):
    """(a_id, b_id, a_text, b_text) -> (a_id, b_id, j): exact word-3-gram
    Jaccard per candidate pair. Pair counts are LSH-bounded (tiny), so a
    per-row Python set intersection is cheaper than any distributed plan.
    """
    import pandas as pd

    for pdf in batches:
        js = []
        for a_t, b_t in zip(pdf["a_text"], pdf["b_text"]):
            sa, sb = _shingle_set(a_t), _shingle_set(b_t)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            js.append(inter / union if union else 0.0)
        yield pd.DataFrame(
            {"a_id": pdf["a_id"], "b_id": pdf["b_id"], "j": js}
        )


def _exploded_shingles(d: DataFrame) -> DataFrame:
    """Distinct (doc_id, n, shingle) rows via one fused Arrow stage.

    The input is repartitioned first: the test corpus is a single parquet
    row group (one task), while shingling is embarrassingly parallel
    per-doc work. On a real multi-file 100 TB table the scan already
    yields thousands of splits and this repartition collapses into AQE
    coalescing.
    """
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    return d.select("doc_id", "text").mapInPandas(
        _shingle_rows_batch, "doc_id long, n int, shingle string"
    )


def _capped_candidates(exploded: DataFrame, max_doc_freq: int) -> DataFrame:
    """Candidate (a_id, b_id) pairs sharing >=1 shingle with document
    frequency <= max_doc_freq.

    A shingle present in d documents yields d^2/2 pre-aggregation join
    rows, so one "stop shingle" (boilerplate header, license block) in a
    web-crawl corpus turns the explode-join quadratic. Dropping high-df
    shingles from CANDIDATE GENERATION ONLY — the rerank recomputes exact
    Jaccard over the full texts — bounds the join at d<=cap per key. The
    standard CCNet/SimHash-era guard; its one miss mode (a true near-dup
    pair ALL of whose shared shingles are boilerplate) is exactly the
    pair near-dup dedup should not merge anyway.

    The df filter is a window count over the `shingle` partition — the
    same key the self-join shuffles on, so the cap rides the exchange
    the join already pays instead of re-running the shingle stage for a
    df-table join (r12, guide §2.4 — same restructure as
    :func:`_prefix_candidates`).
    """
    rare = (
        exploded.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("__df") <= max_doc_freq)
        .drop("__df")
    )
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def _exact_jaccard_pairs(
    d: DataFrame, threshold: float, max_doc_freq: int | None = None
) -> DataFrame:
    """Scalable exact-Jaccard pairs: explode-join on shingle, no cross join.

    At 100 TB this shuffles on `shingle` -- a high-cardinality key -- and
    only true-overlap pairs ever materialize; the per-doc shingle count
    rides along in the join so no sizes table is needed.

    ``max_doc_freq``: optional stop-shingle guard for heavy-boilerplate
    corpora — shingles appearing in more than this many docs are dropped
    from candidate generation (see :func:`_capped_candidates`) and the
    surviving pairs are exactly reranked from their full texts. Off by
    default (and at the correctness gate): the exact path is the oracle
    twin; the cap trades the boilerplate-only-overlap pairs for a bounded
    join.
    """
    exploded = _exploded_shingles(d)
    if max_doc_freq is not None:
        cands = _capped_candidates(exploded, max_doc_freq)
        texts = d.select("doc_id", "text")
        pairs = (
            cands.join(
                texts.select(
                    F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
                ),
                "a_id",
            )
            .join(
                texts.select(
                    F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")
                ),
                "b_id",
            )
            .mapInPandas(_pair_jaccard_batch, "a_id long, b_id long, j double")
        )
        return (
            pairs.filter(F.col("j") >= threshold)
            .select("a_id", "b_id", F.round("j", 4).alias("jaccard"))
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.select("a_id", "b_id", j.alias("j"))
        .filter(F.col("j") >= threshold)
        .select("a_id", "b_id", F.round("j", 4).alias("jaccard"))
    )


@query("dedup_ngram_jaccard_pairs", _JACCARD_ORACLE)
def dedup_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs (j >= 0.8)."""
    d = load(spark, sf_dir, "documents")["documents"]
    return _exact_jaccard_pairs(d, 0.8)


# --- tier 3: MinHash + LSH ----------------------------------------------------

_P = 2_147_483_647  # 2^31 - 1
# 32 perms = 16 bands x 2 rows: P(miss) for a j=0.9 pair is
# (1 - 0.9^2)^16 ~ 4e-12.
_N_PERM = 32
_BANDS = 16
_ROWS = _N_PERM // _BANDS
_rng = random.Random(42)
_PERMS = [(_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(_N_PERM)]


def _minhash_bands_batch(batches):
    """(doc_id, text) Arrow batches -> (doc_id, band, sig) rows, vectorized.

    Shingle + minhash + band in ONE fused Python stage: word-3-gram
    shingles per doc (plain Python over each batch -- cheap next to the
    hashing), siphash the flattened shingles (pd.util.hash_array --
    deterministic, C-speed), apply all 32 universal-hash permutations as
    a broadcasted (n_shingles, 32) matrix, min-reduce per doc with
    np.minimum.reduceat, then combine each band's 2 rows injectively into
    one int64 bucket key. This replaces a 32-wide codegen'd min-aggregate
    whose generated code took ~30 s to JIT-compile plus an interpreted
    higher-order-function shingle projection; the fused stage is also the
    100 TB shape: per-partition streaming, no shuffle until the (tiny)
    band table self-joins.
    """
    import numpy as np
    import pandas as pd

    a_vec = np.array([a for a, _ in _PERMS], dtype=np.uint64)
    b_vec = np.array([b for _, b in _PERMS], dtype=np.uint64)
    p = np.uint64(_P)
    # slice each Arrow batch: the (n_shingles, 32) permutation matrix for
    # a full 10k-row batch peaks near 1 GB per task; ~2k docs bounds it
    # to ~60 MB without changing the output (reduceat is per-doc)
    chunk = 2048

    def one_chunk(pdf):
        # same shingling as the exact-Jaccard rerank (_shingle_set):
        # candidate generation and rerank MUST tokenize identically or
        # the recall guarantee silently degrades
        ssets = [list(_shingle_set(t)) for t in pdf["text"]]
        counts = np.array([len(s) for s in ssets])
        keep = counts > 0
        if not keep.any():
            return None
        counts = counts[keep]
        doc_ids = pdf["doc_id"].to_numpy()[keep]
        flat = np.concatenate(
            [np.asarray(s, dtype=object) for s, k in zip(ssets, keep) if k]
        )
        base = pd.util.hash_array(flat) % p  # (n_shingles,)
        # a*base + b < 2^62: fits uint64 without overflow
        hs = (base[:, None] * a_vec[None, :] + b_vec[None, :]) % p
        bounds = np.concatenate(([0], np.cumsum(counts[:-1])))
        sig = np.minimum.reduceat(hs, bounds, axis=0)  # (n_docs, 32)
        # band key = h[2b]*P + h[2b+1] < 2^62 -- injective, signed-64 safe
        band_sig = (
            sig[:, 0::2].astype(np.int64) * np.int64(_P)
            + sig[:, 1::2].astype(np.int64)
        )  # (n_docs, 16)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, _BANDS),
                "band": np.tile(np.arange(_BANDS, dtype=np.int32), len(doc_ids)),
                "sig": band_sig.reshape(-1),
            }
        )

    for whole in batches:
        for lo in range(0, len(whole), chunk):
            out = one_chunk(whole.iloc[lo : lo + chunk])
            if out is not None:
                yield out


@query("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup detection with exact-Jaccard rerank.

    Signature: 32 universal-hash permutations of hashed shingles,
    computed with shingling fused into one vectorized Arrow/numpy
    mapInPandas stage; candidates from 16-band bucket self-join (the two
    sides hash-partition identically, so Spark reuses the exchange);
    rerank computes exact Jaccard on the candidate pairs only, with the
    tiny candidate table broadcast against the documents scan. Output ==
    the exact pair query (the oracle); LSH only bounds the candidate set,
    so the hash function choice never affects correctness.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    bands = d.select("doc_id", "text").mapInPandas(
        _minhash_bands_batch, "doc_id long, band int, sig long"
    )
    # Materialize the band table ONCE. Without this, Catalyst sees only
    # a default size estimate for the MapInPandas output, decides it is
    # broadcastable, and builds a BroadcastHashJoin whose BUILD SIDE is
    # the whole band table: the expensive signature stage runs twice
    # (once per join side) and 16 rows/doc funnel through the driver --
    # measured 13x super-linear at the sf1 10x probe, and a guaranteed
    # driver OOM at corpus scale. The checkpoint gives AQE the real size
    # (16 rows/doc), so the self-join plans as a shuffle join with the
    # signature stage computed exactly once.
    bands = bands.localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # exact rerank on candidates only. No broadcast HINT on the candidate
    # table: for weakly-duplicated corpora AQE broadcasts it anyway
    # (runtime size under the threshold), while on a heavily-duplicated
    # crawl LSH candidates can be a large fraction of the corpus and a
    # forced broadcast would OOM the driver -- there the join degrades
    # gracefully to a shuffle on doc_id, which is the right 100 TB plan.
    ta = d.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"))
    tb = d.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
    with_a = candidates.join(ta, "a_id")
    pair_texts = with_a.join(tb, "b_id")
    pairs = pair_texts.select("a_id", "b_id", "a_text", "b_text").mapInPandas(
        _pair_jaccard_batch, "a_id long, b_id long, j double"
    )
    return (
        pairs.filter(F.col("j") >= 0.8)
        .select("a_id", "b_id", F.round("j", 4).alias("jaccard"))
    )


# --- tier 4: SimHash-48 -------------------------------------------------------

_NIBBLES = 12  # 48 bits, stays far inside signed-64 range


def _simhash_oracle() -> str:
    votes = []
    for i in range(_NIBBLES):
        nib = f"(strpos('0123456789abcdef', substr(md5(token), {i + 1}, 1)) - 1)"
        for bit in range(4):
            pos = i * 4 + bit
            votes.append(
                f"CAST(SUM(CASE WHEN (({nib} >> {bit}) & 1) = 1 THEN 1 ELSE -1 END) > 0 AS BIGINT)"
                f" * {1 << pos}"
            )
    bits = " + ".join(votes)
    return f"""
WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
SELECT doc_id, {bits} AS simhash FROM toks GROUP BY doc_id
"""


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """SimHash-48 fingerprints: per-token md5 nibble bits vote +1/-1 per
    bit position; fingerprint bit = sign of the vote sum. Same arithmetic
    generated as SQL for the oracle."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    h = F.md5("token")
    votes = []
    for i in range(_NIBBLES):
        nib = F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int")
        for bit in range(4):
            pos = i * 4 + bit
            vote = F.when(F.shiftright(nib, bit).bitwiseAND(1) == 1, 1).otherwise(-1)
            votes.append(
                (F.sum(vote) > 0).cast("long") * F.lit(1 << pos).cast("long")
            )
    total = votes[0]
    for v in votes[1:]:
        total = total + v
    return toks.groupBy("doc_id").agg(total.alias("simhash"))


# --- tier 5: near-dup clustering (connected components) -----------------------

_CC_ORACLE = f"""
WITH RECURSIVE {_SHINGLE_SQL},
pairs AS (SELECT a_id, b_id FROM jacc WHERE j >= 0.8),
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id FROM reach GROUP BY u
)
SELECT doc_id, rep_id,
       COUNT(*) OVER (PARTITION BY rep_id) AS cluster_size
FROM labels
"""


@query("dedup_connected_components", _CC_ORACLE)
def dedup_connected_components(spark, sf_dir, checkpoint_dir=None):
    """Near-dup clusters: connected components over the j>=0.8 pair graph
    (the oracle is a recursive CTE; the engine runs alternating
    large-star/small-star contraction, operators.graph).

    Star contraction converges in O(log^2 n) rounds regardless of graph
    shape -- a chain-shaped dup cluster (each doc similar only to its
    neighbors) would cost plain label propagation O(chain length) rounds.
    Pass ``checkpoint_dir`` (HDFS/S3) on a real cluster so per-round
    truncation survives executor loss; the local default uses
    localCheckpoint.
    """
    from station_data_ingestion_spark.operators.graph import (
        connected_components,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = _exact_jaccard_pairs(d, 0.8).select("a_id", "b_id")
    labels = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    w = Window.partitionBy("rep_id")
    return (
        labels.select(F.col("node").alias("doc_id"), F.col("rep").alias("rep_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )


@query(
    "text_benchmark_contamination",
    """
WITH shingled AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sset
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
),
exploded AS (SELECT doc_id, UNNEST(sset) AS shingle FROM shingled),
bench AS (SELECT DISTINCT shingle FROM exploded WHERE doc_id % 97 = 0),
hits AS (
  SELECT e.doc_id, COUNT(*) AS n_hit
  FROM exploded e JOIN bench b ON e.shingle = b.shingle
  WHERE e.doc_id % 97 <> 0
  GROUP BY e.doc_id
),
sizes AS (SELECT doc_id, len(sset) AS n FROM shingled)
SELECT h.doc_id, ROUND(CAST(n_hit AS DOUBLE) / s.n, 4) AS contamination
FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
WHERE CAST(n_hit AS DOUBLE) / s.n >= 0.1
""",
)
def text_benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination check: fraction of each training doc's
    distinct word-3-grams that appear in a held-out benchmark set (here
    the deterministic doc_id % 97 == 0 slice stands in for the benchmark
    corpus). The training-pipeline op that keeps eval sets out of the
    training data.

    Scale: the benchmark gram set is tiny relative to the corpus, so it
    broadcasts; the corpus-side gram stream joins map-side -- the only
    shuffle is the per-doc hit count (partial map-side combine).
    """
    d = load(spark, sf_dir, "documents")["documents"]
    grams = _exploded_shingles(d)
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    ratio = F.col("n_hit") / F.col("n")
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "n")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(ratio >= 0.1)
        .select("doc_id", F.round(ratio, 4).alias("contamination"))
    )


_CANON_ORACLE = f"""
WITH RECURSIVE {_SHINGLE_SQL},
pairs AS (SELECT a_id, b_id FROM jacc WHERE j >= 0.8),
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id FROM reach GROUP BY u
),
assigned AS (
  SELECT d.doc_id, COALESCE(l.rep_id, d.doc_id) AS rep_id
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
)
SELECT rep_id AS canonical_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM assigned GROUP BY rep_id
"""


@query("dedup_canonical_docs", _CANON_ORACLE)
def dedup_canonical_docs(spark, sf_dir, checkpoint_dir=None):
    """The dedup pipeline's terminal step: one canonical survivor per
    near-dup cluster (lowest doc_id), singletons kept, with how many
    near-dups each survivor absorbed. Composes the connected-components
    operator with a left join over the corpus -- the shape that turns
    'here are the clusters' into 'here is the training set'."""
    from station_data_ingestion_spark.operators.graph import (
        connected_components,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = _exact_jaccard_pairs(d, 0.8).select("a_id", "b_id")
    labels = connected_components(pairs, checkpoint_dir=checkpoint_dir).select(
        F.col("node").alias("doc_id"), F.col("rep").alias("rep_id")
    )
    assigned = (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("rep_id", "doc_id").alias("canonical_id")
        )
    )
    return assigned.groupBy("canonical_id").agg(
        (F.count(F.lit(1)) - 1).alias("n_dropped")
    )


_CC_SIZES_ORACLE = f"""
WITH RECURSIVE {_SHINGLE_SQL},
pairs AS (SELECT a_id, b_id FROM jacc WHERE j >= 0.8),
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id FROM reach GROUP BY u
),
csizes AS (SELECT rep_id, COUNT(*) AS sz FROM labels GROUP BY rep_id)
SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM csizes GROUP BY sz
"""


@query("dedup_cluster_size_histogram", _CC_SIZES_ORACLE)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Duplicate-cluster size distribution — the report a dedup run
    publishes (how much of the corpus sits in 2-dup vs 50-dup clusters
    decides the canonical-keep policy). Adds one dimension-sized
    aggregation on top of the star-contraction components."""
    from station_data_ingestion_spark.operators.graph import (
        connected_components,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = _exact_jaccard_pairs(d, 0.8).select("a_id", "b_id")
    labels = connected_components(pairs)
    sizes = labels.groupBy("rep").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


_NEARDUP_DEGREE_ORACLE = f"""
WITH RECURSIVE {_SHINGLE_SQL},
pairs AS (SELECT a_id, b_id FROM jacc WHERE j >= 0.8),
nodes AS (SELECT a_id AS u FROM pairs UNION ALL SELECT b_id FROM pairs),
deg AS (SELECT u, COUNT(*) AS d FROM nodes GROUP BY u)
SELECT d AS degree, COUNT(*) AS n_docs FROM deg GROUP BY d
"""


@query("dedup_neardup_degree_distribution", _NEARDUP_DEGREE_ORACLE)
def dedup_neardup_degree_distribution(spark, sf_dir):
    """Near-dup graph degree distribution: how many similars each doc
    has — the skew diagnostic run BEFORE clustering (a power-law tail
    here predicts hot keys in the CC join and justifies the df-cap
    candidate tier)."""
    d = load(spark, sf_dir, "documents")["documents"]
    pairs = _exact_jaccard_pairs(d, 0.8).select("a_id", "b_id")
    nodes = pairs.select(F.col("a_id").alias("u")).unionAll(
        pairs.select(F.col("b_id").alias("u"))
    )
    deg = nodes.groupBy("u").agg(F.count("*").alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_docs")
    )


# --- tier 2b: AllPairs/PPJoin-style prefix filtering -------------------------


def _prefix_candidates(exploded: DataFrame, threshold: float) -> DataFrame:
    """Candidate (a_id, b_id, na, nb) pairs via PREFIX FILTERING
    (AllPairs/PPJoin family): order each doc's shingles by ascending
    global document frequency (rarest first, ties by shingle), keep only
    the first n - ceil(t*n) + 1 as the doc's prefix, and join docs on
    shared PREFIX shingles with the Jaccard size filter
    t*na <= nb <= na/t.

    Completeness: J(a,b) >= t implies overlap >= t/(1+t)*(na+nb) >=
    ceil(t*n_x) for each side (given the size filter, itself implied by
    J >= t), and two sets whose overlap meets that bound must share a
    token within these prefixes under ANY common total order — so no
    true pair is lost; the proof is the standard prefix-filtering
    principle.

    Scale: vs the plain explode-join (every shared shingle a candidate
    row), the join input shrinks to prefix tokens only — and because
    prefixes are the RAREST tokens, the per-shingle fan-out is smallest
    exactly where the join would explode. df comes from a window count
    over the shingle partition — one pass over the exploded rows.
    """
    # df as a WINDOW count over the shingle partition: the old shape
    # (groupBy df table + join back) re-ran the whole shingle Arrow
    # stage for the aggregate's input — with the self-join below, FOUR
    # explode passes per query. The window computes df on the same rows
    # in one pass per side (r12, guide §2.4; measured 1.99 -> 1.60s /
    # 7 -> 6 jobs at sf0.1, output identical).
    ranked = exploded.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = ranked.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    )
    a = prefix.select(
        F.col("doc_id").alias("a_id"), F.col("n").alias("na"), "shingle"
    )
    b = prefix.select(
        F.col("doc_id").alias("b_id"), F.col("n").alias("nb"), "shingle"
    )
    return (
        a.join(b, "shingle")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("nb") * threshold <= F.col("na"))
            & (F.col("na") * threshold <= F.col("nb"))
        )
        .select("a_id", "b_id")
        .distinct()
    )


def _prefix_filtered_jaccard_pairs(d: DataFrame, threshold: float) -> DataFrame:
    """Exact-threshold Jaccard pairs: prefix-filtered candidates, then
    exact rerank from the pair texts (same Arrow verifier as the df-cap
    path) — identical output to :func:`_exact_jaccard_pairs`.

    The shingle stage is deliberately RECOMPUTED by its consumers (df
    aggregation, rank join, both self-join sides) rather than
    materialized: measured at sf0.1, eager localCheckpoint of either
    the exploded table or the prefix slice is 30-60% SLOWER than the
    recompute (the narrow Arrow stage is cheap; forcing eager
    materialization serializes stages AQE otherwise overlaps), and at
    100 TB storing every shingle row is the memory hazard. CPU
    recompute is the right side of that trade here."""
    exploded = _exploded_shingles(d)
    cands = _prefix_candidates(exploded, threshold)
    texts = d.select("doc_id", "text")
    pairs = (
        cands.join(
            texts.select(
                F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
            ),
            "a_id",
        )
        .join(
            texts.select(
                F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")
            ),
            "b_id",
        )
        .mapInPandas(_pair_jaccard_batch, "a_id long, b_id long, j double")
    )
    return pairs.filter(F.col("j") >= threshold).select(
        "a_id", "b_id", F.round("j", 4).alias("jaccard")
    )


@query("dedup_jaccard_prefix_filtered", _JACCARD_ORACLE)
def dedup_jaccard_prefix_filtered(spark, sf_dir):
    """Word-3-gram Jaccard near-dup pairs (j >= 0.8) via PREFIX
    FILTERING instead of the full explode-join: same answer as
    dedup_ngram_jaccard_pairs (same oracle), but candidates come only
    from shared rarest-prefix shingles + the size filter — the
    AllPairs/PPJoin shape whose join volume survives boilerplate-heavy
    corpora that melt the plain shingle join."""
    d = load(spark, sf_dir, "documents")["documents"]
    return _prefix_filtered_jaccard_pairs(d, 0.8)


@query(
    "dedup_fuzzy_ed1_suppliers",
    """
SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
       levenshtein(a.s_name, b.s_name) AS dist
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
""",
)
def dedup_fuzzy_ed1_suppliers(spark, sf_dir):
    """Fuzzy string join, edit distance <= 1 (operators/fuzzy.py):
    deletion-variant blocking (SymSpell cover — exact completeness, not
    LSH recall) turns the all-pairs levenshtein join into one bucketed
    equi-join on variants plus a candidates-only rerank. The oracle is
    the naive quadratic join — affordable at gate scale, which is
    exactly why the gate can certify the pruned plan's completeness."""
    from station_data_ingestion_spark.operators.fuzzy import fuzzy_join_ed1

    s = load(spark, sf_dir, "supplier")["supplier"].select(
        "s_suppkey", "s_name"
    )
    return fuzzy_join_ed1(s, "s_suppkey", "s_name").select(
        F.col("a_id").cast("long"),
        F.col("b_id").cast("long"),
        F.col("dist").cast("long"),
    )


@query(
    "dedup_semantic_clusters",
    """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), twins AS (
  SELECT a.vec_id + 100000 AS vec_id,
         list_transform(list_zip(a.v, b.v), p -> p[1] + 0.1 * p[2]) AS v
  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 10 = 0
), corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM twins
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(b.v, b.v))) >= 0.95
)
SELECT c.vec_id,
       (SELECT MIN(p.a_id) FROM pairs p WHERE p.b_id = c.vec_id) AS pruned_by
FROM corpus c
""",
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup semantic dedup (operators/semantic_dedup.py): k-means
    cluster the corpus embeddings, generate candidate pairs ONLY inside
    margin-replicated clusters (triangle-inequality superset — never
    all-pairs), exact-cosine rerank, then prune every doc that has a
    lower-id neighbor with cos >= 0.95 (pruned_by = that neighbor;
    NULL = kept representative). The base embeddings are mutually
    far (max cos ~0.6), so near-duplicate TWINS are planted
    deterministically (every 10th vector + 0.1x its successor — the
    same construction in both engines); the oracle recomputes the
    answer by brute-force quadratic join, which the margin guarantee
    says the cluster-bounded plan must match exactly."""
    from station_data_ingestion_spark.operators.semantic_dedup import (
        semantic_dedup_prune,
        semantic_near_pairs_auto,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    twins = (
        base.alias("a")
        .join(base.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .filter(F.col("a.vec_id") % 10 == 0)
        .select(
            (F.col("a.vec_id") + 100000).alias("vec_id"),
            F.zip_with("a.v", "b.v", lambda x, y: x + F.lit(0.1) * y).alias("v"),
        )
    )
    corpus = base.unionByName(twins)
    # MEASURED k: this synthetic corpus is unclusterable by
    # construction (base vectors mutually far — every k-means centroid
    # lands within the margin of every vector, replication factor -> k,
    # i.e. k-fold duplicated brute force). semantic_near_pairs_auto
    # detects that from replication_stats and walks k down — here to
    # k=1, the honest exact plan for a corpus this shape and size — and
    # RAISES instead of burning a silent quadratic when an unclusterable
    # corpus exceeds the block cap. The exactness guarantee makes the
    # ANSWER independent of the chosen k, so the oracle stays valid.
    rep_stats = LAST_SEMANTIC_REPLICATION_STATS
    rep_stats.clear()
    pairs = semantic_near_pairs_auto(
        corpus, tau=0.95, n_iter=3, vec_col="v", stats_out=rep_stats
    )
    # alarm invariants: the measured plan never exceeds brute force,
    # and the per-block accounting is self-consistent
    n = rep_stats["n_vectors"]
    if rep_stats["candidate_pairs"] > n * (n - 1) // 2:
        raise RuntimeError(
            f"semantic-dedup accepted a plan WORSE than brute force: "
            f"{rep_stats}"
        )
    if sum(rep_stats["block_rows"].values()) != rep_stats["replicated_rows"]:
        raise RuntimeError(f"replication accounting broken: {rep_stats}")
    return semantic_dedup_prune(corpus, pairs)


_CONTAINMENT_ORACLE = f"""
WITH {_SHINGLE_SQL},
both_dirs AS (
  SELECT a_id AS src_id, b_id AS dst_id,
         n_common * 10000 // sa.n AS containment_bp
  FROM common JOIN sizes sa ON sa.doc_id = a_id
  UNION ALL
  SELECT b_id AS src_id, a_id AS dst_id,
         n_common * 10000 // sb.n AS containment_bp
  FROM common JOIN sizes sb ON sb.doc_id = b_id
)
SELECT src_id, dst_id, CAST(containment_bp AS BIGINT) AS containment_bp
FROM both_dirs WHERE containment_bp >= 5000
"""


@query("text_ngram_containment", _CONTAINMENT_ORACLE)
def text_ngram_containment(spark, sf_dir):
    """Directional n-gram containment |A∩B| / |A| (>= 50%) — the
    asymmetric cousin of Jaccard that catches a SHORT document embedded
    in a long one (quote inclusion, benchmark leakage into a crawl
    page), which symmetric Jaccard dilutes away. Same explode-join
    candidate shape as the Jaccard query — shuffles on shingle, only
    true-overlap pairs materialize, each surviving overlap emits both
    directions. Exact integer basis points, no float thresholds."""
    d = load(spark, sf_dir, "documents")["documents"]
    exploded = _exploded_shingles(d)
    a, b = exploded.alias("a"), exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    both = common.select(
        F.col("a_id").alias("src_id"),
        F.col("b_id").alias("dst_id"),
        F.expr("n_common * 10000 div na").alias("containment_bp"),
    ).unionByName(
        common.select(
            F.col("b_id").alias("src_id"),
            F.col("a_id").alias("dst_id"),
            F.expr("n_common * 10000 div nb").alias("containment_bp"),
        )
    )
    return both.filter(F.col("containment_bp") >= 5000).select(
        "src_id", "dst_id", F.col("containment_bp").cast("long")
    )


# --- tier 2c: WEIGHTED (tf-idf cosine) all-pairs similarity join -------------

_TFIDF_COS_ORACLE = """
WITH tok AS (
  SELECT doc_id, t AS token
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE t <> ''
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ROUND(LN(n.n_docs * 1.0 / dfq.df), 6) AS w
  FROM tf JOIN dfq USING (token) CROSS JOIN n
),
nrm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
u AS (
  SELECT w.doc_id, w.token, w.w / nrm.nrm AS u
  FROM w JOIN nrm USING (doc_id)
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.u * b.u) AS dot
  FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, ROUND(dot, 4) AS cosine
FROM pairs WHERE ROUND(dot, 4) >= 0.9
"""


def _tfidf_unit_weights(d: DataFrame) -> DataFrame:
    """Per-(doc, token) UNIT-NORMALIZED tf-idf weight plus the token's
    document frequency (the weighted join's global ordering key). idf
    is rounded to 6 dp so Spark and the SQL oracle agree bit-for-bit on
    the weight definition (libm ln can differ in the last ulp)."""
    n_docs = d.count()
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = tf.join(df_tbl, "token").withColumn(
        "w",
        F.col("tf")
        * F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    return (
        w.join(nrm, "doc_id")
        .withColumn("u", F.col("w") / F.col("nrm"))
        .select("doc_id", "token", "df", "u")
    )


def _weighted_prefix_pairs(u: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs via the WEIGHTED prefix filter (Bayardo et al.,
    Scaling Up All Pairs Similarity Search): under a global feature
    order (ascending df, rarest first), a doc's prefix is the head of
    its unit vector until the remaining suffix norm drops below t —
    if two unit vectors have dot >= t, their FIRST common feature in
    that order must lie in BOTH prefixes (were it outside x's prefix,
    every common feature would sit in x's suffix and
    dot <= ||x_suffix|| < t). So joining prefixes on shared tokens
    loses no true pair. Rarest-first ordering makes the prefix tokens
    exactly the low-fan-out ones, which is what keeps the self-join
    alive on boilerplate-heavy corpora. One window cumsum, one
    equi-join — all JVM."""
    win = Window.partitionBy("doc_id").orderBy("df", "token")
    cum = u.withColumn(
        "cum", F.sum(F.col("u") * F.col("u")).over(win)
    )
    # keep token i while the suffix INCLUDING i still has norm >= t:
    # 1 - cum_{i-1} >= t^2 (1e-12 guards float noise on the keep side)
    prefix = cum.filter(
        F.lit(1.0) - (F.col("cum") - F.col("u") * F.col("u"))
        >= F.lit(threshold * threshold) - F.lit(1e-12)
    )
    a = prefix.select(F.col("doc_id").alias("a_id"), "token")
    b = prefix.select(F.col("doc_id").alias("b_id"), "token")
    return (
        a.join(b, "token")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


@query("sim_tfidf_cosine_pairs", _TFIDF_COS_ORACLE)
def sim_tfidf_cosine_pairs(spark, sf_dir):
    """WEIGHTED set-similarity self-join: tf-idf cosine >= 0.9 document
    pairs, the weighted counterpart of dedup_jaccard_prefix_filtered.
    Candidates come only from shared tokens inside each vector's
    suffix-norm prefix (see _weighted_prefix_pairs); the exact dot is
    then reranked over the candidates' FULL vectors, so the output
    equals the oracle's all-pairs computation while the join volume is
    bounded by rare-token co-occurrence. All stages are JVM
    (explode/window/joins); floats stay engine-identical via 6-dp idf
    rounding and a 4-dp final round.

    Corpus dependence (measured): on a low-entropy UNIGRAM vocabulary
    (templated synthetic docs, every token df >> 1) the prefix filter
    keeps ~85% of all pairs — signature-based exact joins cannot beat
    all-pairs when no side owns rare features. On natural text (Zipf
    vocabulary, hapax-heavy) prefixes are rare-token-only and the join
    collapses. For boilerplate-heavy corpora the SHINGLED Jaccard
    prefix join (dedup_jaccard_prefix_filtered) is the scale path —
    3-gram shingles re-create feature rarity that unigrams lack."""
    d = load(spark, sf_dir, "documents")["documents"]
    t = 0.9
    u = _tfidf_unit_weights(d)
    cands = _weighted_prefix_pairs(u, t)
    ua = u.select(
        F.col("doc_id").alias("a_id"), "token", F.col("u").alias("ua")
    )
    ub = u.select(
        F.col("doc_id").alias("b_id"), "token", F.col("u").alias("ub")
    )
    dot = (
        cands.join(ua, "a_id")
        .join(ub, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 4).alias("cosine"))
    )
    return dot.filter(F.col("cosine") >= t)


# --- tier 3: entity resolution -> golden record ------------------------------

_ER_GOLDEN_ORACLE = """
WITH RECURSIVE pairs AS (
  SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id
  FROM supplier a JOIN supplier b
    ON a.s_suppkey < b.s_suppkey AND a.s_nationkey = b.s_nationkey
  WHERE levenshtein(a.s_name, b.s_name) <= 1
),
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (SELECT u AS sk, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
memb AS (
  SELECT s.s_suppkey AS sk, COALESCE(l.rep, s.s_suppkey) AS rep,
         s.s_name AS nm,
         CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier s LEFT JOIN labels l ON s.s_suppkey = l.sk
),
golden AS (
  SELECT rep AS entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(MAX(cents) AS BIGINT) AS best_cents,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM memb GROUP BY rep
),
ph AS (
  SELECT rep AS entity_id, nm,
         ROW_NUMBER() OVER (PARTITION BY rep
                            ORDER BY cents DESC, sk) AS rk
  FROM memb
)
SELECT g.entity_id, g.n_members, g.best_cents, g.total_cents,
       p.nm AS golden_name
FROM golden g JOIN ph p ON g.entity_id = p.entity_id AND p.rk = 1
"""


@query("er_golden_record_suppliers", _ER_GOLDEN_ORACLE)
def er_golden_record_suppliers(spark, sf_dir, checkpoint_dir=None):
    """ENTITY RESOLUTION capstone — the full survivorship pipeline a
    master-data/training-corpus system runs, composed from certified
    engine pieces: (1) BLOCKING: SymSpell deletion-variant fuzzy join
    (operators/fuzzy.py) finds edit-distance<=1 name pairs without the
    quadratic join; (2) MATCH RULE: keep pairs agreeing on nationkey
    (structured-field corroboration); (3) CLUSTERING: iterative min-
    label connected components (operators/graph.py, O(log^2 n) rounds);
    (4) SURVIVORSHIP: one golden record per cluster — min key as entity
    id, member count, best/total balance (exact cents), and the name
    of the highest-balance member (deterministic tiebreak by key).
    Singletons survive as their own golden records via the left join.
    Oracle: quadratic levenshtein join + recursive reachability — the
    gate certifies the pruned pipeline end-to-end."""
    from station_data_ingestion_spark.operators.fuzzy import fuzzy_join_ed1
    from station_data_ingestion_spark.operators.graph import (
        connected_components,
    )

    s = load(spark, sf_dir, "supplier")["supplier"].select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
    )
    pairs = fuzzy_join_ed1(
        s.select("s_suppkey", "s_name"), "s_suppkey", "s_name"
    ).select(F.col("a_id").cast("long"), F.col("b_id").cast("long"))
    nat = s.select(
        F.col("s_suppkey").alias("a_id"),
        F.col("s_nationkey").alias("a_nat"),
    )
    nat_b = s.select(
        F.col("s_suppkey").alias("b_id"),
        F.col("s_nationkey").alias("b_nat"),
    )
    edges = (
        pairs.join(nat, "a_id")
        .join(nat_b, "b_id")
        .filter(F.col("a_nat") == F.col("b_nat"))
        .select("a_id", "b_id")
    )
    labels = connected_components(edges, checkpoint_dir=checkpoint_dir)
    memb = s.join(
        labels.select(
            F.col("node").alias("s_suppkey"), F.col("rep")
        ),
        "s_suppkey",
        "left",
    ).select(
        F.col("s_suppkey").alias("sk"),
        F.coalesce("rep", "s_suppkey").alias("entity_id"),
        F.col("s_name").alias("nm"),
        "cents",
    )
    golden = memb.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("cents").alias("best_cents"),
        F.sum("cents").alias("total_cents"),
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("cents").desc(), F.col("sk")
    )
    best_phone = (
        memb.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("entity_id", F.col("nm").alias("golden_name"))
    )
    return golden.join(best_phone, "entity_id")


@query(
    "text_dup_ngram_span_fraction",
    """
WITH arr AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 8
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS gram
  FROM arr, LATERAL (SELECT UNNEST(range(0, len(w) - 7)) AS i) t
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
),
iv AS (
  SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e
  FROM grams g JOIN dup USING (gram)
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS new_island
  FROM iv
),
islands AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged
),
per_island AS (
  SELECT doc_id, island, MAX(e) - MIN(s) + 1 AS len
  FROM islands GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, CAST(SUM(len) AS BIGINT) AS dup_tokens
  FROM per_island GROUP BY doc_id
)
SELECT a.doc_id, CAST(len(a.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(p.dup_tokens, 0) * 10000 // len(a.w) AS BIGINT)
         AS dup_fraction_bp
FROM arr a LEFT JOIN per_doc p ON p.doc_id = a.doc_id
""",
)
def text_dup_ngram_span_fraction(spark, sf_dir):
    """Duplicated-substring coverage per document — the Lee et al.
    ("Deduplicating Training Data Makes Language Models Better")
    ExactSubstr signal approximated at 8-token granularity: every
    8-gram occurring ≥2 times anywhere in the corpus marks its token
    span [pos, pos+7] duplicated, and the fraction of each document
    covered by the UNION of its duplicated spans is the
    train-data-quality score (high = boilerplate/copy). Plan: grams
    come from pure array ops on the split text (slice inside
    transform — no window, no self-join); the occurrence count is one
    shuffle on the gram string (at 100 TB you would shuffle an
    xxhash64 of the gram instead — same plan, narrower rows); span
    union is the per-doc gaps-and-islands program (partitioned
    windows only), identical to events_interval_union_length."""
    d = load(spark, sf_dir, "documents")["documents"]
    arr = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 8
    )
    grams = arr.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(0, size(w) - 8),"
            " i -> struct(i AS pos,"
            " array_join(slice(w, i + 1, 8), ' ') AS gram)))"
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    # occurrence count >= 2 as a WINDOW count over the gram partition:
    # one shuffle of the gram rows replaces the old groupBy + semi-join
    # shape, which paid a second full explode of the corpus (the join's
    # probe side recomputed the Generate) plus a (gram, count) partial
    # shuffle and a broadcast of the dup grams. Same rows survive —
    # count-per-gram is identical either way (r12, guide §2.4; measured
    # 1.59 -> 0.98s / 5 -> 4 jobs at sf0.1 with bit-equal output).
    iv = (
        grams.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .filter(F.col("c") >= 2)
        .select(
            "doc_id", F.col("pos").alias("s"), (F.col("pos") + 7).alias("e")
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    per_doc = (
        islands.groupBy("doc_id", "island")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
        .groupBy("doc_id")
        .agg(F.sum("len").cast("long").alias("dup_tokens"))
    )
    return (
        arr.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            (
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                * 10000
                / F.col("n_tokens")
            )
            .cast("long")
            .alias("dup_fraction_bp"),
        )
    )


@query(
    "dedup_qgram_ed2_partnames",
    """
WITH names AS (
  SELECT DISTINCT p_name AS nm FROM part
)
SELECT a.nm AS name_a, b.nm AS name_b,
       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_distance
FROM names a JOIN names b
  ON a.nm < b.nm
 AND abs(len(a.nm) - len(b.nm)) <= 2
 AND levenshtein(a.nm, b.nm) <= 2
""",
)
def dedup_qgram_ed2_partnames(spark, sf_dir):
    """EDIT-DISTANCE <= 2 string-pair join with EXACT q-gram COUNT
    FILTERING (Gravano et al.): one edit destroys at most q=2 bigrams,
    so ED(x,y) <= k forces |bigrams(x) /\\ bigrams(y)| (multiset) >=
    max(|Gx|,|Gy|) - k*q. Candidates come from an equi-join on shared
    bigrams + a per-pair LEAST(cx,cy) sum against that bound — never the
    all-pairs product the quadratic oracle pays — then one levenshtein()
    verify. The bound degenerates (<= 0) only when BOTH strings have
    <= k*q bigrams (len <= 5 here); those ultra-short strings are a
    bounded vocabulary handled by a separate length-band equi-join leg
    (|len diff| <= k), so completeness is exact for every input, not
    just long strings. SymSpell (dedup_fuzzy_ed1_suppliers) stays the
    ED<=1 fast path; count filtering is the general-k scale path: both
    shuffles key on bigram/name, and frequent-bigram skew salts like
    any hot join key."""
    p = load(spark, sf_dir, "part")["part"]
    names = p.select(F.col("p_name").alias("nm")).distinct()
    grams = names.select(
        "nm",
        F.explode(
            F.expr(
                "transform(sequence(1, length(nm) - 1),"
                " i -> substring(nm, i, 2))"
            )
        ).alias("g"),
    ).groupBy("nm", "g").agg(F.count(F.lit(1)).alias("c"))
    ga = grams.select(
        F.col("nm").alias("na"), F.col("g"), F.col("c").alias("ca")
    )
    gb = grams.select(
        F.col("nm").alias("nb"), F.col("g"), F.col("c").alias("cb")
    )
    common = (
        ga.join(gb, "g")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.sum(F.least("ca", "cb")).alias("common"))
    )
    # count-filter: common >= max(|Ga|,|Gb|) - k*q, valid when that
    # bound is positive (at least one side longer than k*q grams)
    candA = common.filter(
        F.col("common")
        >= F.greatest(F.length("na"), F.length("nb")) - 1 - 4
    ).select("na", "nb")
    # degenerate leg: both sides have <= 4 bigrams (len <= 5) — a
    # bounded ultra-short vocabulary; length-band equi-join covers it
    short = names.filter(F.length("nm") <= 5)
    sa = short.select(
        F.col("nm").alias("na"),
        F.explode(
            F.sequence(F.length("nm") - 2, F.length("nm") + 2)
        ).alias("lb"),
    )
    sb = short.select(F.col("nm").alias("nb"), F.length("nm").alias("lb"))
    candB = (
        sa.join(sb, "lb").filter(F.col("na") < F.col("nb")).select("na", "nb")
    )
    cand = candA.unionAll(candB).distinct()
    verified = cand.filter(
        (F.abs(F.length("na") - F.length("nb")) <= 2)
        & (F.levenshtein("na", "nb") <= 2)
    )
    return verified.select(
        F.col("na").alias("name_a"),
        F.col("nb").alias("name_b"),
        F.levenshtein("na", "nb").cast("long").alias("edit_distance"),
    )


@query(
    "dedup_levenshtein_adjacent_histogram",
    """
WITH p AS (SELECT p_partkey AS k, p_name AS nm FROM part),
pairs AS (
  SELECT a.nm AS na, b.nm AS nb
  FROM p a JOIN p b ON b.k = a.k + 1
)
SELECT CAST(LEAST(levenshtein(na, nb), 30) AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
""",
)
def dedup_levenshtein_adjacent_histogram(spark, sf_dir):
    """Edit-distance histogram over ADJACENT part-name pairs (key k
    joined to k+1): certifies Spark's native JVM levenshtein against
    DuckDB's native implementation — two codebases we didn't write
    agreeing cell-for-cell on ~N string pairs is a strong independent
    check of the primitive the fuzzy-dedup family (SymSpell ED<=2,
    q-gram blocking) builds on. The pair frame is LINEAR by
    construction (a shifted-key equi-join, not a self-cross), so the
    certification scales with the corpus; distances cap at 30 to keep
    the histogram bounded."""
    p = load(spark, sf_dir, "part")["part"].select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("nm")
    )
    b = p.select((F.col("k") - 1).alias("k"), F.col("nm").alias("nb"))
    pairs = p.join(b, "k").select(
        F.least(F.levenshtein("nm", "nb"), F.lit(30)).alias("dist")
    )
    return pairs.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    ).select(F.col("dist").cast("long").alias("dist"), "n_pairs")
