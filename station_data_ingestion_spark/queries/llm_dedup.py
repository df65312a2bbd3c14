"""Deduplication operators for LLM training-data pipelines.

Four tiers over `documents` (SURVEY §2.9 / BASELINE north-star):

1. exact        -- md5 hash groups (generalizes the reference's exact-key
                   merge dedup J5)
2. n-gram Jaccard -- exact near-dup pairs via the scalable explode-join
                   (NEVER a cross join: explode shingles, self-join on the
                   shingle, count common -- at 100 TB this shuffles on
                   shingle, a high-cardinality key, and only true-overlap
                   pairs materialize)
3. MinHash+LSH  -- 64-perm signatures, 16 bands x 4 rows, band-bucket
                   self-join for candidates, exact-Jaccard rerank. The
                   rerank makes the output equal to tier 2 above the
                   threshold (oracle-checkable); LSH only bounds the
                   candidate set. P(miss) for a j=0.9 pair ~ (1-0.9^4)^16
                   ~ 3e-9.
4. SimHash-48   -- 48-bit fingerprint from md5 nibble votes, expressed
                   with pure relational ops on BOTH engines (the SQL is
                   generated from the same nibble loop).

All hashing is md5-based because md5 is bit-identical across Spark and
DuckDB; Spark-only xxhash64 appears solely inside the (non-oracle-visible)
MinHash permutations.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.queries.registry import load, query

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


def _shingles(d: DataFrame) -> DataFrame:
    """doc_id -> distinct word-3-gram shingle array (JVM-side).

    The input is repartitioned first: the test corpus is a single parquet
    row group (one task), while shingling is embarrassingly parallel
    per-doc work. On a real multi-file 100 TB table the scan already
    yields thousands of splits and this repartition collapses into AQE
    coalescing.
    """
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    words = F.split("text", " ")
    n = F.size(words)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
                F.element_at(words, i + 3),
            ),
        )
    )
    return d.select("doc_id", sh.alias("sset"))


def _exact_jaccard_pairs(d: DataFrame, threshold: float) -> DataFrame:
    """Scalable exact-Jaccard pairs: explode-join on shingle, no cross join."""
    sh = _shingles(d)
    exploded = sh.select("doc_id", F.explode("sset").alias("shingle"))
    sizes = sh.select("doc_id", F.size("sset").alias("n"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    j = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", j.alias("j"))
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
# (1 - 0.9^2)^16 ~ 4e-12; halving signature width halves the codegen
# compile cost of the wide min-aggregate (the cold-run dominant term).
_N_PERM = 32
_BANDS = 16
_ROWS = _N_PERM // _BANDS
_rng = random.Random(42)
_PERMS = [(_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(_N_PERM)]


@query("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup detection with exact-Jaccard rerank.

    Signature: 64 universal-hash permutations of xxhash64(shingle);
    candidates from 16-band bucket self-join; rerank computes exact
    Jaccard on the candidate pairs only. Output == the exact pair query
    (the oracle), but the work at scale is bounded by LSH buckets instead
    of the full shingle-overlap join.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    sh = _shingles(d).persist()
    # Signature via explode + 64 codegen'd min-aggregates: higher-order
    # array lambdas are interpreted in Spark, so the exploded form with
    # whole-stage-codegen hash aggregation is the fast path; the map-side
    # partial combine collapses each doc to one 64-long row before the
    # (tiny) shuffle.
    exploded = sh.select("doc_id", F.explode("sset").alias("shingle"))
    base = F.pmod(F.xxhash64("shingle"), F.lit(_P))
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.lit(a) * base + F.lit(b), F.lit(_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(_PERMS)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{bi * _ROWS + r}") for r in range(_ROWS)]
                        ).alias("sig"),
                    )
                    for bi in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
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
    # exact rerank on candidates only
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    j = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        candidates.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", j.alias("j"))
        .filter(F.col("j") >= 0.8)
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
