"""Sub-document dedup + repetition-quality + term-weighting + quantization.

Training-data curation operators beyond whole-document granularity:

- passage-level exact dedup (fixed-width word windows, the CCNet/RefinedWeb
  move of deduplicating spans rather than whole documents),
- Gopher-style repetition filters (top-word / top-bigram mass per doc),
- TF-IDF top terms per document (integer-exact scoring so the ranking is
  engine-stable),
- int8 scalar quantization of embedding vectors (the storage/ANN-recall
  trade every vector pipeline makes before indexing at scale).

Determinism rules follow registry.py: integer arithmetic wherever a
ranking or a hash depends on it; fractions exported as ROUND(1000*k/n)
permille BIGINTs (with denominators this small the true value is never
exactly halfway, and both engines round identical IEEE doubles
away-from-zero, so the integer is engine-stable); every SUM cast to
BIGINT so DuckDB never widens to HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query

_PASSAGE_W = 8  # words per passage window


@query(
    "dedup_passage_exact",
    f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[i * {_PASSAGE_W} + 1 : i * {_PASSAGE_W} + {_PASSAGE_W}], ' ')
             AS passage
  FROM base, UNNEST(range(0, len(w) // {_PASSAGE_W})) AS t(i)
),
ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
  FROM occ
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       CAST(ROUND(1000.0 * SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / COUNT(*))
            AS BIGINT) AS dup_permille
FROM ranked GROUP BY doc_id
""",
)
def dedup_passage_exact(spark, sf_dir):
    """Passage-level exact dedup: split each document into non-overlapping
    8-word windows, mark every window whose text already occurred earlier
    in corpus order (first occurrence = min (doc_id, pos)), report the
    duplicated-passage fraction per document.

    Scale shape: one explode (rows x ~n_words/8), one shuffle on the
    passage string for the first-occurrence window, one shuffle back on
    doc_id -- no self-join, no pair blowup, so a heavily-duplicated crawl
    costs the same as a clean one. Trailing words short of a full window
    are dropped on both engines.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    w = _PASSAGE_W
    occ = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            # Spark's sequence(0, n-1) runs DESCENDING when n-1 < 0
            # (unlike DuckDB's empty range), so short docs need the guard
            F.posexplode(
                F.expr(
                    f"CASE WHEN size(w) >= {w} THEN"
                    f" transform(sequence(0, size(w) div {w} - 1),"
                    f" i -> array_join(slice(w, i * {w} + 1, {w}), ' '))"
                    f" ELSE array() END"
                )
            ).alias("pos", "passage"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("passage").orderBy("doc_id", "pos")
    )
    dup = (F.col("rn") > 1).cast("long")
    return (
        occ.withColumn("rn", rn)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(dup).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            F.round(1000.0 * F.col("n_dup_passages") / F.col("n_passages"))
            .cast("long")
            .alias("dup_permille"),
        )
    )


@query(
    "text_repetition_gopher",
    """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
uni AS (
  SELECT doc_id, MAX(c) AS top_uni_n FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(w) AS g FROM base)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
bi AS (
  SELECT doc_id, MAX(c) AS top_bi_n FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id,
                 UNNEST(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i + 1])) AS g
          FROM base)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT base.doc_id,
       CAST(len(base.w) AS BIGINT) AS n_words,
       uni.top_uni_n,
       COALESCE(bi.top_bi_n, 0) AS top_bi_n,
       CAST(ROUND(1000.0 * uni.top_uni_n / len(base.w)) AS BIGINT)
           AS top_word_permille,
       CAST(ROUND(1000.0 * 2 * COALESCE(bi.top_bi_n, 0) / len(base.w))
            AS BIGINT) AS top_bigram_permille,
       CAST(10 * uni.top_uni_n > len(base.w)
            OR 100 * 2 * COALESCE(bi.top_bi_n, 0) > 18 * len(base.w)
            AS INT) AS flagged
FROM base
JOIN uni ON base.doc_id = uni.doc_id
LEFT JOIN bi ON base.doc_id = bi.doc_id
""",
)
def text_repetition_gopher(spark, sf_dir):
    """Gopher-style repetition quality gate: per document, the count mass
    of the most frequent word and most frequent word-bigram; a document is
    flagged when the top word exceeds 10% of tokens or the top bigram
    exceeds 18% (2 words per occurrence). Thresholds compared in exact
    integer arithmetic so the flag can't flip between engines.

    Scale shape: explode -> count per (doc, gram) -> max per doc, i.e.
    partial-aggregated shuffles keyed by (doc_id, gram) then doc_id; the
    doc-level joins co-partition on doc_id. Documents with a single word
    have no bigram row, hence the LEFT join + 0 default.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    base = d.select("doc_id", F.split("text", " ").alias("w"))

    def top_count(grams, out):
        return (
            base.select("doc_id", F.explode(grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(out))
        )

    # same descending-sequence guard for one-word documents
    bigrams = F.expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        " ELSE array() END"
    )
    uni = top_count(F.col("w"), "top_uni_n")
    bi = top_count(bigrams, "top_bi_n")
    n_words = F.size("w").cast("long")
    joined = (
        base.join(uni, "doc_id")
        .join(bi, "doc_id", "left")
        .withColumn("top_bi_n", F.coalesce("top_bi_n", F.lit(0).cast("long")))
    )
    return joined.select(
        "doc_id",
        n_words.alias("n_words"),
        "top_uni_n",
        "top_bi_n",
        F.round(1000.0 * F.col("top_uni_n") / n_words).cast("long")
        .alias("top_word_permille"),
        F.round(1000.0 * 2 * F.col("top_bi_n") / n_words).cast("long")
        .alias("top_bigram_permille"),
        (
            (10 * F.col("top_uni_n") > n_words)
            | (100 * 2 * F.col("top_bi_n") > 18 * n_words)
        ).cast("int").alias("flagged"),
    )


@query(
    "text_tfidf_top_terms",
    """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * CAST(FLOOR(1000000.0 * n.n_docs / df.df) AS BIGINT) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score
FROM ranked WHERE rnk <= 3
""",
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. IDF is the integer
    floor(1e6 * N / df) -- monotone in the real ln(N/df) ranking for a
    fixed N, and exact integer multiplication keeps the (score, term)
    ordering bit-identical across engines (a float log would differ in
    the last ulp and flip near-ties).

    Scale shape: tf = one shuffle on (doc_id, term); df = one shuffle on
    term; the tf<->df equi-join shuffles on term (df is corpus-vocab
    sized -- broadcastable for natural-language vocabularies, left to AQE
    here); corpus size N is a one-row aggregate broadcast, never a
    collect.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * F.floor(1000000.0 * F.col("n_docs") / F.col("df")).cast("long")
            ).alias("score"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    )
    return (
        scored.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "df", "score")
    )


@query(
    "sim_vector_quantize_int8",
    """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, label, e,
         127.0 / list_aggregate(list_transform(e, x -> abs(x)), 'max') AS scale
  FROM v
  WHERE list_aggregate(list_transform(e, x -> abs(x)), 'max') > 0
),
q AS (
  SELECT vec_id, label, scale,
         list_transform(e, x -> CAST(ROUND(x * scale) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, label,
       CAST(list_aggregate(list_transform(qv, x -> abs(x)), 'sum') AS BIGINT)
           AS l1_q,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_saturated,
       CAST(ROUND(scale * 1000000) AS BIGINT) AS scale_ppm
FROM q
""",
)
def sim_vector_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization of embedding vectors: per-vector
    scale = 127 / max|x|, q_i = round(x_i * scale). Reports the quantized
    L1 norm, saturated-dim count, and the scale in ppm -- the integrity
    stats a vector pipeline checks before swapping float32 for int8 (4x
    smaller index, SIMD-int distance kernels).

    Engine-stable because float32 -> double widening is exact and every
    subsequent op (abs, max, correctly-rounded double mul/div,
    round-half-away-from-zero to an integer) is identical IEEE arithmetic
    on both engines. Zero vectors are excluded by the same predicate on
    both sides. Purely per-row (no shuffle at all): at 100 TB this is one
    narrow map stage.
    """
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    e = F.transform("embedding", lambda x: x.cast("double"))
    amax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    v = emb.select("vec_id", "label", e.alias("e"), amax.alias("amax")).filter(
        F.col("amax") > 0
    )
    scale = F.lit(127.0) / F.col("amax")
    qv = F.transform("e", lambda x: F.round(x * scale).cast("long"))
    q = v.select("vec_id", "label", scale.alias("scale"), qv.alias("qv"))
    return q.select(
        "vec_id",
        "label",
        F.aggregate(
            F.transform("qv", lambda x: F.abs(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("l1_q"),
        F.size(F.filter("qv", lambda x: F.abs(x) == 127)).cast("long")
        .alias("n_saturated"),
        F.round(F.col("scale") * 1000000).cast("long").alias("scale_ppm"),
    )
