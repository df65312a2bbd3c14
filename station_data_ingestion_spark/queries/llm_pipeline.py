"""Training-data pipeline assembly operators over the documents table:
context-window packing, stratified sampling, weighted source mixing.

These are the steps BETWEEN curation (dedup/quality, llm_dedup/
llm_quality) and the trainer: deciding which documents go into the run
and how they pack into fixed token budgets. All three are deterministic
(hash- and order-based, never RNG) so resuming or re-running a 100 TB
job reproduces the same mixture bit-for-bit -- the same engine-stability
rules as the rest of the registry (md5-bucket pattern proven in
split_train_test_hash; integer sums only).

[reference: none -- beyond the reference's surface; SURVEY §2.9
training-pipeline category]
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.operators.prefix_sum import ordered_prefix_sum
from station_data_ingestion_spark.queries.registry import load, query

_BIN_TOKENS = 2048


@query(
    "pack_sequential_token_bins",
    f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT CAST((cum - n_tokens) // {_BIN_TOKENS} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY 1
""",
)
def pack_sequential_token_bins(spark, sf_dir):
    """Pack documents (in doc_id order) into sequential ~2048-token
    context bins: bin = floor(preceding-token-count / 2048).

    The global running token count uses the distributed two-phase
    prefix sum (operators/prefix_sum.py), NOT an unpartitioned window,
    so the pack plan holds at corpus scale. Integer token counts make
    the cumsum engine-exact.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    c = ordered_prefix_sum(toks, ["doc_id"], "n_tokens", out_col="cum")
    return (
        c.withColumn("bin_id", F.expr(f"(cum - n_tokens) div {_BIN_TOKENS}"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "sample_stratified_hash",
    """
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS BIGINT) % 1000 AS bucket
  FROM documents
),
r AS (
  SELECT doc_id, lang, bucket,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rk
  FROM b
)
SELECT lang, doc_id, bucket, rk FROM r WHERE rk <= 5
""",
)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic stratified sample: 5 docs per language, chosen by
    md5-bucket order (a seedless, repartition-stable 'random' draw --
    df.sample's RNG is partition-dependent, this is not). One shuffle
    on lang; at scale the per-stratum top-k keeps only k rows per
    partition before the final merge."""
    d = load(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000
    )
    b = d.select("doc_id", "lang", bucket.alias("bucket"))
    w = Window.partitionBy("lang").orderBy("bucket", "doc_id")
    return (
        b.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "doc_id", "bucket", "rk")
    )


@query(
    "mixture_weighted_sources",
    """
WITH b AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS BIGINT) % 1000 AS bucket,
         (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 250 AS keep_below
  FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN bucket < keep_below THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       MAX(keep_below) AS keep_below
FROM b GROUP BY source
""",
)
def mixture_weighted_sources(spark, sf_dir):
    """Weighted source mixture: each source keeps a deterministic
    hash-fraction of its documents (weights 0.25/0.50/0.75/1.00 cycling
    by source index). The keep decision is per-row with no shuffle; the
    report aggregates per source. Changing the mixture re-selects a
    superset/subset, never a reshuffle -- the property that lets a
    100 TB mixture be tuned incrementally."""
    d = load(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000
    )
    keep_below = (
        F.substring("source", 4, 10).cast("long") % 4 + 1
    ) * 250
    b = d.select(
        "source", bucket.alias("bucket"), keep_below.alias("keep_below")
    )
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("bucket") < F.col("keep_below"), 1).otherwise(0)).alias(
            "n_kept"
        ),
        F.max("keep_below").alias("keep_below"),
    )


@query(
    "interleave_sources_roundrobin",
    """
WITH rn AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
           AS source_seq
  FROM documents
)
SELECT doc_id, source, source_seq,
       CAST(ROW_NUMBER() OVER (ORDER BY source_seq, source, doc_id) AS BIGINT)
         AS interleave_pos
FROM rn
""",
)
def interleave_sources_roundrobin(spark, sf_dir):
    """Deterministic round-robin interleave of sources: doc k of every
    source precedes doc k+1 of any source (curriculum mixing without an
    RNG). The global interleave position is a distributed row number --
    the two-phase prefix sum over ones -- so no single-partition window
    appears anywhere in the plan, unlike the oracle's ROW_NUMBER()
    OVER (ORDER BY ...) which DuckDB runs single-node anyway."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("source").orderBy("doc_id")
    rn = d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("source_seq"),
    )
    return ordered_prefix_sum(
        rn, ["source_seq", "source", "doc_id"], F.lit(1),
        out_col="interleave_pos",
    )


@query(
    "pipeline_curate_dedup_pack",
    f"""
WITH gated AS (
  SELECT doc_id, text, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS BIGINT) % 1000 AS bucket,
         (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 250 AS keep_below
  FROM documents
  WHERE n_chars >= 80 AND lang IN ('en', 'de', 'fr', 'es')
),
mixed AS (SELECT doc_id, text FROM gated WHERE bucket < keep_below),
deduped AS (
  SELECT MIN(doc_id) AS doc_id,
         CAST(len(string_split(MIN_BY(text, doc_id), ' ')) AS BIGINT)
           AS n_tokens
  FROM mixed GROUP BY md5(text)
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM deduped
)
SELECT CAST((cum - n_tokens) // {_BIN_TOKENS} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY 1
""",
)
def pipeline_curate_dedup_pack(spark, sf_dir):
    """The flagship composition: quality gate -> weighted mixture ->
    exact dedup (keep lowest doc_id per text hash) -> sequential token
    packing, as ONE lazy plan. Stage shapes: the gate and mixture are
    scan-local predicates (pushed to parquet where possible), dedup is
    one shuffle on md5(text), packing is the single-shuffle distributed
    prefix sum -- three data movements total for the whole curation
    pipeline, each on a different key, none avoidable at 100 TB."""
    d = load(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000
    )
    keep_below = (F.substring("source", 4, 10).cast("long") % 4 + 1) * 250
    mixed = (
        d.filter(
            (F.col("n_chars") >= 80) & F.col("lang").isin("en", "de", "fr", "es")
        )
        .filter(bucket < keep_below)
        .select("doc_id", "text")
    )
    deduped = (
        mixed.groupBy(F.md5("text").alias("__h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    c = ordered_prefix_sum(deduped, ["doc_id"], "n_tokens", out_col="cum")
    return (
        c.withColumn("bin_id", F.expr(f"(cum - n_tokens) div {_BIN_TOKENS}"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "pipeline_curriculum_phases",
    """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY n_tokens, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
tot AS (SELECT SUM(n_tokens) AS total FROM t)
SELECT LEAST(2, CAST(((cum - n_tokens) * 3) // total AS BIGINT)) AS phase,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM c, tot GROUP BY 1
""",
)
def pipeline_curriculum_phases(spark, sf_dir):
    """Curriculum ordering: docs sorted easy-to-hard (shortest first,
    doc_id tiebreak) and split into 3 phases of equal TOKEN budget, not
    equal doc count — the split an LLM trainer actually wants.

    The global running token count reuses the distributed two-phase
    prefix sum; the grand total attaches as a one-row broadcast (how
    Spark executes scalar subqueries). Integer arithmetic throughout
    makes phase boundaries engine-exact.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    c = ordered_prefix_sum(toks, ["n_tokens", "doc_id"], "n_tokens", out_col="cum")
    total = toks.agg(F.sum("n_tokens").alias("total"))
    phase = F.least(
        F.lit(2).cast("long"), F.expr("((cum - n_tokens) * 3) div total")
    )
    return (
        c.crossJoin(F.broadcast(total))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("phase_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "pipeline_deterministic_shuffle",
    """
WITH r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rk
  FROM documents
)
SELECT doc_id, rk FROM r WHERE rk <= 100
""",
)
def pipeline_deterministic_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle: global shuffle order = md5(doc_id)
    (seedless, partitioning-independent — df.sample/rand are neither),
    ranks assigned via the distributed prefix sum instead of a
    single-partition ROW_NUMBER window. A trainer derives epoch N's
    order by salting the hash with N."""
    d = load(spark, sf_dir, "documents")["documents"]
    keyed = d.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    ranked = ordered_prefix_sum(
        keyed.withColumn("__one", F.lit(1)),
        ["__h", "doc_id"],
        "__one",
        out_col="rk",
    )
    return ranked.filter(F.col("rk") <= 100).select("doc_id", "rk")


@query(
    "pipeline_quality_upsampling",
    """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         CASE WHEN len(string_split(text, ' ')) >= 24 THEN 3
              WHEN len(string_split(text, ' ')) >= 16 THEN 2
              ELSE 1 END AS n_copies
  FROM documents
)
SELECT n_copies AS tier,
       COUNT(*) AS n_docs,
       CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
       CAST(SUM(CAST(n_tokens AS BIGINT) * n_copies) AS BIGINT)
           AS tokens_out
FROM t GROUP BY n_copies
""",
)
def pipeline_quality_upsampling(spark, sf_dir):
    """Repetition-based upsampling (the data-mixing knob that repeats
    high-quality docs N epochs): copies materialize via
    explode(sequence(1, n)) — a narrow per-row op, no shuffle until the
    audit aggregation. The gate compares the post-explosion row/token
    accounting."""
    d = load(spark, sf_dir, "documents")["documents"]
    n_tokens = F.size(F.split("text", " "))
    n_copies = (
        F.when(n_tokens >= 24, 3).when(n_tokens >= 16, 2).otherwise(1)
    )
    exploded = d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_copies.alias("n_copies"),
    ).withColumn("copy_i", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
    return exploded.groupBy(F.col("n_copies").alias("tier")).agg(
        F.count(F.lit(1)).alias("n_rows_out") ,
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_out"),
    ).select("tier", "n_docs", "n_rows_out", "tokens_out")


@query(
    "sample_exact_quota_per_source",
    """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 16), doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 10
""",
)
def sample_exact_quota_per_source(spark, sf_dir):
    """EXACT-quota stratified sampling: exactly min(10, |stratum|) docs
    per source, selected by deterministic hash rank — the fixed-budget
    eval-set / holdout draw where proportional hash sampling (the
    sibling query) can't hit quotas exactly. Runs through the two-phase
    grouped top-k operator: per-partition Arrow partial pruning means
    only <= partitions x strata x k contenders reach the exchange —
    never a full per-stratum sort of the corpus. The hash rank is an
    md5 prefix, identical in both engines."""
    from station_data_ingestion_spark.operators.topk import grouped_topk

    d = load(spark, sf_dir, "documents")["documents"]
    keyed = d.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 16
                    ).alias("hk"),
    )
    picked = grouped_topk(
        keyed, ["source"], [("hk", False), ("doc_id", False)], k=10
    )
    return picked.select("doc_id", "source", F.col("rk").cast("long"))


@query(
    "mixture_token_budget_cap",
    """
WITH toks AS (
  SELECT doc_id, source,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
           AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY rk, doc_id) AS cum
  FROM toks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM c WHERE cum <= 20000
GROUP BY source
""",
)
def mixture_token_budget_cap(spark, sf_dir):
    """TOKEN-BUDGET domain mixing — the knob a pretraining recipe
    actually turns ("20k tokens of each source this epoch"): docs are
    ordered per source by a deterministic md5 shuffle (reproducible on
    any partitioning or retry, unlike rand()) and kept while the
    running token total stays within budget. The prefix sum runs
    per-source (partitioned window — each source's series is
    independent, so no global single-partition window exists anywhere;
    a skew-heavy source would use the two-phase distributed prefix sum
    in operators/prefix_sum.py, same semantics). Whitespace token
    counts stay INTEGER end to end."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        "source",
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        )
        .cast("long")
        .alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("rk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = toks.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.filter(F.col("cum") <= 20000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
    )


@query(
    "mixture_dsir_importance",
    """
WITH tok AS (
  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS word
  FROM documents
), vocab AS (
  SELECT word,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS ct,
         CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS cs
  FROM tok GROUP BY word
), tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cs) AS BIGINT) AS ts_,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM vocab
), w AS (
  SELECT word,
         CAST(ROUND(log2(((ct + 1) * 1.0 / (tt + v))
                         / ((cs + 1) * 1.0 / (ts_ + v))) * 1000000)
              AS BIGINT) AS ubits
  FROM vocab CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w.ubits) AS BIGINT) AS dsir_ubits
FROM tok t JOIN w USING (word)
WHERE t.source <> 'src0'
GROUP BY t.doc_id
""",
)
def mixture_dsir_importance(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every candidate
    document by how target-like its unigram distribution is —
    sum over tokens of log(p_target/p_raw) with add-1 smoothing, here
    with src0 as the target domain and the rest as the raw pool. The
    published pipeline then Gumbel-resamples by these weights; the
    deterministic, oracle-checkable part is the weight computation
    itself. Per-word log-ratios are rounded to integer MICROBITS before
    the per-doc sum (the text_unigram_logprob contract), so the
    aggregate is associative integer math — bit-identical on any
    partitioning. Plan: one vocab groupBy, the token→weight join
    broadcasts the vocabulary, one doc groupBy — at 100 TB the
    vocabulary table is the only state, exactly DSIR's hashed-ngram
    design point."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = tok.groupBy("word").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("source") != "src0", 1).otherwise(0))
        .cast("long")
        .alias("cs"),
    )
    tot = vocab.agg(
        F.sum("ct").cast("long").alias("tt"),
        F.sum("cs").cast("long").alias("ts_"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    w = vocab.join(F.broadcast(tot)).select(
        "word",
        F.round(
            F.log2(
                ((F.col("ct") + 1) * 1.0 / (F.col("tt") + F.col("v")))
                / ((F.col("cs") + 1) * 1.0 / (F.col("ts_") + F.col("v")))
            )
            * 1000000
        )
        .cast("long")
        .alias("ubits"),
    )
    return (
        tok.filter(F.col("source") != "src0")
        .join(F.broadcast(w), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("ubits").cast("long").alias("dsir_ubits"),
        )
    )


@query(
    "mixture_temperature_reweight",
    """
WITH s AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, tokens, sqrt(CAST(tokens AS DOUBLE)) AS raw
  FROM s
), tot AS (SELECT SUM(raw) AS z FROM w)
SELECT source,
       tokens,
       ROUND(raw / z, 6) AS weight,
       CAST(FLOOR(raw / z * 1000000) AS BIGINT) AS ppm_budget
FROM w CROSS JOIN tot
ORDER BY source
""",
)
def mixture_temperature_reweight(spark, sf_dir):
    """TEMPERATURE-scaled sampling weights (T=2, i.e. tokens^(1/2)
    renormalized): the standard multilingual/multi-source rebalance
    that upsamples small sources without letting any source dominate.
    One scan aggregates per-source token counts; sqrt + the normalizer
    are a 20-row one-row-broadcast attach. The per-source sampling
    budget is emitted in exact PPM via FLOOR so the integer column
    can't drift between engines."""
    d = load(spark, sf_dir, "documents")["documents"]
    s = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    w = s.withColumn("raw", F.sqrt(F.col("tokens").cast("double")))
    tot = w.agg(F.sum("raw").alias("z")).withColumn("_k", F.lit(1))
    return (
        w.withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .select(
            "source",
            "tokens",
            F.round(F.col("raw") / F.col("z"), 6).alias("weight"),
            F.floor(F.col("raw") / F.col("z") * 1000000)
            .cast("long")
            .alias("ppm_budget"),
        )
        .orderBy("source")
    )


@query(
    "pipeline_truncation_loss_curve",
    """
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
), grid AS (
  SELECT L FROM (VALUES (64), (128), (256), (512)) AS g(L)
)
SELECT CAST(g.L AS BIGINT) AS max_len,
       CAST(COUNT(CASE WHEN t.n > g.L THEN 1 END) AS BIGINT)
         AS docs_truncated,
       CAST(SUM(GREATEST(t.n - g.L, 0)) AS BIGINT) AS tokens_lost,
       CAST(SUM(t.n) AS BIGINT) AS tokens_total,
       CAST(SUM(GREATEST(t.n - g.L, 0)) * 1000000
            // SUM(t.n) AS BIGINT) AS loss_ppm
FROM toks t CROSS JOIN grid g
GROUP BY g.L
""",
)
def pipeline_truncation_loss_curve(spark, sf_dir):
    """CONTEXT-LENGTH TRUNCATION LOSS CURVE: for each candidate
    max-sequence-length, how many documents truncate and what fraction
    of corpus tokens is lost — the one-pass diagnostic that picks a
    packing length before a training run. The 4-value length grid
    explodes from a literal array against the per-doc token counts
    (bounded fan-out: 4 rows per doc, never a join against data), and
    the loss fraction ships as an exact integer ppm (integer division
    both sides). At 100 TB this is one scan + one 4-group aggregate."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(F.size(F.split("text", " ")).alias("n"))
    fan = toks.select(
        "n", F.explode(F.array(*[F.lit(x) for x in (64, 128, 256, 512)])).alias("L")
    )
    return fan.groupBy(F.col("L").cast("long").alias("max_len")).agg(
        F.count(F.when(F.col("n") > F.col("L"), 1))
        .cast("long")
        .alias("docs_truncated"),
        F.sum(F.greatest(F.col("n") - F.col("L"), F.lit(0)))
        .cast("long")
        .alias("tokens_lost"),
        F.sum("n").cast("long").alias("tokens_total"),
        F.expr(
            "CAST(sum(greatest(n - L, 0)) * 1000000 div sum(n) AS BIGINT)"
        ).alias("loss_ppm"),
    )


@query(
    "pipeline_epoch_shard_assignment",
    """
WITH d AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5('ep1-' || doc_id), 1, 8)) AS UBIGINT)
              % 32 AS BIGINT) AS shard,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
           AS toks
  FROM documents
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS tokens
  FROM d GROUP BY shard
), tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM per)
SELECT shard, n_docs, tokens,
       CAST(tokens * 10000 // tot.t AS BIGINT) AS share_bp
FROM per, tot
""",
)
def pipeline_epoch_shard_assignment(spark, sf_dir):
    """Deterministic epoch sharding — the step that turns a curated
    corpus into reproducible training shards: shard = md5('ep1-'||id)
    % 32, so assignment is stable under retries, re-runs and any
    partitioning (new epoch = new salt, a full reshuffle with zero
    coordination). Ships the per-shard doc/token balance with integer
    basis-point shares against a one-row total broadcast — the
    imbalance audit that decides whether hash sharding suffices or a
    bin-packing pass is needed. One scan, one aggregation; at 100 TB
    the shard count rises with the same plan."""
    d = load(spark, sf_dir, "documents")["documents"]
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ep1-"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    per = (
        d.select(
            (u32 % 32).alias("shard"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                + 1
            )
            .cast("long")
            .alias("toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("tokens"),
        )
    )
    tot = per.agg(F.sum("tokens").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "tokens",
        F.expr("tokens * 10000 div t").cast("long").alias("share_bp"),
    )
