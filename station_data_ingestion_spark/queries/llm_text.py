"""Text analysis operators for LLM data pipelines over `documents`.

Quality scoring, language-ID heuristic, token statistics, rolling-hash
fingerprints -- all pure JVM expressions (no Python UDFs in the hot
path), each with a portable SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


@query(
    "text_quality_features",
    f"""
WITH feat AS (
  SELECT doc_id, lang, source, n_chars,
         string_split(text, ' ') AS words,
         LENGTH(text) AS len_chars,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id, lang, source,
       CAST(len(words) AS BIGINT) AS n_tokens,
       ROUND(CAST(len_chars AS DOUBLE) / len(words), 4) AS chars_per_token,
       ROUND(CAST(n_punct AS DOUBLE) / len_chars, 6) AS punct_ratio,
       ROUND(CAST(len(list_filter(words, w -> list_contains({_SW_LIST_SQL}, w)))
             AS DOUBLE) / len(words), 6) AS stopword_ratio,
       CAST(len_chars = n_chars AS INT) AS n_chars_consistent
FROM feat
""",
)
def text_quality_features(spark, sf_dir):
    """Per-document quality features: token count, chars/token,
    punctuation ratio, stopword ratio."""
    d = load(spark, sf_dir, "documents")["documents"]
    words = F.split("text", " ")
    len_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.size(words).cast("long").alias("n_tokens"),
        F.round(len_chars.cast("double") / F.size(words), 4).alias("chars_per_token"),
        F.round(n_punct.cast("double") / len_chars, 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / F.size(words), 6).alias("stopword_ratio"),
        (len_chars == F.col("n_chars")).cast("int").alias("n_chars_consistent"),
    )


_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("de", "le", "shi"),
}


def _marker_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(words, w -> list_contains({lst}, w)))"


@query(
    "text_lang_id_agreement",
    f"""
WITH scored AS (
  SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
), hits AS (
  SELECT doc_id, lang,
         {_marker_sql('en')} AS s_en, {_marker_sql('es')} AS s_es,
         {_marker_sql('fr')} AS s_fr, {_marker_sql('de')} AS s_de,
         {_marker_sql('zh')} AS s_zh
  FROM scored
), pred AS (
  SELECT doc_id, lang,
         CASE GREATEST(s_en, s_es, s_fr, s_de, s_zh)
              WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
              WHEN s_de THEN 'de' ELSE 'zh' END AS predicted
  FROM hits
)
SELECT lang, predicted, COUNT(*) AS n FROM pred GROUP BY lang, predicted
""",
)
def text_lang_id_agreement(spark, sf_dir):
    """Heuristic n-gram/stopword language ID vs the labeled lang column.

    Ties resolve in fixed order en>es>fr>de>zh (the CASE tries them in
    that order on both engines)."""
    d = load(spark, sf_dir, "documents")["documents"]
    words = F.split("text", " ")

    def score(lang: str):
        markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(words, lambda w: F.array_contains(markers, w)))

    scores = {lang: score(lang).alias(f"s_{lang}") for lang in _LANG_MARKERS}
    hits = d.select("doc_id", "lang", *scores.values())
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_MARKERS])
    pred = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_de") == best, "de")
        .otherwise("zh")
    )
    return hits.select("lang", pred.alias("predicted")).groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "text_token_frequencies",
    """
WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
SELECT token, COUNT(*) AS freq FROM toks GROUP BY token
ORDER BY freq DESC, token LIMIT 25
""",
)
def text_token_frequencies(spark, sf_dir):
    """Corpus token histogram, deterministic top-25."""
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(25)
    )


@query(
    "text_token_count_bpe_ish",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
           AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
FROM documents WHERE doc_id % 5 = 0
""",
)
def text_token_count_bpe_ish(spark, sf_dir):
    """Token counting two ways: whitespace and a BPE-ish regex segmenter
    (letters / digits / single punctuation)."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
    )


@query(
    "text_fingerprint_rolling_hash",
    """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1
                               AS BIGINT) * 16
                               + (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1))),
         (acc, x) -> (acc * 257 + x) % 1000000007) AS fingerprint
FROM documents
""",
)
def text_fingerprint_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash document fingerprint over token bytes
    (first md5 byte per token), mod 1e9+7 -- identical fold on both
    engines."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok_byte = lambda t: (
        (F.conv(F.substring(F.md5(t), 1, 1), 16, 10).cast("long") * 16)
        + F.conv(F.substring(F.md5(t), 2, 1), 16, 10).cast("long")
    )
    fp = F.aggregate(
        F.transform(F.split("text", " "), tok_byte),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 257 + x) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "text_corpus_curation",
    """
WITH hashed AS (
  SELECT doc_id, lang, source, text,
         md5(text) AS h,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
deduped AS (
  SELECT * FROM hashed
  WHERE doc_id = (SELECT MIN(h2.doc_id) FROM hashed h2 WHERE h2.h = hashed.h)
),
quality AS (
  SELECT * FROM deduped
  WHERE n_tokens >= 10
    AND CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        / len(text) < 0.1
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM quality GROUP BY lang, source
""",
)
def text_corpus_curation(spark, sf_dir):
    """End-to-end corpus curation: exact dedup (keep min-id per hash) ->
    quality gate (length + punctuation ratio) -> per-(lang, source)
    corpus stats. The composition a training-data pipeline runs before
    tokenization; each stage is one declarative pass (dedup = window min
    over the hash -- no self-join), so the whole curation is two shuffles
    (hash, then group keys) at any scale."""
    d = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("h")
    hashed = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    deduped = (
        hashed.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
    )
    punct_ratio = (
        F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("double")
        / F.length("text")
    )
    quality = deduped.filter(
        (F.col("n_tokens") >= 10) & (punct_ratio < 0.1)
    )
    return quality.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "split_train_test_hash",
    """
WITH assigned AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM assigned GROUP BY lang, split
""",
)
def split_train_test_hash(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test split by hashing the doc
    key -- the training-pipeline staple: stable across runs, engines, and
    repartitioning (unlike df.sample, whose RNG is partition-dependent),
    and requires no shuffle to assign. Bucket = first 8 md5 hex digits
    mod 100, identical arithmetic in both engines."""
    d = load(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    assigned = d.select("doc_id", "lang", bucket.alias("bucket"))
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
    )
    return assigned.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@query(
    "text_chunk_sliding_windows",
    """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
c AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
         CASE WHEN len(words) <= 16 THEN 1
              ELSE CAST(CEIL((len(words) - 16) / 12.0) AS BIGINT) + 1
         END AS n_chunks,
         md5(array_to_string(words[1:16], ' ')) AS first_chunk_md5
  FROM w
)
SELECT doc_id, n_tokens, n_chunks, first_chunk_md5,
       (n_chunks - 1) * 12 AS last_chunk_start
FROM c
""",
)
def text_chunk_sliding_windows(spark, sf_dir):
    """RAG chunking: overlapping sliding word windows (size 16, stride
    12) per document. The chunk arithmetic and first-chunk content hash
    are the verifiable fingerprint; production materializes one row per
    chunk with posexplode over the same arithmetic — per-doc narrow
    work, zero shuffles."""
    d = load(spark, sf_dir, "documents")["documents"]
    words = F.split("text", " ")
    n = F.size(words).cast("long")
    n_chunks = (
        F.when(n <= 16, F.lit(1).cast("long"))
        .otherwise(F.ceil((n - 16) / 12.0) + 1)
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        n_chunks.alias("n_chunks"),
        F.md5(F.concat_ws(" ", F.slice(words, 1, 16))).alias("first_chunk_md5"),
        ((n_chunks - 1) * 12).alias("last_chunk_start"),
    )


@query(
    "text_bigram_stats",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
corpus AS (SELECT w1, w2, COUNT(*) AS cf FROM b GROUP BY w1, w2)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       COUNT(DISTINCT b.w1 || '|' || b.w2) AS n_unique,
       CAST(MAX(corpus.cf) AS BIGINT) AS max_corpus_freq,
       CAST(SUM(corpus.cf) AS BIGINT) AS sum_corpus_freq
FROM b JOIN corpus ON b.w1 = corpus.w1 AND b.w2 = corpus.w2
WHERE b.doc_id % 5 = 0
GROUP BY b.doc_id
""",
)
def text_bigram_stats(spark, sf_dir):
    """Corpus n-gram language statistics: per-doc bigram counts joined
    against corpus-wide bigram frequencies (the integer core of an
    n-gram LM / perplexity-proxy filter, kept float-free so the gate is
    engine-exact; a real LM scorer takes ln of the same counts).

    Shape: posexplode -> lead() within doc partitions -> one shuffle on
    the bigram key for corpus counts -> join back -> one shuffle on
    doc_id. The corpus-count table is the only broadcast candidate and
    AQE decides.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("doc_id").orderBy("pos")
    b = (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1"))
        .withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    corpus = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cf"))
    return (
        b.filter(F.col("doc_id") % 5 == 0)
        .join(corpus, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count_distinct(F.concat_ws("|", "w1", "w2")).alias("n_unique"),
            F.max("cf").alias("max_corpus_freq"),
            F.sum("cf").alias("sum_corpus_freq"),
        )
    )


@query(
    "text_bigram_novelty",
    """
WITH bg AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(words)),
         i -> words[i] || ' ' || words[i+1])) AS bs
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
),
x AS (SELECT doc_id, UNNEST(bs) AS b FROM bg),
df AS (SELECT b, COUNT(*) AS d FROM x GROUP BY b),
per AS (
  SELECT x.doc_id, COUNT(*) AS n_bigrams,
         SUM(CASE WHEN df.d = 1 THEN 1 ELSE 0 END) AS n_unique
  FROM x JOIN df USING (b) GROUP BY x.doc_id
)
SELECT doc_id, n_bigrams, CAST(n_unique AS BIGINT) AS n_unique,
       CAST(ROUND(1000000.0 * n_unique / n_bigrams) AS BIGINT) AS novelty_ppm
FROM per
""",
)
def text_bigram_novelty(spark, sf_dir):
    """Per-document bigram NOVELTY: the fraction of a doc's distinct
    word bigrams appearing in NO other document (corpus df = 1) — a
    boilerplate/templating signal (low novelty = copy-heavy doc) that is
    exactly integer-countable, unlike LM log-prob scores whose float
    accumulation order drifts across engines. One shuffle on the bigram
    key (the corpus df), one join back, one per-doc aggregation."""
    d = load(spark, sf_dir, "documents")["documents"]
    w = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("words") - 1),
            lambda i: F.concat(
                F.element_at("words", i), F.lit(" "), F.element_at("words", i + 1)
            ),
        )
    )
    x = (
        d.select("doc_id", w.alias("words"))
        .filter(F.size("words") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
    )
    dfreq = x.groupBy("b").agg(F.count(F.lit(1)).alias("d"))
    per = x.join(dfreq, "b").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("d") == 1).cast("long")).alias("n_unique"),
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        "n_unique",
        F.round(1000000.0 * F.col("n_unique") / F.col("n_bigrams"))
        .cast("long")
        .alias("novelty_ppm"),
    )


@query(
    "text_bpe_pair_counts",
    """
WITH words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(
      regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' ')) AS word
    FROM documents
  ) WHERE length(word) >= 2
  GROUP BY word
),
pairs AS (
  SELECT substring(w.word, i, 1) || ' ' || substring(w.word, i + 1, 1)
           AS pair,
         w.freq
  FROM words w, unnest(generate_series(1, length(w.word) - 1)) AS t(i)
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""",
)
def text_bpe_pair_counts(spark, sf_dir):
    """BPE round-1 pair statistics (operators/bpe.py): the corpus
    compresses to (word, freq) and adjacent character pairs are counted
    weighted by frequency — the exact aggregation every trainer round
    runs, certified against DuckDB's recount. (Multi-round training
    needs greedy merge semantics SQL can't express; pytest verifies the
    full trainer against a Python reference — see tests/test_bpe.py.)"""
    from station_data_ingestion_spark.operators.bpe import (
        corpus_words,
        weighted_pair_counts,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    return (
        weighted_pair_counts(corpus_words(d))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@query(
    "text_skipgram_pairs",
    """
WITH arrs AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' ') AS arr
  FROM documents
),
toks AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id, unnest(arr) AS word,
           generate_subscripts(arr, 1) AS pos
    FROM arrs
  ) WHERE length(word) >= 2
),
seq AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS i
  FROM toks
),
pairs AS (
  SELECT a.word AS center, b.word AS context
  FROM seq a JOIN seq b
    ON a.doc_id = b.doc_id AND b.i - a.i IN (1, 2)
)
SELECT center, context, cnt FROM (
  SELECT center, context, COUNT(*) AS cnt FROM (
    SELECT center, context FROM pairs
    UNION ALL
    SELECT context AS center, center AS context FROM pairs
  ) GROUP BY center, context
) ORDER BY cnt DESC, center, context LIMIT 25
""",
)
def text_skipgram_pairs(spark, sf_dir):
    """Skip-gram (center, context) pair generation, window ±2 — the
    embedding-training co-occurrence stage. Bounded fan-out via
    lead(1)/lead(2) over per-doc position (each token emits ≤2 forward
    pairs, mirrored for the symmetric window) — never a per-doc
    self-join. Gaps from dropped short words close up first (positions
    re-rank AFTER filtering), matching the oracle's row_number."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""),
                " ",
            )
        ).alias("pos", "word"),
    ).where(F.length("word") >= 2)
    w = Window.partitionBy("doc_id").orderBy("pos")
    fwd = toks.select(
        F.col("word").alias("center"),
        F.lead("word", 1).over(w).alias("c1"),
        F.lead("word", 2).over(w).alias("c2"),
    )
    pairs = fwd.select(
        "center", F.explode(F.array("c1", "c2")).alias("context")
    ).where(F.col("context").isNotNull())
    sym = pairs.unionAll(
        pairs.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    return (
        sym.groupBy("center", "context")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "center", "context")
        .limit(25)
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


@query(
    "text_pii_redaction",
    f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-0'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' now'
         AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones
FROM aug
""",
)
def text_pii_redaction(spark, sf_dir):
    """PII masking pass for a training corpus: regex-redact email
    addresses and NANP test-range phone numbers, reporting per-doc
    match counts. The synthetic corpus has no PII, so deterministic
    PII is PLANTED identically in both engines and the redacted text
    itself is hash-compared — the real check is that the masking regex
    behaves identically under Java regex and RE2 (patterns stay inside
    the common dialect: classes, bounded reps, word boundaries). One
    narrow projection, all JVM codegen, no shuffle."""
    d = load(spark, sf_dir, "documents")["documents"]
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-0"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
    )


@query(
    "text_char_entropy",
    """
WITH chars AS (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '.')) AS ch FROM documents
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS entropy_bits
FROM counts GROUP BY doc_id
""",
)
def text_char_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the character distribution — the
    classic gibberish/compression-quality feature (low entropy = repeated
    filler, high = random noise). Algebraic form log2(n) - sum(c*log2 c)/n
    avoids materializing probabilities; one explode + two-level JVM
    aggregation, shuffling only (doc_id, char) counts."""
    d = load(spark, sf_dir, "documents")["documents"]
    counts = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit("."), F.lit(0))
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            4,
        ).alias("entropy_bits"),
    )


@query(
    "text_unigram_logprob",
    """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) AS f FROM tok GROUP BY word
), tot AS (
  SELECT SUM(f) AS n FROM freq
), scored AS (
  SELECT t.doc_id,
         CAST(ROUND(log2(CAST(tt.n AS DOUBLE) / fr.f) * 1000000)
              AS BIGINT) AS surprisal_ubits
  FROM tok t JOIN freq fr ON fr.word = t.word CROSS JOIN tot tt
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(surprisal_ubits) AS BIGINT) AS sum_surprisal_ubits,
       CAST(SUM(surprisal_ubits) // COUNT(*) AS BIGINT) AS avg_surprisal_ubits
FROM scored GROUP BY doc_id
""",
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram-LM document scoring (perplexity proxy): train word
    frequencies over the WHOLE corpus, then score each document by its
    total and mean surprisal -log2 p(word) — the cheap first-pass
    quality signal before an expensive model-based filter (low = dull
    boilerplate, high = rare-token noise). Per-word surprisal is
    rounded to integer microbits BEFORE summing, so the aggregate is
    associative integer math — bit-identical on any partitioning or
    engine. Plan: one vocab-sized groupBy, the token->freq join
    broadcasts the vocabulary (bounded by distinct words, not corpus
    size), one groupBy on doc_id."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    tot = freq.agg(F.sum("f").alias("n"))
    scored = (
        tok.join(F.broadcast(freq), "word")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log2(F.col("n").cast("double") / F.col("f")) * 1000000
            )
            .cast("long")
            .alias("surprisal_ubits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("surprisal_ubits").cast("long").alias("sum_surprisal_ubits"),
        F.expr("sum(surprisal_ubits) div count(*)")
        .cast("long")
        .alias("avg_surprisal_ubits"),
    )


@query(
    "text_heaps_law",
    """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id
), firsts AS (
  SELECT word, MIN(doc_id) AS first_doc FROM tok GROUP BY word
), new_per_doc AS (
  SELECT first_doc AS doc_id, COUNT(*) AS new_words FROM firsts GROUP BY first_doc
)
SELECT p.doc_id,
       CAST(SUM(p.n_tokens) OVER (ORDER BY p.doc_id) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(n.new_words, 0)) OVER (ORDER BY p.doc_id) AS BIGINT)
       AS cum_vocab
FROM per_doc p LEFT JOIN new_per_doc n ON n.doc_id = p.doc_id
""",
)
def text_heaps_law(spark, sf_dir):
    """Vocabulary-growth (Heaps'-law) curve: cumulative token count vs
    cumulative distinct vocabulary in doc_id order — the corpus
    diagnostic for vocab saturation and dedup leverage. Distinct-so-far
    NEVER keeps a running set: each word's first-occurrence doc comes
    from one groupBy(word), per-doc new-word counts from a second small
    aggregate, and both cumulatives run through the distributed
    two-phase prefix sum (range repartition + per-partition offsets) —
    no single-partition global window at any step."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sums,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    new_per_doc = (
        tok.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    joined = per_doc.join(new_per_doc, "doc_id", "left").fillna(
        0, subset=["new_words"]
    )
    cum = ordered_prefix_sums(
        joined,
        ["doc_id"],
        {"cum_tokens": "n_tokens", "cum_vocab": "new_words"},
    )
    return cum.select("doc_id", "cum_tokens", "cum_vocab")


_WIN_K = 4  # tokens per k-gram
_WIN_W = 5  # k-gram hashes per winnowing window


@query(
    "text_winnowing_dup_pairs",
    f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
kg AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - {_WIN_K} + 2),
            i -> substr(md5(array_to_string(w[i : i + {_WIN_K} - 1], ' ')), 1, 8))
         AS kh
  FROM base WHERE len(w) >= {_WIN_K}
),
fp AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(range(1, len(kh) - {_WIN_W} + 2),
            j -> list_min(kh[j : j + {_WIN_W} - 1])))) AS print
  FROM kg WHERE len(kh) >= {_WIN_W}
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.print = b.print AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
""",
)
def text_winnowing_dup_pairs(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/MOSS): hash every
    {_WIN_K}-token k-gram, slide a {_WIN_W}-hash window and keep each
    window's MINIMUM — the classic local fingerprinting scheme whose
    guarantee is that any shared run of >= w+k-1 tokens shares a
    fingerprint, while storing only ~2/(w+1) of the hashes. Hashes are
    md5 prefixes (the one hash both engines compute identically;
    lexicographic min replaces numeric min, same selection). The whole
    selection runs INSIDE array land per doc (transform + array_min —
    JVM codegen, zero explode) and only the ~1/3-sized fingerprint set
    is exploded into the pair self-join; ubiquitous fingerprints would
    get a df-cap at crawl scale exactly like the stop-shingle cap in
    the Jaccard join."""
    d = load(spark, sf_dir, "documents")["documents"]
    kg = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.expr(f"size(w) >= {_WIN_K}"))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, size(w) - {_WIN_K} + 1),"
                f" i -> substring(md5(cast(array_join(slice(w, i, {_WIN_K}),"
                f" ' ') as binary)), 1, 8))"
            ).alias("kh"),
        )
    )
    fp = (
        kg.filter(F.expr(f"size(kh) >= {_WIN_W}"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence(1, size(kh) - {_WIN_W} + 1),"
                    f" j -> array_min(slice(kh, j, {_WIN_W}))))"
                )
            ).alias("print"),
        )
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.print") == F.col("b.print"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@query(
    "text_js_divergence_sources",
    """
WITH tok AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
  WHERE source IN ('src0', 'src1')
), vocab AS (
  SELECT word,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS cp,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS cq
  FROM tok GROUP BY word
), tot AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
  FROM vocab
), terms AS (
  SELECT CASE WHEN cp > 0 THEN
           CAST(ROUND((cp * 1.0 / np) * log2((cp * 1.0 / np)
                / ((cp * 1.0 / np + cq * 1.0 / nq) / 2)) * 1000000000)
                AS BIGINT)
         ELSE 0 END AS tp,
         CASE WHEN cq > 0 THEN
           CAST(ROUND((cq * 1.0 / nq) * log2((cq * 1.0 / nq)
                / ((cp * 1.0 / np + cq * 1.0 / nq) / 2)) * 1000000000)
                AS BIGINT)
         ELSE 0 END AS tq
  FROM vocab CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(tp) AS BIGINT) AS kl_p_m_nanobits,
       CAST(SUM(tq) AS BIGINT) AS kl_q_m_nanobits,
       CAST(FLOOR((SUM(tp) + SUM(tq)) / 2.0) AS BIGINT) AS jsd_nanobits
FROM terms
""",
)
def text_js_divergence_sources(spark, sf_dir):
    """Jensen-Shannon divergence between two sources' unigram
    distributions — the standard domain-distance measure for corpus
    mixing decisions (symmetric, bounded [0,1] bit, defined even on
    disjoint vocabularies, unlike raw KL). JSD = (KL(p||m)+KL(q||m))/2
    with m the midpoint; per-word contribution terms are rounded to
    integer NANOBITS before summing (the unigram-logprob contract), so
    the corpus-level sums are associative integer math. One vocabulary
    groupBy + a one-row totals broadcast — at any scale the state is
    the vocabulary, never the corpus."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = tok.groupBy("word").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("cp"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("long")
        .alias("cq"),
    )
    tot = vocab.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cq").cast("long").alias("nq"),
    )
    p = F.col("cp") * 1.0 / F.col("np")
    q = F.col("cq") * 1.0 / F.col("nq")
    mid = (p + q) / 2
    terms = vocab.join(F.broadcast(tot)).select(
        F.when(
            F.col("cp") > 0,
            F.round(p * F.log2(p / mid) * 1000000000).cast("long"),
        )
        .otherwise(0)
        .alias("tp"),
        F.when(
            F.col("cq") > 0,
            F.round(q * F.log2(q / mid) * 1000000000).cast("long"),
        )
        .otherwise(0)
        .alias("tq"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("tp").cast("long").alias("kl_p_m_nanobits"),
        F.sum("tq").cast("long").alias("kl_q_m_nanobits"),
        F.floor((F.sum("tp") + F.sum("tq")) / 2.0)
        .cast("long")
        .alias("jsd_nanobits"),
    )


@query(
    "text_zipf_slope",
    """
WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
f AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY token
  ORDER BY freq DESC, token LIMIT 200
), r AS (
  SELECT ln(ROW_NUMBER() OVER (ORDER BY freq DESC, token)) AS x,
         ln(freq) AS y
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(regr_slope(y, x), 6) AS zipf_slope,
       ROUND(regr_intercept(y, x), 6) AS intercept,
       ROUND(regr_r2(y, x), 6) AS r2
FROM r
""",
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law exponent for the corpus: OLS slope of ln(freq) ~
    ln(rank) over the top-200 tokens — the one-number lexical-health
    check (natural text sits near -1; boilerplate and spam bend it).
    The token histogram is the only corpus-scale pass; the top-200 cut
    is a TakeOrdered, and ranks attach via the distributed prefix-sum
    operator over the 200-row frame keyed by (-freq, token) — no
    global row_number window even here. Both engines fit with their
    NATIVE regr_* aggregates (independent implementations, same
    closed form)."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    f = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(200)
    )
    ranked = ordered_prefix_sum(
        f.withColumn("negfreq", -F.col("freq")),
        ["negfreq", "token"],
        F.lit(1),
        out_col="rank",
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.expr("regr_slope(y, x)"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
    )


@query(
    "text_bigram_kneser_ney",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
big AS (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2),
lft AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1, COUNT(*) AS n1r
        FROM big GROUP BY w1),
rgt AS (SELECT w2, COUNT(*) AS n1l FROM big GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM big),
p AS (
  SELECT big.c,
         (CAST(big.c AS DOUBLE) - 0.75) / CAST(lft.c1 AS DOUBLE)
         + 0.75 * CAST(lft.n1r AS DOUBLE) / CAST(lft.c1 AS DOUBLE)
           * (CAST(rgt.n1l AS DOUBLE) / CAST(tot.bt AS DOUBLE)) AS pkn
  FROM big JOIN lft ON big.w1 = lft.w1
           JOIN rgt ON big.w2 = rgt.w2, tot
)
SELECT CAST(SUM(c) AS BIGINT) AS n_bigram_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
       CAST(SUM(CAST(ROUND(c * log2(pkn) * 1000000.0) AS BIGINT))
            AS BIGINT) AS kn_logprob_microbits
FROM p
""",
    doc="Interpolated Kneser-Ney bigram LM (d=0.75): corpus log-prob "
    "in integer microbits; continuation counts, absolute discounting, "
    "identical op trees in both engines.",
)
def text_bigram_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram language model — the LM behind
    perplexity-based quality filtering (CCNet/KenLM style), built as
    pure aggregation: bigram counts, left-context totals c1(w1),
    right-continuation fan-outs N1+(w1*), left-continuation fan-ins
    N1+(*w2), and the distinct-bigram total B. P_KN(w2|w1) =
    (c-d)/c1 + d*N1+(w1*)/c1 * N1+(*w2)/B with d = 0.75; corpus
    log2-prob is summed over bigram TYPES weighted by count, each term
    rounded to integer microbits so accumulation order cannot perturb
    the sum. Three shuffles (bigram key, w1, w2) + one one-row total
    broadcast — at 100 TB this is the same shape as any tf-idf pass;
    the only transcendental (log2) is rounded per TYPE, not per token,
    so the term count is vocabulary-bounded."""
    d = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("doc_id").orderBy("pos")
    b = (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
        )
        .withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    big = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    lft = big.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).alias("n1r"),
    )
    rgt = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1l"))
    tot = big.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    cD = F.col("c").cast("double")
    c1D = F.col("c1").cast("double")
    n1rD = F.col("n1r").cast("double")
    n1lD = F.col("n1l").cast("double")
    btD = F.col("bt").cast("double")
    pkn = (cD - F.lit(0.75)) / c1D + F.lit(0.75) * n1rD / c1D * (
        n1lD / btD
    )
    p = (
        big.join(lft, "w1")
        .join(rgt, "w2")
        .crossJoin(F.broadcast(tot))
        .select("c", pkn.alias("pkn"))
    )
    return p.agg(
        F.sum("c").cast("long").alias("n_bigram_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_bigram_types"),
        F.sum(
            F.round(F.col("c") * F.log2("pkn") * F.lit(1000000.0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("kn_logprob_microbits"),
    )


@query(
    "text_mattr_lexical_diversity",
    """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id % 7 = 0
),
m AS (
  SELECT doc_id, len(ws) AS n_tokens,
         CASE WHEN len(ws) < 50 THEN 1 ELSE len(ws) - 49 END AS n_win
  FROM d
),
w AS (
  SELECT d.doc_id,
         CASE WHEN len(ws) < 50
              THEN len(list_distinct(ws))
              ELSE len(list_distinct(ws[i : i + 49])) END AS n_distinct
  FROM d, UNNEST(generate_series(
           1, CASE WHEN len(ws) < 50 THEN 1 ELSE len(ws) - 49 END))
         AS t(i)
),
s AS (
  SELECT doc_id, CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct
  FROM w GROUP BY doc_id
)
SELECT m.doc_id, CAST(m.n_tokens AS BIGINT) AS n_tokens,
       ROUND(s.sum_distinct * 1.0
             / (m.n_win * CASE WHEN m.n_tokens < 50
                               THEN m.n_tokens ELSE 50 END), 6)
         AS mattr
FROM m JOIN s ON m.doc_id = s.doc_id
""",
    doc="MATTR-50 lexical diversity: mean distinct-token ratio over "
    "50-token sliding windows (whole-doc TTR fallback under 50).",
)
def text_mattr_lexical_diversity(spark, sf_dir):
    """MATTR (moving-average type-token ratio, window 50) — the
    length-robust lexical-diversity score corpus-quality filters use
    where plain TTR collapses on long documents. Pure array-land JVM
    work: per doc, transform over window starts -> slice ->
    array_distinct -> size, summed exactly and divided once (docs
    shorter than the window fall back to whole-doc TTR, same rule both
    engines). Cost is O(tokens x window) per document with zero
    shuffles beyond the doc scan — embarrassingly parallel at any
    corpus size; the doc_id % 7 cut keeps the gate invocation light."""
    d = load(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") % 7 == 0
    )
    ws = F.split("text", " ")
    n = F.size(ws)
    short = n < 50
    n_win = F.when(short, F.lit(1)).otherwise(n - 49)
    wlen = F.when(short, n).otherwise(F.lit(50))
    sum_distinct = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.size(
                F.array_distinct(F.slice(ws, i, F.when(short, n).otherwise(F.lit(50))))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(
            sum_distinct * 1.0 / (n_win.cast("long") * wlen.cast("long")), 6
        ).alias("mattr"),
    )


@query(
    "text_rake_keyphrases",
    r"""
WITH phr AS (
  SELECT trim(p) AS phrase FROM (
    SELECT UNNEST(string_split_regex(
      array_to_string(
        list_transform(string_split(text, ' '),
          x -> CASE WHEN x IN ('a', 'the') THEN '|' ELSE x END),
        ' '),
      ' *\| *')) AS p
    FROM documents
  ) WHERE trim(p) <> ''
), wo AS (
  SELECT w, len(string_split(phrase, ' ')) AS wlen
  FROM (SELECT phrase, UNNEST(string_split(phrase, ' ')) AS w FROM phr)
), ws AS (
  SELECT w, COUNT(*) AS freq, SUM(wlen) AS degree,
         CAST(ROUND(1000000.0 * SUM(wlen) / COUNT(*)) AS BIGINT) AS score_micro
  FROM wo GROUP BY w
), dp AS (
  SELECT phrase, COUNT(*) AS n_occ FROM phr GROUP BY phrase
), pw AS (
  SELECT dp.phrase, dp.n_occ, ws.score_micro
  FROM dp, UNNEST(string_split(dp.phrase, ' ')) AS t(w)
  JOIN ws ON ws.w = t.w
), scored AS (
  SELECT phrase, MAX(n_occ) AS n_occ,
         CAST(SUM(score_micro) AS BIGINT) AS s_micro
  FROM pw GROUP BY phrase
)
SELECT phrase, CAST(n_occ AS BIGINT) AS n_occurrences,
       ROUND(s_micro / 1000000.0, 6) AS rake_score
FROM scored
ORDER BY s_micro DESC, phrase ASC LIMIT 15
""",
)
def text_rake_keyphrases(spark, sf_dir):
    """RAKE keyphrase extraction (Rapid Automatic Keyword Extraction):
    candidate phrases are maximal stopword-free token runs; each word is
    scored degree/frequency over all phrase occurrences (degree = summed
    length of phrases it appears in — co-occurrence including self) and
    a phrase scores the sum of its member word scores. Phrase splitting
    is pure array-land (token map -> delimiter rejoin -> regex split, no
    Python); word stats are one shuffle on word; phrase scores are one
    shuffle on phrase text. Word scores quantize to integer micro-units
    before the phrase SUM (registry float rule), and the top-15 is a
    TakeOrdered on the integer score. At 100 TB both shuffles are
    key-hashed and combine map-side; nothing is ever per-document
    quadratic."""
    d = load(spark, sf_dir, "documents")["documents"]
    phrases = (
        d.select(
            F.explode(
                F.split(
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda x: F.when(
                                x.isin("a", "the"), F.lit("|")
                            ).otherwise(x),
                        ),
                        " ",
                    ),
                    r" *\| *",
                )
            ).alias("p")
        )
        .select(F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    wo = phrases.select(
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("wlen"),
    )
    ws = wo.groupBy("w").agg(
        F.round(
            1000000.0 * F.sum("wlen") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("score_micro")
    )
    dp = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    pw = dp.select(
        "phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w")
    ).join(ws, "w")
    scored = pw.groupBy("phrase").agg(
        F.max("n_occ").alias("n_occ"),
        F.sum("score_micro").alias("s_micro"),
    )
    return (
        scored.orderBy(F.col("s_micro").desc(), F.col("phrase").asc())
        .limit(15)
        .select(
            "phrase",
            F.col("n_occ").cast("long").alias("n_occurrences"),
            F.round(F.col("s_micro") / 1000000.0, 6).alias("rake_score"),
        )
    )


@query(
    "text_pmi_collocations",
    """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT UNNEST(ts) AS w FROM toks
  ) GROUP BY w
), n AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
), big AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM (
    SELECT ts[i] AS w1, ts[i + 1] AS w2
    FROM toks, UNNEST(RANGE(1, len(ts))) AS t(i)
  ) GROUP BY w1, w2
  HAVING COUNT(*) >= 30
), scored AS (
  SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
         (c12 * n.n * 1000000) // (u1.c * u2.c) AS ord_ppm,
         c12 * n.n * 1.0 / (u1.c * u2.c) AS ratio
  FROM big JOIN uni u1 ON u1.w = w1 JOIN uni u2 ON u2.w = w2, n
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS pair_count,
       ROUND(log2(ratio), 6) AS pmi
FROM scored
ORDER BY ord_ppm DESC, w1 ASC, w2 ASC LIMIT 20
""",
)
def text_pmi_collocations(spark, sf_dir):
    """POINTWISE MUTUAL INFORMATION collocations: the top-20 adjacent
    token bigrams by PMI = log2(N * c12 / (c1 * c2)) with a minimum
    pair count of 30 (PMI is unstable on rare pairs). Bigrams come from
    a positional sequence explode (no self-join); unigram counts attach
    by two equi-joins; the corpus token total is a one-row broadcast.
    The top-20 ORDERS ON AN EXACT INTEGER — the ratio in parts-per-
    million by integer division — so selection never depends on a
    transcendental: log2 only renders the already-selected rows (one
    call per output row, no accumulation). One shuffle per count."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select(F.split("text", " ").alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").cast("long").alias("n"))
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(ts[i - 1] AS w1, ts[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 30)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr("(c12 * n * 1000000) div (c1 * c2)").alias("ord_ppm"),
            (F.col("c12") * F.col("n") * 1.0 / (F.col("c1") * F.col("c2"))).alias(
                "ratio"
            ),
        )
    )
    return (
        scored.orderBy(
            F.col("ord_ppm").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("pair_count"),
            F.round(F.log2("ratio"), 6).alias("pmi"),
        )
    )


@query(
    "text_readability_flesch",
    """
WITH per_doc AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS words,
         GREATEST(len(string_split(text, '. ')), 1) AS sents,
         (SELECT SUM(len(regexp_extract_all(t.w, '[aeiou]+')))
          FROM UNNEST(string_split(text, ' ')) AS t(w)) AS sylls
  FROM documents
), scored AS (
  SELECT doc_id, words, sents, sylls,
         206.835 - 1.015 * (words * 1.0 / sents)
                 - 84.6 * (sylls * 1.0 / words) AS flesch
  FROM per_doc
)
SELECT CAST(FLOOR(flesch / 10) AS BIGINT) AS flesch_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(sylls) AS BIGINT) AS syllables
FROM scored GROUP BY 1
""",
)
def text_readability_flesch(spark, sf_dir):
    """FLESCH READING-EASE corpus profile: the classic
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/words) score,
    with syllables approximated by vowel-group runs — the standard
    dictionary-free proxy, computed identically in both engines by one
    regexp over the token array. All three inputs are exact integers
    per document (counting, not floating aggregation), the score is
    one fixed IEEE expression, and docs histogram into 10-point bands.
    Everything is a single projection + one groupBy — no joins, no
    Python, trivially scan-bound at 100 TB."""
    d = load(spark, sf_dir, "documents")["documents"]
    per_doc = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("words"),
        F.greatest(
            F.size(F.expr("split(text, '\\\\. ')")), F.lit(1)
        ).alias("sents"),
        F.expr(
            "aggregate(transform(split(text, ' '),"
            " w -> size(regexp_extract_all(w, '[aeiou]+', 0))),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("sylls"),
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("words") * 1.0 / F.col("sents"))
        - 84.6 * (F.col("sylls") * 1.0 / F.col("words"))
    )
    return (
        per_doc.withColumn(
            "flesch_decile", F.floor(flesch / 10).cast("long")
        )
        .groupBy("flesch_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("words"),
            F.sum("sylls").cast("long").alias("syllables"),
        )
    )


_GT_ORACLE = """
WITH arr AS (
  SELECT string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
tok AS (
  SELECT array_to_string(w[i:i+2], ' ') AS tok
  FROM arr, LATERAL (SELECT UNNEST(range(1, len(w) - 1)) AS i) t
),
freqs AS (SELECT tok, COUNT(*) AS r FROM tok GROUP BY tok),
coc AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS s_r FROM freqs GROUP BY r),
n AS (SELECT SUM(r * s_r) AS total FROM coc)
SELECT a.r, a.s_r, b.s_r AS s_r1,
       ROUND((a.r + 1) * b.s_r * 1.0 / a.s_r, 6) AS r_star,
       ROUND(a.s_r * a.r * 1.0 / (SELECT total FROM n), 9) AS raw_mass
FROM coc a JOIN coc b ON b.r = a.r + 1
WHERE a.r <= 5
"""


@query(
    "text_good_turing_smoothing",
    _GT_ORACLE,
    doc="Good-Turing smoothing over word TRIGRAMS (the sparse event "
    "space): count-of-counts and r* = (r+1) S(r+1)/S(r) for r <= 5.",
)
def text_good_turing_smoothing(spark, sf_dir):
    """Good-Turing smoothing — the classical LM mass-reallocation for
    rare events: tokens seen r times behave as if seen
    r* = (r+1) S(r+1)/S(r) times, where S(r) is the COUNT-OF-COUNTS
    (how many distinct tokens occur exactly r times). Two chained
    map-side-combined aggregations (token freqs -> frequency
    histogram) collapse the corpus to a handful of (r, S_r) rows; the
    self-join on r+1 is over that tiny histogram. Ratios are fixed
    double expressions over exact integers, rounded. Complements
    Kneser-Ney (text_bigram_kneser_ney) with the count-based
    smoothing family. The event space is word TRIGRAMS — unigrams in
    this corpus are all high-frequency, and Good-Turing's subject is
    precisely the sparse tail that n-gram spaces produce; trigrams come
    from pure array ops (slice inside transform), no window, no
    self-join."""
    d = load(spark, sf_dir, "documents")["documents"]
    freqs = (
        d.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> array_join(slice(w, i, 3), ' '))"
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    coc = freqs.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("s_r"))
    coc = coc.localCheckpoint(eager=True)  # tiny histogram, reused 3x
    total = coc.agg(F.sum(F.col("r") * F.col("s_r")).alias("total"))
    nxt = coc.select((F.col("r") - 1).alias("r"), F.col("s_r").alias("s_r1"))
    return (
        coc.where(F.col("r") <= 5)
        .join(nxt, "r")
        .crossJoin(F.broadcast(total))
        .select(
            "r",
            "s_r",
            "s_r1",
            F.round(
                (F.col("r") + 1) * F.col("s_r1") * 1.0 / F.col("s_r"), 6
            ).alias("r_star"),
            F.round(
                F.col("s_r") * F.col("r") * 1.0 / F.col("total"), 9
            ).alias("raw_mass"),
        )
    )


_TR_SCALE = 10**12
_TR_ITERS = 3
_TR_MIN_COUNT = 5


def _textrank_oracle() -> str:
    head = f"""
WITH tok AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id,
           unnest(string_split(lower(text), ' ')) AS tok,
           generate_subscripts(string_split(lower(text), ' '), 1) AS pos
    FROM documents
  ) WHERE tok <> ''
), adj AS (
  SELECT a.tok AS t1, b.tok AS t2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.tok <> b.tok
), und AS (
  SELECT LEAST(t1, t2) AS a, GREATEST(t1, t2) AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM adj GROUP BY 1, 2 HAVING COUNT(*) >= {_TR_MIN_COUNT}
), edges AS (
  SELECT a AS src, b AS dst, w FROM und
  UNION ALL
  SELECT b AS src, a AS dst, w FROM und
), strength AS (SELECT src, CAST(SUM(w) AS BIGINT) AS s FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM strength),
meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, {_TR_SCALE} // m.n AS rank FROM nodes, meta m)"""
    steps = []
    for i in range(1, _TR_ITERS + 1):
        steps.append(f""",
r{i} AS (
  SELECT nd.node,
         (15 * {_TR_SCALE}) // (100 * m.n)
           + (85 * COALESCE(c.s, 0)) // 100 AS rank
  FROM nodes nd CROSS JOIN meta m
  LEFT JOIN (
    SELECT e.dst, SUM((r.rank * e.w) // st.s) AS s
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN strength st ON e.src = st.src
    GROUP BY e.dst
  ) c ON c.dst = nd.node
)""")
    tail = f"""
SELECT CAST(rk AS BIGINT) AS rk, node AS token, CAST(rank AS BIGINT) AS score
FROM (
  SELECT node, rank,
         ROW_NUMBER() OVER (ORDER BY rank DESC, node ASC) AS rk
  FROM r{_TR_ITERS}
) WHERE rk <= 20
"""
    return head + "".join(steps) + tail


@query("text_textrank_keywords", _textrank_oracle())
def text_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): adjacent-
    token co-occurrence edges (undirected, count-weighted, pruned below
    5 co-occurrences) ranked by 3 WEIGHTED PageRank iterations in
    scaled integer arithmetic — contribution = rank * w // strength(u),
    so every iteration is bit-identical on any engine/partitioning
    (the graph family's integer-PageRank pattern, now edge-weighted).
    Top-20 keywords via TakeOrderedAndProject under (score DESC,
    token). Each iteration is one join + one aggregation shuffle on the
    token id; the corpus is touched once to build edges."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    nxt = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("tok2")
    )
    und = (
        tok.join(nxt, ["doc_id", "pos"])
        .filter(F.col("tok") != F.col("tok2"))
        .select(
            F.least("tok", "tok2").alias("a"),
            F.greatest("tok", "tok2").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _TR_MIN_COUNT)
    )
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    strength = edges.groupBy("src").agg(F.sum("w").alias("s"))
    est = edges.join(strength, "src").localCheckpoint(eager=True)
    obs_n = Observation()
    nodes = (
        strength.select(F.col("src").alias("node"))
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # node count rides the checkpoint action as an observed metric
    n = int(obs_n.get["n"])
    base = (15 * _TR_SCALE) // (100 * n)
    rank = nodes.withColumn("rank", F.lit(_TR_SCALE // n))
    for _ in range(_TR_ITERS):
        contrib = (
            est.join(rank, est["src"] == rank["node"])
            .select(
                "dst", F.expr("(rank * w) div s").alias("share")
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("s85"))
        )
        rank = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(s85, 0) div 100")
                ).alias("rank"),
            )
        )
    from pyspark.sql import Window

    w20 = Window.orderBy(F.col("rank").desc(), F.col("node").asc())
    return (
        rank.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
        .withColumn("rk", F.row_number().over(w20))
        .select(
            F.col("rk").cast("long").alias("rk"),
            F.col("node").alias("token"),
            F.col("rank").cast("long").alias("score"),
        )
    )
