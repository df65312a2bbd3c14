"""Distributed BPE trainer (fixed rounds), all-JVM.

Byte-pair-encoding training is the canonical tokenizer-building
workload for an LLM data pipeline: repeatedly (1) count adjacent token
pairs across the corpus, (2) merge the most frequent pair everywhere.
Restated for Spark:

- the corpus compresses to (word, freq) ONCE — pair counting and
  merging then run over distinct words weighted by frequency, which is
  orders of magnitude smaller than the token stream (the same trick
  every BPE trainer uses);
- each round is ONE aggregation shuffle on the pair plus a driver
  `first()` of the single best row (count desc, pair asc — a total
  order, so the learned merges are engine- and partitioning-stable);
- the merge itself is a greedy LEFT-TO-RIGHT fold over each word's
  token array, expressed with `aggregate` (a codegen'd higher-order
  function — no Python workers anywhere), handling the overlapping-run
  case exactly like the reference algorithm ("aaa" + merge (a,a) ->
  ["aa","a"]);
- per-round lineage is truncated with localCheckpoint exactly like the
  other iterative operators (graph.py, recursive_q.py).

String `replace`-based merging is deliberately NOT used: a literal
replace consumes the shared separator between adjacent occurrences
("a b a b" merges only once per pass), which silently diverges from
greedy BPE — the token-array fold is the correct semantics.

[reference: none — engine surface in the LLM-pipeline family
(llm_text.py tokenization / llm_pipeline.py packing)]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_tokens(word: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )


def _pairs(toks: Column) -> Column:
    """Adjacent pairs as 'a b' strings; empty for 1-token words
    (guarded: sequence(1, 0) would count DOWN, not produce empty)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_fold(toks: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b."""
    merged = a + b
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def corpus_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercase alpha words — the compressed corpus
    the trainer iterates on."""
    words = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
                " ",
            )
        ).alias("word")
    ).where(F.length("word") >= 2)
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def weighted_pair_counts(words: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent char/token pairs weighted by word freq.
    `words` is (word, freq) or (toks, freq) — the round-1 counting
    stage of the trainer, exposed for the oracle gate."""
    if "toks" in words.columns:
        toks = F.col("toks")
    else:
        toks = _char_tokens(F.col("word"))
    return (
        words.select("freq", F.explode(_pairs(toks)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    words: DataFrame, rounds: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``rounds`` merges over a (word, freq) corpus.

    Returns (merges, tokenized) where merges is
    [(left, right, pair_count)] in learned order and ``tokenized`` is
    (toks array<string>, freq) after applying them all.
    """
    toks = words.select(
        F.col("freq"), _char_tokens(F.col("word")).alias("toks")
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(rounds):
        best = (
            weighted_pair_counts(toks)
            .orderBy(F.col("cnt").desc(), "pair")
            .first()
        )
        if best is None:
            break
        a, b = best["pair"].split(" ", 1)
        merges.append((a, b, int(best["cnt"])))
        toks = toks.select(
            "freq", _merge_fold(F.col("toks"), a, b).alias("toks")
        ).localCheckpoint()
    return merges, toks


def bpe_encode(
    df: DataFrame,
    col: str,
    merges: list[tuple],
    out_col: str = "toks",
    chunk: int = 8,
) -> Column | DataFrame:
    """ENCODE with a learned merge list: each rule applied exhaustively
    in learned order via the same codegen'd left-to-right fold the
    trainer uses. Rule ordering is sufficient (no per-step priority
    scan): a rule's operands exist in the corpus state after all
    EARLIER rules ran exhaustively, and a rule can only create tokens
    that later rules consume — so sequential exhaustive application
    reproduces the trainer's transformation exactly (pytest-asserted:
    encoding the training corpus equals the trainer's own tokenized
    output).

    Purely per-row expressions — no shuffle, no Python workers; encode
    throughput is scan-bound at any scale. Expressions chain ``chunk``
    rules per projection to keep individual codegen units small; a
    production 32k-merge vocabulary would move the inner loop into a
    pandas UDF over a broadcast merge table instead (same semantics,
    Arrow-batched) — this expression form serves the modest merge
    counts the trainer's fixed-rounds API produces."""
    expr = _char_tokens(F.col(col))
    out = df
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        expr = _merge_fold(expr, a, b)
        if (i + 1) % chunk == 0:
            out = out.withColumn(out_col, expr)
            expr = F.col(out_col)
    return out.withColumn(out_col, expr)
