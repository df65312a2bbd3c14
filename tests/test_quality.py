"""Semantic tests for llm_quality queries on hand-built corpora.

The oracle comparison (tools/check_correctness.py) proves Spark == DuckDB
on the synthetic corpus; these tests pin the *intended* semantics on
inputs small enough to verify by hand (the two checkers together rule
out "both engines agree on the wrong answer").
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from station_data_ingestion_spark.queries.llm_quality import (
    dedup_passage_exact,
    sim_vector_quantize_int8,
    text_repetition_gopher,
    text_tfidf_top_terms,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs_dir(spark, tmp_path, texts: dict[int, str]) -> str:
    rows = [(i, t, "en", "test", len(t)) for i, t in sorted(texts.items())]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_passage_dedup_marks_later_occurrences(spark, tmp_path):
    # doc 1: 16 unique words = passages P0, P1
    # doc 2: doc 1's first 8 words (dup of P0) + 8 fresh words
    # doc 3: 7 words -> no full passage -> no row
    sf = _docs_dir(
        spark,
        tmp_path,
        {
            1: _words("a", 16),
            2: _words("a", 8) + " " + _words("b", 8),
            3: _words("c", 7),
        },
    )
    got = {r["doc_id"]: r.asDict() for r in dedup_passage_exact(spark, sf).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_passages"] == 2 and got[1]["n_dup_passages"] == 0
    assert got[2]["n_passages"] == 2 and got[2]["n_dup_passages"] == 1
    assert got[2]["dup_permille"] == 500


def test_passage_dedup_first_occurrence_is_corpus_order(spark, tmp_path):
    # identical single-passage docs: the lower doc_id is the keeper
    sf = _docs_dir(spark, tmp_path, {7: _words("z", 8), 4: _words("z", 8)})
    got = {r["doc_id"]: r["n_dup_passages"] for r in dedup_passage_exact(spark, sf).collect()}
    assert got == {4: 0, 7: 1}


def test_repetition_gopher_flags_repeated_word(spark, tmp_path):
    # doc 1: 'x' 5 times in 20 words = 25% top-word mass -> flagged
    # doc 2: all-unique 20 words, top word 5% -> clean
    spam = "x x x x x " + _words("u", 15)
    sf = _docs_dir(spark, tmp_path, {1: spam, 2: _words("v", 20)})
    got = {r["doc_id"]: r.asDict() for r in text_repetition_gopher(spark, sf).collect()}
    assert got[1]["n_words"] == 20
    assert got[1]["top_uni_n"] == 5
    assert got[1]["top_word_permille"] == 250
    # 'x x' appears 4 times = 8 of 20 words in the top bigram
    assert got[1]["top_bi_n"] == 4
    assert got[1]["top_bigram_permille"] == 400
    assert got[1]["flagged"] == 1
    assert got[2]["top_uni_n"] == 1 and got[2]["flagged"] == 0


def test_repetition_gopher_single_word_doc(spark, tmp_path):
    # one-word doc has no bigram: LEFT join must default to 0, not drop
    sf = _docs_dir(spark, tmp_path, {1: "solo"})
    (row,) = text_repetition_gopher(spark, sf).collect()
    assert row["n_words"] == 1 and row["top_bi_n"] == 0
    assert row["top_word_permille"] == 1000 and row["flagged"] == 1


def test_tfidf_prefers_rare_terms(spark, tmp_path):
    # 'rare' appears only in doc 1 (df=1); 'common' in all 3 (df=3).
    # Equal tf inside doc 1 -> rare outranks common.
    sf = _docs_dir(
        spark,
        tmp_path,
        {1: "rare common filler1", 2: "common filler2 filler3", 3: "common x y"},
    )
    top = {
        (r["doc_id"], r["rnk"]): r.asDict()
        for r in text_tfidf_top_terms(spark, sf).collect()
    }
    d1 = [top[(1, k)] for k in (1, 2, 3)]
    assert d1[0]["term"] == "filler1" or d1[0]["term"] == "rare"
    # both df=1, tf=1 -> alphabetical tiebreak: filler1 before rare
    assert [r["term"] for r in d1] == ["filler1", "rare", "common"]
    assert d1[0]["score"] == 3_000_000 and d1[2]["score"] == 1_000_000


def test_vector_quantize_int8_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (1, [0.5, -1.0, 0.25], 0),  # amax=1.0 -> q=[64,-127,32] (63.5 rounds away)
        (2, [0.0, 0.0, 0.0], 1),    # zero vector: excluded
    ]
    spark.createDataFrame(rows, schema).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = sim_vector_quantize_int8(spark, str(tmp_path)).collect()
    assert len(out) == 1
    (r,) = out
    assert r["vec_id"] == 1
    assert r["l1_q"] == 64 + 127 + 32
    assert r["n_saturated"] == 1
    assert r["scale_ppm"] == 127_000_000


@pytest.mark.parametrize("name", ["dedup_passage_exact", "text_repetition_gopher"])
def test_quality_queries_are_lazy(spark, name):
    # plan construction must not trigger jobs (no collect in the builder)
    from station_data_ingestion_spark.queries import QUERIES

    df = QUERIES[name].fn(spark, "/root/testdata/sf0.001")
    assert df.columns  # schema resolvable without execution
