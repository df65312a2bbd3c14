"""Distributed BPE trainer (operators/bpe.py) vs a Python reference."""

from collections import Counter

from station_data_ingestion_spark.operators.bpe import bpe_train, corpus_words


def _py_bpe(word_freq: dict[str, int], rounds: int):
    toks = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += f
        if not counts:
            break
        # max by (count desc, pair asc) — the trainer's total order
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w in toks:
            t, out = toks[w], []
            i = 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges, toks


def test_trainer_matches_python_reference_with_overlaps(spark):
    corpus = {
        "aaa": 5,       # overlapping-run greedy case
        "abab": 4,
        "banana": 3,
        "bandana": 2,
        "aa": 7,
    }
    rows = [(w, f) for w, f in corpus.items()]
    words = spark.createDataFrame(rows, "word string, freq long")
    merges, toks = bpe_train(words, rounds=4)
    exp_merges, exp_toks = _py_bpe(corpus, 4)
    assert merges == exp_merges
    got = {
        tuple(r["toks"]): r["freq"] for r in toks.collect()
    }
    exp = {tuple(t): corpus[w] for w, t in exp_toks.items()}
    assert got == exp


def test_trainer_on_real_corpus_prefix(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = corpus_words(docs)
    wf = {r["word"]: r["freq"] for r in words.collect()}
    merges, _ = bpe_train(words, rounds=3)
    exp_merges, _ = _py_bpe(wf, 3)
    assert merges == exp_merges


def test_encode_reproduces_trainer_tokenization(spark):
    from station_data_ingestion_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        corpus_words,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("low lower lowest newest newer new",),
         ("wide wider widest new newest",)],
        "text string",
    )
    words = corpus_words(docs)
    merges, trained = bpe_train(words, rounds=10)
    enc = bpe_encode(words.select("word", "freq"), "word", merges)
    got = {
        (tuple(r["toks"]), r["freq"]) for r in enc.select("toks", "freq").collect()
    }
    want = {
        (tuple(r["toks"]), r["freq"]) for r in trained.collect()
    }
    assert got == want and len(merges) == 10


def test_encode_chunked_projection_equals_unchunked(spark):
    from station_data_ingestion_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        corpus_words,
    )

    docs = spark.createDataFrame(
        [("aaa aab aba abab baba abba",)], "text string"
    )
    words = corpus_words(docs)
    merges, _ = bpe_train(words, rounds=6)
    a = bpe_encode(words, "word", merges, chunk=2).select("word", "toks")
    b = bpe_encode(words, "word", merges, chunk=100).select("word", "toks")
    assert {
        (r["word"], tuple(r["toks"])) for r in a.collect()
    } == {(r["word"], tuple(r["toks"])) for r in b.collect()}
