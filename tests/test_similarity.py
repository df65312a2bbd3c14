"""Similarity-search quality: ANN recall against the brute-force baseline."""

from station_data_ingestion_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _topk_pairs(spark, name):
    return {
        (r["q_id"], r["c_id"])
        for r in QUERIES[name].fn(spark, SF).collect()
    }


def test_lsh_ann_recall_against_brute_force(spark):
    truth = _topk_pairs(spark, "sim_brute_topk")
    ann = _topk_pairs(spark, "sim_ann_lsh_bucketed")
    assert truth, "brute force returned nothing"
    recall = len(truth & ann) / len(truth)
    # 2 bands x 8 bits on 64-dim data: high-similarity neighbors should
    # collide in at least one band most of the time
    assert recall >= 0.6, f"ANN recall {recall:.2f} too low ({ann & truth})"


def test_blocked_equals_lambda_brute_force(spark):
    assert _topk_pairs(spark, "sim_brute_topk") == _topk_pairs(
        spark, "sim_brute_topk_blocked"
    )


def test_neardup_finds_planted_pairs(spark, tmp_path):
    """sim_neardup_embeddings matches a numpy oracle on a corpus with
    PLANTED >0.98-cosine pairs (the sf corpora have none, so the driver's
    0-row oracle match proves nothing about the positive path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(123)
    n, dim, n_labels = 120, 64, 4
    base = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (np.arange(n) % n_labels).astype(np.int32)
    # plant near-dups INSIDE label blocks (ids i and i+60 share i%4 vs
    # (i+60)%4 -- 60 % 4 == 0, so same label) and one high-cos pair
    # SPLIT across labels (61 -> label changes) that must NOT be found
    for i in range(8):
        base[60 + i] = base[i] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    base[101] = base[40] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    assert labels[101] != labels[40]

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in base],
                                      pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    got = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in QUERIES["sim_neardup_embeddings"].fn(spark, str(tmp_path)).collect()
    }

    # numpy oracle: all within-label pairs with cos > 0.98
    x = base.astype(np.float64)
    norms = np.linalg.norm(x, axis=1)
    sims = (x @ x.T) / np.outer(norms, norms)
    exp = {
        (int(a), int(b)): round(float(sims[a, b]), 6)
        for a in range(n)
        for b in range(a + 1, n)
        if labels[a] == labels[b] and sims[a, b] > 0.98
    }
    assert len(exp) >= 8, "fixture failed to plant enough near-dups"
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 2e-6, (k, got[k], exp[k])
    assert (40, 101) not in got, "cross-label pair must be outside blocks"


# --- weighted (tf-idf cosine) prefix-filtered all-pairs join -----------------


def test_weighted_prefix_join_equals_brute_force(spark):
    from pyspark.sql import functions as F

    from station_data_ingestion_spark.queries.llm_dedup import (
        _tfidf_unit_weights,
        _weighted_prefix_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different document about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "spark engines process completely different documents"),
        (6, "lorem ipsum dolor sit amet consectetur"),
        (7, "lorem ipsum dolor sit amet consectetur adipiscing"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.5
    u = _tfidf_unit_weights(d)
    # brute force: every co-token pair, exact dot
    ua = u.select(F.col("doc_id").alias("a_id"), "token", F.col("u").alias("ua"))
    ub = u.select(F.col("doc_id").alias("b_id"), "token", F.col("u").alias("ub"))
    brute = (
        ua.join(ub, "token")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 4).alias("c"))
        .filter(F.col("c") >= t)
    )
    want = {(r["a_id"], r["b_id"], r["c"]) for r in brute.collect()}
    cands = _weighted_prefix_pairs(u, t)
    got_df = (
        cands.join(ua, "a_id")
        .join(ub, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 4).alias("c"))
        .filter(F.col("c") >= t)
    )
    got = {(r["a_id"], r["b_id"], r["c"]) for r in got_df.collect()}
    assert got == want
    assert (1, 4) in {(a, b) for a, b, _ in want}  # exact dup pair present
    # the prefix filter prunes the JOIN INPUT: prefix rows < vector rows
    # (pair-level pruning needs a bigger corpus; row-level always holds
    # once any vector's suffix norm dips below t)
    from pyspark.sql.window import Window

    win = Window.partitionBy("doc_id").orderBy("df", "token")
    kept = u.withColumn(
        "cum", F.sum(F.col("u") * F.col("u")).over(win)
    ).filter(
        F.lit(1.0) - (F.col("cum") - F.col("u") * F.col("u"))
        >= F.lit(t * t) - F.lit(1e-12)
    )
    assert kept.count() < u.count()


def test_pq_adc_recall_against_brute_force(spark):
    """PQ+ADC with a top-50 exact rerank on a 16^8-cell quantizer: the
    candidate pool is 10% of the sf0.001 corpus, so the reranked top-3
    should recover most of the true top-3."""
    truth = _topk_pairs(spark, "sim_brute_topk")
    pq = _topk_pairs(spark, "sim_pq_adc_topk")
    assert truth, "brute force returned nothing"
    recall = len(truth & pq) / len(truth)
    assert recall >= 0.6, f"PQ recall {recall:.2f} too low ({pq & truth})"
