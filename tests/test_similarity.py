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
