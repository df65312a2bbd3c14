"""Regression guard for the band-table broadcast scale-killer.

Catalyst's default size estimate for a MapInPandas output made the
LSH band self-joins plan as BroadcastHashJoin with the WHOLE band
table as the build side: the expensive Python signature stage ran
once per join side and 16 rows/doc funneled through the driver —
measured 13x super-linear at the sf1 10x probe. The fix pins the
band table with an eager localCheckpoint so AQE sees real stats.

These tests assert the structural property that prevents the bug
class from returning: the final plan of each band-join query contains
AT MOST the Python stages its rerank needs (the signature stage must
be absorbed into a checkpointed `Scan ExistingRDD`, i.e. computed
exactly once), and no BroadcastExchange consumes a Python stage
directly.
"""

from __future__ import annotations

import io
import re

SF_DIR = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # simple mode: one line per node (formatted mode lists every node
    # twice — tree + detail — which double-counts stages)
    buf = io.StringIO()
    import contextlib

    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _n_python_stages(plan: str) -> int:
    return len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython", plan))


def test_minhash_signature_stage_runs_once(spark):
    from station_data_ingestion_spark.queries.registry import QUERIES

    df = QUERIES["dedup_minhash_lsh"].fn(spark, SF_DIR)
    plan = _final_plan(df)
    # exactly ONE Python stage: the exact-Jaccard rerank. The signature
    # stage must be behind the checkpoint (Scan ExistingRDD), not inlined
    # twice into the self-join.
    assert _n_python_stages(plan) == 1, plan
    assert "Scan ExistingRDD" in plan, plan


def test_phash_hash_stage_runs_once(spark):
    from station_data_ingestion_spark.operators.phash import (
        phash_neardup_pairs,
    )
    from station_data_ingestion_spark.queries.registry import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    import pyspark.sql.functions as F

    payload = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    pairs = phash_neardup_pairs(payload, "doc_id", "payload")
    plan = _final_plan(pairs)
    # zero Python stages downstream: the hash stage is checkpointed and
    # the Hamming rerank is JVM bit_count.
    assert _n_python_stages(plan) == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_no_broadcast_directly_over_python_stage(spark):
    """No query may broadcast the direct output of a Python stage: the
    build side's size estimate is fiction there, and the stage reruns
    per consumer. (Broadcast over small JVM aggregates is fine.)"""
    from station_data_ingestion_spark.queries.registry import QUERIES

    for name in ("dedup_minhash_lsh", "sim_ann_lsh_bucketed"):
        plan = _final_plan(QUERIES[name].fn(spark, SF_DIR))
        for m in re.finditer(r"BroadcastExchange", plan):
            tail = plan[m.start() : m.start() + 400]
            assert "MapInPandas" not in tail.split("BroadcastExchange")[1][
                :200
            ], f"{name} broadcasts a Python stage:\n{tail}"
