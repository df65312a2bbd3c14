"""Pointer-doubling hierarchy depth (queries/recursive_q.py)."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.recursive_q import (
    _FANOUT,
    hierarchy_depth_pointer_doubling,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_depth(node: int) -> int:
    d = 0
    while node // _FANOUT >= 1:
        node //= _FANOUT
        d += 1
    return d


def test_depth_matches_python_walk(spark):
    out = hierarchy_depth_pointer_doubling(spark, SF_DIR).collect()
    got = {r["depth"]: (r["n_nodes"], r["min_key"], r["max_key"], r["sum_keys"]) for r in out}
    keys = [
        r["c_custkey"] + 1
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").select("c_custkey").collect()
    ]
    exp: dict[int, list[int]] = {}
    for k in keys:
        exp.setdefault(_py_depth(k), []).append(k)
    assert got == {
        d: (len(v), min(v), max(v), sum(v)) for d, v in exp.items()
    }
    # O(log D) claim: every node resolves within the fixed round budget —
    # the in-plan raise_error guard would have fired otherwise
    assert sum(r["n_nodes"] for r in out) == len(keys)


def test_unconverged_pointer_raises(spark):
    """Chains deeper than 2^rounds must fail loudly, not silently wrong."""
    from station_data_ingestion_spark.queries import recursive_q

    deep = spark.range(1, 2 ** 7 + 1).select(
        F.col("id").alias("node"),
        # parent = node - 1: a pure chain, depth ~ 2^7 > 2^5 - 1
        (F.col("id") - 1).alias("ptr"),
        F.lit(1).cast("long").alias("dist"),
    )
    state = deep.unionAll(
        spark.range(1).select(
            F.lit(0).cast("long").alias("node"),
            F.lit(0).cast("long").alias("ptr"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    for _ in range(recursive_q._ROUNDS):
        hop = state.select(
            F.col("node").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("dist").alias("d2"),
        )
        state = (
            state.join(hop, "ptr")
            .select(
                "node",
                F.col("ptr2").alias("ptr"),
                (F.col("dist") + F.col("d2")).alias("dist"),
            )
            .localCheckpoint()
        )
    guarded = state.select(
        F.when(
            F.col("ptr") != 0,
            F.raise_error(F.lit("did not converge")).cast("long"),
        )
        .otherwise(F.col("dist"))
        .alias("dist")
    )
    with pytest.raises(Exception, match="did not converge"):
        guarded.agg(F.sum("dist")).collect()
