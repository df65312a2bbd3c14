"""Incrementally-maintained KMV distinct sketches over a stream.

Streaming COUNT(DISTINCT) is the classic hard case: exact state grows
with the key space, and ``approx_count_distinct`` over a stream needs
the aggregation to own the state. This operator keeps the sketch IN THE
TABLE instead: every micro-batch commits its per-group bottom-k hash
partials (operators/kmv.py) into a snapshot table partitioned by batch,
and the live answer folds all committed partials per group.

The property that makes this robust is that KMV merge is SET UNION:
re-processing the same rows re-contributes the same hashes, and union
is idempotent. So the pipeline needs only AT-LEAST-ONCE delivery —
a crash mid-batch replays into the same batch partition (idempotent
overwrite), and even a fresh checkpoint re-ingesting everything under
new batch ids cannot change the folded answer. Exactly-once machinery
is unnecessary BY ALGEBRA, not by luck — the same reason the batch
twin can fan partials across arbitrary partitions.

State bound: committed rows = batches x groups, each <= k*8 bytes; a
compaction pass (fold partials into one row per group, overwrite) can
cap history at any time without changing the answer — same union.

[reference: none — engine surface (streaming + mergeable-sketch
composition); batch twin at queries/sketch_q.py:sketch_kmv_distinct_union.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.operators.kmv import (
    kmv_estimate,
    kmv_sketches,
    merge_hashes,
)
from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def kmv_stream_commit(
    table: SnapshotTable,
    key_col: str,
    group_col: str,
    k: int,
    run_token: str,
):
    """foreachBatch callback: commit this batch's per-group bottom-k
    partials under the batch's own partition (idempotent overwrite)."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        partials = kmv_sketches(batch_df, key_col, group_col, k)
        table.commit_overwrite_partitions(
            partials.withColumn(
                "batch_id", F.lit(f"{run_token}-{int(batch_id)}")
            )
        )

    return commit


def run_kmv_stream(
    stream: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    key_col: str,
    group_col: str,
    k: int,
):
    """Start (availableNow) a stream maintaining per-group KMV partials
    in `table`; returns the StreamingQuery (caller awaits)."""
    import hashlib

    token = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return (
        stream.writeStream.foreachBatch(
            kmv_stream_commit(table, key_col, group_col, k, run_token=token)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def kmv_distinct_estimates(table: SnapshotTable, k: int) -> list[tuple]:
    """Fold every committed partial per group -> [(grp, estimate)].

    Driver state: groups x k hashes (the final sketches only — the
    distributed applyInPandas fold reduces batches x groups rows to
    one row per group before anything reaches the driver)."""
    import numpy as np
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parts = [
            np.frombuffer(b, dtype=np.uint64) for b in pdf["hashes"] if len(b)
        ]
        merged = merge_hashes(parts, k)
        return pd.DataFrame(
            {"grp": [pdf["grp"].iloc[0]], "hashes": [merged.tobytes()]}
        )

    df = table.read()
    if df is None:
        return []
    folded = (
        df.select("grp", "hashes")
        .groupBy("grp")
        .applyInPandas(fold, "grp string, hashes binary")
        .collect()
    )
    return sorted(
        (
            r["grp"],
            kmv_estimate(np.frombuffer(r["hashes"], dtype=np.uint64), k),
        )
        for r in folded
    )
