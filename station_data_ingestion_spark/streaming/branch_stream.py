"""Branch-publish streaming ingestion: stage each micro-batch on an
Iceberg-style BRANCH, cleanse it there, fast-forward to publish.

The branch generalization of write-audit-publish (wap_stream.py): WAP
can only accept or reject a staged batch whole, but a branch is a full
table — the batch lands there AND gets row-level CORRECTIONS
(copy-on-write deletes of rows failing the rule) before ONE atomic
metadata publish exposes everything together. No reader ever sees an
uncleansed row, and no good row is thrown away with the bad ones.

Exactly-once on failure replay: batches commit under their own
partition, and a replayed batch re-forks from the already-published
main and overwrites only its own partition — identical content, so the
fast-forward is idempotent. Sequential micro-batches guarantee the
fast-forward's unchanged-main precondition; a rival writer outside the
stream surfaces as ConcurrentCommitError (the rollback leaves the
batch branch intact for the retry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def branch_publish_commit(
    table: SnapshotTable,
    bad_row_pred: Column | str,
    run_token: str = "run",
    stats: dict | None = None,
):
    """foreachBatch callback: fork -> append -> cleanse -> publish."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        name = f"{run_token}-{int(batch_id)}"
        if name in table.branches():
            # crash between a half-built branch and its publish: the
            # replayed batch rebuilds from scratch
            table.delete_branch(name)
        br = table.create_branch(name)
        br.commit_overwrite_partitions(
            batch_df.withColumn("batch_id", F.lit(name))
        )
        pred = (
            F.expr(bad_row_pred)
            if isinstance(bad_row_pred, str)
            else bad_row_pred
        )
        # everything batch-scoped: the branch references ALL of main's
        # published data as external entries, so unscoped reads/deletes
        # would pay O(table) per micro-batch. The cleanse predicate is
        # pinned to this batch's partition (published rows were already
        # cleansed by their own batches) and the counts read only it.
        scope = F.col("batch_id") == name
        before = br.read(partition={"batch_id": name}).count()
        br.delete_where(scope & pred)
        removed = before - br.read(partition={"batch_id": name}).count()
        table.fast_forward(name)
        if stats is not None:
            stats["published"] = stats.get("published", 0) + 1
            stats["cleansed_rows"] = stats.get("cleansed_rows", 0) + removed

    return commit


def run_branch_publish_stream(
    stream: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    bad_row_pred: Column | str,
    stats: dict | None = None,
):
    """Start (availableNow) the branch-publish stream into `table`."""
    import hashlib

    token = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return (
        stream.writeStream.foreachBatch(
            branch_publish_commit(
                table, bad_row_pred, run_token=token, stats=stats
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
