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
    """foreachBatch callback: fork -> append -> cleanse -> publish.

    Requires ``batch_id`` in the table's partition columns — the
    cleanse/count scope and exactly-once replay both key on the batch
    partition, so a mispartitioned table would silently pay O(table)
    per micro-batch and break replay idempotence."""
    if "batch_id" not in table.partition_cols:
        raise ValueError(
            "branch_publish_commit requires 'batch_id' in the table's "
            f"partition_cols (got {tuple(table.partition_cols)}): batch "
            "scoping and replay idempotence key on it"
        )

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        name = f"{run_token}-{int(batch_id)}"
        if batch_df.isEmpty():
            # an empty micro-batch publishes 0 rows: forking a branch
            # would stage no files and the scoped read below returns
            # None — skip the fork/cleanse entirely (replay of an empty
            # batch is trivially idempotent)
            if stats is not None:
                stats["published"] = stats.get("published", 0) + 1
            return
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
        # a fully-bad batch deletes every row of its partition; the
        # scoped read then returns None (no surviving files) — that is
        # a legitimate publish of 0 rows, not a crash
        after_df = br.read(partition={"batch_id": name})
        removed = before - (0 if after_df is None else after_df.count())
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
