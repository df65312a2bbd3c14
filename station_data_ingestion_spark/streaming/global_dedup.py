"""Cross-restart exactly-once streaming dedup into the snapshot store.

``dropDuplicatesWithinWatermark`` bounds its state by the watermark
horizon — the right call for unbounded streams, but its state lives in
the QUERY's checkpoint: a new deployment (fresh checkpoint) or an id
recurring after the watermark passes slips through. This operator
closes that hole by making the TABLE the dedup state:

each micro-batch (foreachBatch)
  1. drops in-batch duplicates,
  2. anti-joins against the ids already committed to the snapshot
     table (ALL history, not a watermark window),
  3. commits the surviving rows under the batch's own partition.

Because the delivered rows and the "seen" ids are the same atomic
snapshot commit, there is no two-phase gap: a crash before the commit
replays the batch into the same partition (idempotent overwrite), a
crash after it finds the ids already present. Restarts — even with a
brand-new checkpoint — dedup against everything ever committed.

At 100 TB the anti-join is one shuffle per micro-batch keyed on the
id; the scale levers are the ones this engine already ships: a Bloom
pre-filter (operators/bloom.py) in front of the exact anti-join to
skip the non-colliding majority, and id-range zone maps on the table
(stat_cols) so the join reads only candidate files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def global_dedup_commit(
    table: SnapshotTable, id_col: str = "event_id", run_token: str = "run"
):
    """foreachBatch callback: dedup `batch_df` against the table's full
    history and commit survivors under the batch partition.

    The partition key is ``{run_token}-{batch_id}``: batch ids restart
    at 0 for every fresh checkpoint, so two deployments would otherwise
    overwrite each other's partitions. The token must be stable across
    failure-replays of the SAME deployment (idempotent overwrite of a
    half-committed batch) and distinct across deployments —
    :func:`run_global_dedup_stream` derives it from the checkpoint
    location, which has exactly those properties."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.dropDuplicates([id_col])
        cur = table.read() if table.exists() else None
        if cur is not None:
            b = b.join(cur.select(id_col), id_col, "left_anti")
        table.commit_overwrite_partitions(
            b.withColumn("batch_id", F.lit(f"{run_token}-{int(batch_id)}"))
        )

    return commit


def run_global_dedup_stream(
    stream: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    id_col: str = "event_id",
):
    """Start (availableNow) a stream that commits globally-deduped rows
    into `table`; returns the StreamingQuery (caller awaits)."""
    import hashlib

    token = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return (
        stream.writeStream.foreachBatch(
            global_dedup_commit(table, id_col, run_token=token)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
