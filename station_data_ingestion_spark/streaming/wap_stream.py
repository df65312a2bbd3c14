"""Audit-gated streaming ingestion: write-audit-publish per micro-batch.

The quality-gate composition of the engine's streaming sink and the
snapshot store's WAP primitives: every micro-batch is STAGED (invisible
to readers), audited as a DataFrame, and only then atomically published
— a poisoned batch is aborted whole, its files physically removed, and
the table never exposes a row that failed the audit. Batches commit
under their own partition, so a failure-replay of batch N idempotently
overwrites only batch N while published neighbors survive.

This is the streaming shape of Iceberg's WAP branch workflow; the
audit runs on the staged data itself (read_staged), not on a sample of
the in-flight batch, so what is checked is exactly what would become
visible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def wap_commit(
    table: SnapshotTable,
    audit: Callable[[DataFrame], bool],
    run_token: str = "run",
    stats: dict | None = None,
):
    """foreachBatch callback: stage -> audit -> publish-or-abort."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        tok = table.stage_commit(
            batch_df.withColumn(
                "batch_id", F.lit(f"{run_token}-{int(batch_id)}")
            )
        )
        staged = table.read_staged(tok)
        ok = staged is not None and audit(staged)
        if ok:
            table.publish_staged(tok)
        else:
            table.abort_staged(tok)
        if stats is not None:
            key = "published" if ok else "aborted"
            stats[key] = stats.get(key, 0) + 1

    return commit


def run_wap_stream(
    stream: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    audit: Callable[[DataFrame], bool],
    stats: dict | None = None,
):
    """Start (availableNow) the audit-gated stream into `table`."""
    import hashlib

    token = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return (
        stream.writeStream.foreachBatch(
            wap_commit(table, audit, run_token=token, stats=stats)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
