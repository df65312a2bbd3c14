"""Distributed ordered prefix sum (global running total without a
single-partition window).

``Window.orderBy(...)`` with no partitionBy moves EVERY row to one
partition -- the classic scale-killer for global cumulative sums. The
textbook two-phase scan used here keeps the data distributed AND
shuffles the full data set only once:

1. range-repartition on the order key (Spark's sort machinery: sampled
   range boundaries, even spread), then sort within partitions -- the
   one full shuffle;
2. per-partition totals (one tiny row per partition, a partial-agg
   shuffle of ~num_partitions rows) are collected and prefix-summed on
   the driver;
3. an Arrow ``mapInPandas`` pass streams each partition in order,
   accumulating the running sum from that partition's offset -- a
   NARROW stage: no second shuffle of the data, unlike a
   Window.partitionBy(partition_id) formulation which hash-exchanges
   every row again.

The driver-side collect is bounded by the partition count (dozens to a
few thousand rows at any scale), not the data. INTEGER value columns
are required for bit-exact results: int64 accumulation is associative,
so the output is identical to a serial scan regardless of partitioning
or Arrow batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    out_col: str = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the TOTAL
    order given by ``order_cols`` (which must be a unique key), keeping
    the frame distributed. The running sum is inclusive of the current
    row. ``value_col`` must be integral (exactness contract above)."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    ranged = (
        df.withColumn("__val", value.cast("long"))
        .repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
    )
    # eager localCheckpoint, NOT persist: the totals pass and the cumsum
    # pass must see the SAME partitioning (repartitionByRange samples
    # boundaries nondeterministically between actions otherwise).
    # Checkpointing cuts the lineage so a recompute with different
    # boundaries is impossible, and — unlike persist(), whose
    # CacheManager entry lives until an explicit unpersist this operator
    # has no hook to issue (r3/r4 ADVICE: one leaked cached frame per
    # call) — the materialized blocks are reclaimed by the
    # ContextCleaner as soon as the returned frame is garbage-collected.
    ranged = ranged.localCheckpoint(eager=True)
    totals = {
        r["p"]: r["t"]
        for r in ranged.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("__val").alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    out_schema = type(df.schema)(
        [f for f in ranged.schema.fields if f.name != "__val"]
        + [StructField(out_col, LongType(), True)]
    )
    out_names = [f.name for f in out_schema.fields]

    def cumsum(batches):
        from pyspark import TaskContext

        acc = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            run = pdf["__val"].cumsum() + acc
            acc += int(pdf["__val"].sum())
            out = pdf.drop(columns="__val")
            out[out_col] = run
            yield out[out_names]

    return ranged.mapInPandas(cumsum, out_schema)
