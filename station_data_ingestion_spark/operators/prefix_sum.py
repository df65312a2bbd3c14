"""Distributed ordered prefix sum (global running total without a
single-partition window).

``Window.orderBy(...)`` with no partitionBy moves EVERY row to one
partition -- the classic scale-killer for global cumulative sums. The
textbook two-phase scan used here keeps the data distributed:

1. range-repartition on the order key (Spark's sort machinery: sampled
   range boundaries, even spread);
2. per-partition running sum via a window PARTITIONED by the physical
   partition id (parallel, partition-local);
3. per-partition totals (one tiny row per partition) are collected,
   prefix-summed on the driver, and joined back as broadcast offsets.

The driver-side collect is bounded by the partition count (dozens to a
few thousand rows at any scale), not the data. Integer value columns
make the result bit-identical to a serial scan regardless of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


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
    row."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__val", value)
        .withColumn("__pid", F.spark_partition_id())
    )
    # cache: the totals pass and the main pass must see the SAME
    # partitioning (repartitionByRange samples boundaries
    # nondeterministically between actions otherwise)
    ranged = ranged.persist()
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid").agg(F.sum("__val").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn(out_col, F.sum("__val").over(w) + offset_expr)
        .drop("__val", "__pid")
    )
