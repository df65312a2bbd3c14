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
    return ordered_prefix_sums(
        df, order_cols, {out_col: value_col}, num_partitions
    )


def ordered_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    values: dict[str, str | Column],
    num_partitions: int = 32,
) -> DataFrame:
    """N running sums over ONE total order in ONE pass: ``values`` maps
    each output column to its integral value expression. Callers that
    need several cumulative columns over the same order (row number +
    running total, say) pay one shuffle + one totals collect + one Arrow
    stage instead of N of each — the fixed costs of the two-phase scan
    are per-ORDER, not per-column (r11 optimization round; int64 sums
    stay bit-exact per column exactly as in the single-column form)."""
    val_cols = {f"__val_{i}": v for i, (_, v) in enumerate(values.items())}
    out_by_tmp = {
        f"__val_{i}": out for i, out in enumerate(values)
    }
    ranged = df
    for tmp, v in val_cols.items():
        value = F.col(v) if isinstance(v, str) else v
        ranged = ranged.withColumn(tmp, value.cast("long"))
    ranged = ranged.repartitionByRange(
        num_partitions, *order_cols
    ).sortWithinPartitions(*order_cols)
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
        r["p"]: tuple(r[f"t_{tmp}"] or 0 for tmp in val_cols)
        for r in ranged.groupBy(F.spark_partition_id().alias("p"))
        .agg(*[F.sum(tmp).alias(f"t_{tmp}") for tmp in val_cols])
        .collect()
    }
    offsets: dict[int, tuple] = {}
    acc = tuple(0 for _ in val_cols)
    for pid in sorted(totals):
        offsets[pid] = acc
        acc = tuple(a + t for a, t in zip(acc, totals[pid]))

    out_schema = type(df.schema)(
        [f for f in ranged.schema.fields if f.name not in val_cols]
        + [StructField(out, LongType(), True) for out in values]
    )
    out_names = [f.name for f in out_schema.fields]
    tmp_names = list(val_cols)
    zeros = tuple(0 for _ in val_cols)

    def cumsum(batches):
        from pyspark import TaskContext

        acc = list(offsets.get(TaskContext.get().partitionId(), zeros))
        for pdf in batches:
            out = pdf.drop(columns=tmp_names)
            for j, tmp in enumerate(tmp_names):
                out[out_by_tmp[tmp]] = pdf[tmp].cumsum() + acc[j]
                acc[j] += int(pdf[tmp].sum())
            yield out[out_names]

    return ranged.mapInPandas(cumsum, out_schema)
