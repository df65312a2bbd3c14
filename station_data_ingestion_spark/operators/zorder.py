"""Z-order (Morton) interleaving for multi-dimensional file clustering.

`cluster_by` on a plain column tuple range-partitions lexicographically:
the FIRST key's per-file ranges are tight, later keys' are tight only
within first-key ties — so zone maps prune on one dimension. Bit
interleaving two dimensions into one sort key makes BOTH dimensions'
per-file ranges ~sqrt(n_files) tight, which is exactly Delta's OPTIMIZE
ZORDER trick, reproduced here as a pure Catalyst expression (shifts+ors,
whole-stage codegen'd; no UDF).

Usage:
    df = df.withColumn("__z", zvalue2(F.col("day_num"), F.col("bucket")))
    table.commit_overwrite_partitions(df.drop?, cluster_by=("__z",), ...)
with stat_cols on the ORIGINAL dimension columns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zvalue2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints (a even bits, b odd).

    `bits` bounds each input's width; values are masked to it. The
    expression tree is 2*bits shift/or terms — constant-folded per row
    inside codegen, no Python involved.
    """
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z
