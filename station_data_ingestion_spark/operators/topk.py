"""Grouped top-k without shuffling the world.

``row_number() OVER (PARTITION BY g ORDER BY v)`` is exact but ships
EVERY row through the exchange before discarding all but k per group.
Top-k is a monoid — merge(topk(A), topk(B)) == topk(A ∪ B) — so a
per-partition partial pass can discard the non-contenders first:

  phase 1 (narrow, Arrow): each input partition keeps at most k rows
    per group it has seen (state: groups-in-partition × k rows, the
    same bound map-side combine relies on);
  phase 2: only the survivors (≤ partitions × groups × k rows) shuffle,
    and an ordinary window computes the exact final ranks.

Every row of the true global top-k is necessarily in its partition's
partial top-k, so the result is IDENTICAL to the full window — the
oracle gate checks exactly that. At 100 TB with k=10 and 25 groups the
exchange carries thousands of rows instead of 10^12.

The ordering key must be a total order (pass a unique tiebreak) or
boundary ties make the kept set ambiguous on both paths.

[reference: none — engine surface; the classic TakeOrdered-by-key
generalization of Spark's own takeOrdered]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[tuple[str, bool]],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Exact top-k rows per group, ranked 1..k in ``rank_col``.

    ``order_cols``: [(column, descending)] — include a unique tiebreak
    so the order is total. All input columns pass through. Order
    columns must be non-null: pandas sorts NaN last unconditionally
    while Spark's asc puts nulls first, so a null ordering key could
    be pruned in phase 1 yet ranked by phase 2 (filter nulls first or
    coalesce to a sentinel).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = df.columns
    sort_by = [c for c, _ in order_cols]
    ascending = [not d for _, d in order_cols]

    def partial(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            both = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                both.sort_values(sort_by, ascending=ascending, kind="stable")
                .groupby(group_cols, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    schema = df.schema
    survivors = df.mapInPandas(partial, schema)
    order_exprs = [
        (F.col(c).desc() if d else F.col(c).asc()) for c, d in order_cols
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .select(*cols, rank_col)
    )
