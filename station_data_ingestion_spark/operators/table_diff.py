"""Keyed table diff: classify rows between two table versions.

The lakehouse `table_changes` primitive (Delta CDF / Iceberg changelog)
restated as one distributed full-outer join: given two keyed relations
(typically two versions of the same snapshot table, read via
``SnapshotTable.read(version=...)``), every key is classified as

    added      — key only in `new`
    removed    — key only in `old`
    changed    — key in both, compared columns differ (null-safe)
    unchanged  — key in both, compared columns equal

One shuffle per side on the key. At 100 TB a production changelog
would first skip files whose manifest entries are byte-identical
between the two versions (unchanged files can't contribute added/
removed/changed rows) and row-diff only the delta files; the row-level
join here is the semantic baseline that such file-pruning must match.

[reference: none — the reference has no versioned storage; engine
surface beyond it, same family as plans/snapshot_store.py]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key present in either version: key columns
    (coalesced), ``change_type``, and null-safe ``old_data`` /
    ``new_data`` structs of the compared columns.

    Keys must be unique within each version (the snapshot-table merge
    contract already guarantees this for its tables).
    """
    compare_cols = compare_cols or [c for c in old.columns if c not in key]
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in key],
        F.struct(*compare_cols).alias("old_data"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in key],
        F.struct(*compare_cols).alias("new_data"),
    )
    cond = [o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"]) for k in key]
    j = o.join(n, cond, "full_outer")
    in_old = F.col("old_data").isNotNull()
    in_new = F.col("new_data").isNotNull()
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(
            ~F.col("old_data").eqNullSafe(F.col("new_data")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
            for k in key
        ],
        change.alias("change_type"),
        "old_data",
        "new_data",
    )
