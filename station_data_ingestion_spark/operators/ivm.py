"""Incremental view maintenance: apply a keyed changelog to a grouped
aggregate without recomputing it.

Given a materialized SUM/COUNT aggregate of a table version and the
keyed diff to a newer version (operators/table_diff.py — the
table_changes/CDF primitive), the new aggregate is

    new_agg = old_agg  (+)  delta(diff)

where the delta re-aggregates ONLY the changed keys: each removed or
changed row retracts its old contribution from its OLD group, each
added or changed row adds its new contribution to its NEW group — so
rows that move between groups are handled, groups can be born (first
contribution arrives via the full-outer join) and die (count falls to
zero and is eliminated). SUM and COUNT are self-maintainable under
insert/delete/update, which is exactly why they're the supported set;
MIN/MAX are not (a retraction can expose an unknown second-best) and
are deliberately not offered.

At 100 TB this is the difference between touching the (tiny) changed-key
set plus the (small) aggregate table and rescanning the fact table: the
delta shuffles |changed keys| rows on the group key, the merge joins two
aggregate-sized relations. The changelog itself comes from the snapshot
store's commit metadata at file granularity; keyed_diff is the semantic
baseline for it (see table_diff.py).

[reference: none — the reference has no materialized views; engine
surface in the Delta/Materialize IVM family]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_agg_delta(
    old_agg: DataFrame,
    diff: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Roll a keyed_diff changelog into a grouped SUM/COUNT aggregate.

    ``old_agg``: one row per group: ``group_cols`` + ``count_col`` +
    the keys of ``sum_cols``. ``diff``: output of
    :func:`..operators.table_diff.keyed_diff`; every ``group_cols`` and
    every ``sum_cols`` VALUE must be among its compared columns (they
    ride in the ``old_data``/``new_data`` structs). ``sum_cols`` maps
    aggregate column name -> source column name. Sums must be additive
    integers (the registry's scaled-cents pattern) so retract/add is
    exact.
    """
    retract = diff.where(
        F.col("change_type").isin("removed", "changed")
    ).select(
        *[F.col(f"old_data.{g}").alias(g) for g in group_cols],
        F.lit(-1).cast("long").alias("_dn"),
        *[
            (-F.col(f"old_data.{src}")).alias(name)
            for name, src in sum_cols.items()
        ],
    )
    add = diff.where(F.col("change_type").isin("added", "changed")).select(
        *[F.col(f"new_data.{g}").alias(g) for g in group_cols],
        F.lit(1).cast("long").alias("_dn"),
        *[
            F.col(f"new_data.{src}").alias(name)
            for name, src in sum_cols.items()
        ],
    )
    delta = (
        retract.unionAll(add)
        .groupBy(*group_cols)
        .agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(name).alias(name) for name in sum_cols],
        )
    )
    merged = old_agg.alias("a").join(
        delta.alias("d"),
        [
            F.col(f"a.{g}").eqNullSafe(F.col(f"d.{g}"))
            for g in group_cols
        ],
        "full_outer",
    )
    zero = F.lit(0).cast("long")
    return merged.select(
        *[
            F.coalesce(F.col(f"a.{g}"), F.col(f"d.{g}")).alias(g)
            for g in group_cols
        ],
        (
            F.coalesce(F.col(f"a.{count_col}"), zero)
            + F.coalesce(F.col("d._dn"), zero)
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(f"a.{name}"), zero)
                + F.coalesce(F.col(f"d.{name}"), zero)
            ).alias(name)
            for name in sum_cols
        ],
    ).where(F.col(count_col) > 0)
