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
    return merge_agg_delta(
        old_agg, delta, group_cols, list(sum_cols), count_col
    )


def merge_agg_delta(
    old_agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_names: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Full-outer merge of a grouped SUM/COUNT aggregate with a
    per-group delta frame (``group_cols`` + ``_dn`` + ``sum_names``):
    group births arrive through the outer join, deaths fall out when
    the count reaches zero. One join of two aggregate-sized relations."""
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
            for name in sum_names
        ],
    ).where(F.col(count_col) > 0)


def join_agg_delta(
    a_old: DataFrame,
    b_new: DataFrame,
    diff_a: DataFrame | None,
    diff_b: DataFrame | None,
    on: list[tuple[str, str]],
    group_cols: list[str],
    sum_cols: dict[str, str],
) -> DataFrame | None:
    """Per-group delta of a grouped SUM/COUNT over an INNER JOIN,
    WITHOUT materializing the join: the signed pair deltas of
    d(A JOIN B) = dA JOIN B_new + A_old JOIN dB (see apply_join_delta)
    are aggregated straight to (group_cols, _dn, sums) — the join view
    itself never exists, only its aggregate-sized delta. SUM/COUNT are
    self-maintainable under signed deltas, which is exactly why this
    composes; the result feeds :func:`merge_agg_delta`. Returns None
    when neither base changed. Scale: the only joins are
    (tiny delta) x (base), and the shuffle is |delta pairs| rows on the
    group key."""
    need = sorted(set(group_cols) | set(sum_cols.values()))
    terms = []
    if diff_a is not None:
        da = diff_signed(diff_a, [c for c in diff_a.select("new_data.*").columns])
        cond = [da[ac] == b_new[bc] for ac, bc in on]
        terms.append(da.join(b_new, cond).select(*need, "_sign"))
    if diff_b is not None:
        db = diff_signed(diff_b, [c for c in diff_b.select("new_data.*").columns])
        cond = [a_old[ac] == db[bc] for ac, bc in on]
        terms.append(a_old.join(db, cond).select(*need, "_sign"))
    if not terms:
        return None
    pairs = terms[0]
    for t in terms[1:]:
        pairs = pairs.unionAll(t)
    return pairs.groupBy(*group_cols).agg(
        F.sum("_sign").cast("long").alias("_dn"),
        *[
            F.sum(F.col(src) * F.col("_sign")).cast("long").alias(name)
            for name, src in sum_cols.items()
        ],
    )


def diff_signed(diff: DataFrame, cols: list[str]) -> DataFrame:
    """keyed_diff changelog -> signed row multiset: each output row is
    the row's ``cols`` plus ``_sign`` (+1 for an added/post image, -1
    for a removed/pre image). An update contributes both rows; a
    no-op update (pre == post on ``cols``) cancels downstream when the
    consumer nets signs by full row."""
    neg = diff.where(
        F.col("change_type").isin("removed", "changed")
    ).select(
        *[F.col(f"old_data.{c}").alias(c) for c in cols],
        F.lit(-1).cast("long").alias("_sign"),
    )
    pos = diff.where(
        F.col("change_type").isin("added", "changed")
    ).select(
        *[F.col(f"new_data.{c}").alias(c) for c in cols],
        F.lit(1).cast("long").alias("_sign"),
    )
    return neg.unionAll(pos)


def apply_join_delta(
    old_view: DataFrame,
    a_old: DataFrame,
    b_new: DataFrame,
    diff_a: DataFrame | None,
    diff_b: DataFrame | None,
    on: list[tuple[str, str]],
    a_cols: list[str],
    b_cols: list[str],
    key_cols: list[str],
) -> DataFrame:
    """Roll keyed changelogs of BOTH join inputs into a materialized
    inner-join view without recomputing the join.

    The bag-algebra identity (DBSP / classic delta-join maintenance):
    with ``A_new = A_old + dA`` and ``B_new = B_old + dB``,

        d(A JOIN B) = dA JOIN B_new  +  A_old JOIN dB

    (the asymmetric form absorbs the ``dA JOIN dB`` cross term exactly:
    a pair built from a retracted A row and an added B row gets -1 from
    the first term and +1 from the second, netting to the 0 it was
    never in the view with). Signs multiply through the join; the net
    per full output row is +1 (insert into the view), -1 (retract), or
    0 (discard — e.g. an update that didn't touch any view column).

    ``on`` is a list of (a_col, b_col) equi-join pairs; ``a_cols`` /
    ``b_cols`` are each side's view columns (disjoint names, join cols
    included); ``key_cols`` is the composite row identity of the view
    (each side's primary key), used to apply retractions by anti-join.

    Scale shape: both delta terms join a FULL base against a
    changed-row set — Catalyst/AQE broadcasts the (small) delta, and a
    base laid out on its join key prunes by zone maps before probing,
    so refresh cost is O(|dA| + |dB| + matched base rows + |view|),
    never a rescan of both bases. The net step shuffles only delta
    pairs. [reference: none — engine surface in the
    Materialize/DBSP incremental join family]
    """
    view_cols = list(a_cols) + list(b_cols)
    overlap = set(a_cols) & set(b_cols)
    if overlap:
        raise ValueError(
            f"a_cols/b_cols must be disjoint, both carry {sorted(overlap)}"
        )
    terms = []
    if diff_a is not None:
        da = diff_signed(diff_a, a_cols)
        cond = [da[ac] == b_new[bc] for ac, bc in on]
        terms.append(
            da.join(b_new, cond).select(*view_cols, "_sign")
        )
    if diff_b is not None:
        db = diff_signed(diff_b, b_cols)
        cond = [a_old[ac] == db[bc] for ac, bc in on]
        terms.append(
            a_old.join(db, cond).select(*view_cols, "_sign")
        )
    if not terms:
        return old_view
    delta = terms[0]
    for t in terms[1:]:
        delta = delta.unionAll(t)
    net = (
        delta.groupBy(*view_cols)
        .agg(F.sum("_sign").alias("_s"))
        .where(F.col("_s") != 0)
    )
    retract_keys = (
        net.where(F.col("_s") < 0).select(*key_cols).distinct()
    )
    added = net.where(F.col("_s") > 0).select(*view_cols)
    return old_view.join(
        retract_keys, key_cols, "left_anti"
    ).unionByName(added)


def change_feed_to_diff(
    feed: DataFrame, key_cols: list[str], data_cols: list[str]
) -> DataFrame:
    """Adapt a snapshot-store CHANGE FEED (read_change_feed) to the
    keyed_diff changelog shape apply_agg_delta consumes.

    - ``insert``  -> ``added`` (new_data)
    - ``delete``  -> ``removed`` (old_data)
    - ``update_preimage`` + ``update_postimage`` of the same key within
      the same commit pair up into one ``changed`` row (old_data,
      new_data) — the equi-join is on (key, _commit_version), so a key
      updated in several commits yields one changed row per commit, in
      feed order, exactly like replaying the changelog.

    Composition: SnapshotTable.read_change_feed -> change_feed_to_diff
    -> apply_agg_delta maintains a grouped aggregate straight from the
    store's recorded deltas — the fact table is never rescanned.
    """
    cols = key_cols + data_cols
    data = F.struct(*cols)
    ins = feed.filter(F.col("_change_type") == "insert").select(
        F.lit("added").alias("change_type"),
        F.lit(None).cast(
            feed.select(data.alias("x")).schema["x"].dataType
        ).alias("old_data"),
        data.alias("new_data"),
    )
    dele = feed.filter(F.col("_change_type") == "delete").select(
        F.lit("removed").alias("change_type"),
        data.alias("old_data"),
        F.lit(None).cast(
            feed.select(data.alias("x")).schema["x"].dataType
        ).alias("new_data"),
    )
    pre = feed.filter(F.col("_change_type") == "update_preimage").select(
        *key_cols, "_commit_version", data.alias("old_data")
    )
    post = feed.filter(F.col("_change_type") == "update_postimage").select(
        *key_cols, "_commit_version", data.alias("new_data")
    )
    chg = pre.join(post, key_cols + ["_commit_version"]).select(
        F.lit("changed").alias("change_type"), "old_data", "new_data"
    )
    return ins.unionByName(dele).unionByName(chg)
