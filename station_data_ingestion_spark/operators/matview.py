"""Transactionally-consistent INCREMENTAL MATERIALIZED VIEWS.

Composes three engine pieces into the thing they exist for:

- the snapshot store's CHANGE DATA FEED supplies row-level deltas of
  the base table (write-time recorded for rewrites, synthesized for
  appends — the base is NEVER rescanned),
- operators/ivm.apply_agg_delta rolls those deltas into the grouped
  SUM/COUNT aggregate (retract old contribution, add new; group births
  and deaths handled),
- the CATALOG's multi-table transaction publishes the refreshed view
  AND its refresh cursor in one atomic pin flip, so a reader resolving
  one catalog snapshot can never see a view that disagrees with the
  cursor it claims, and a view refreshed in the same transaction as a
  base write is indistinguishable from synchronous maintenance.

The refresh cursor lives in the view pin's ``props`` — versioned with
the catalog, so time travel to an old catalog version reads the OLD
view with the OLD cursor, still mutually consistent.

Scale shape: refresh cost is O(changed rows) + O(view size) (the IVM
merge join), not O(base table). A 100 TB fact with a 10k-row daily
delta refreshes by shuffling 10k rows and joining two view-sized
relations. Staleness is observable (``staleness()``) without touching
any data file — two driver-side JSON reads.

[reference: none — the reference has no materialized views; this is
the Materialize/Delta Live Tables maintenance model on the engine's
own storage primitives]
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from station_data_ingestion_spark.operators.ivm import (
    apply_agg_delta,
    apply_join_delta,
    change_feed_to_diff,
    join_agg_delta,
    merge_agg_delta,
)
from station_data_ingestion_spark.plans.catalog import Catalog


class MaterializedView:
    """A grouped SUM/COUNT aggregate of a catalog table, incrementally
    maintained from the base's change feed.

    ``sum_cols`` maps view column -> base column (additive integers —
    the registry's scaled-cents pattern — so retract/add is exact);
    ``key_cols`` are the base's row identity for pairing update
    pre/post images; ``group_cols`` are the view's grouping.
    """

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        base: str,
        group_cols: list[str],
        sum_cols: dict[str, str],
        key_cols: list[str],
        count_col: str = "n_rows",
    ):
        self.catalog = catalog
        self.name = name
        self.base = base
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)
        self.key_cols = list(key_cols)
        self.count_col = count_col

    def _compute_full(self, base_df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        return base_df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).cast("long").alias(self.count_col),
            *[
                F.sum(src).cast("long").alias(name)
                for name, src in self.sum_cols.items()
            ],
        )

    def create(self) -> int:
        """Full initial compute, registered in one transaction with the
        cursor pinned to the base version it reflects."""
        txn = self.catalog.transaction()
        base_v = txn.snap.pinned_version(self.base)
        txn.create_table(
            self.name,
            self._compute_full(txn.read(self.base)),
            partition_cols=(),
            stat_cols=(),
            props={"mv_base": self.base, "mv_cursor": base_v},
        )
        return txn.commit()

    def staleness(self) -> int:
        """Catalog-pinned base versions the view has not absorbed.
        Metadata-only: no data file is opened."""
        s = self.catalog.snapshot()
        return s.pinned_version(self.base) - int(
            s.props(self.name)["mv_cursor"]
        )

    def refresh(self) -> int:
        """Incremental refresh: change feed (cursor, pinned-base] ->
        IVM delta -> one catalog commit flipping view + cursor
        together. Returns the new catalog version (no-op: current).

        Runs in its own transaction touching ONLY the view's pin, so it
        rebases cleanly past concurrent base writes (disjoint tables)
        and conflicts only with a rival refresh — which is exactly the
        pair that must serialize."""
        txn = self.catalog.transaction()
        cursor = int(txn.snap.props(self.name)["mv_cursor"])
        base_v = txn.snap.pinned_version(self.base)
        if base_v == cursor:
            txn.abort()
            return txn.snap.version
        base_t = txn.snap.table(self.base)
        # walk the PINNED version chain only: aborted transactions leave
        # dead-branch table versions whose recorded changes must not
        # leak into the feed (and a pinned append must diff against the
        # previous PIN, not the numerically previous version)
        pinned = sorted(
            {tv for _, tv in self.catalog.pin_history(self.base)}
        )
        chain = [cursor] + [v for v in pinned if cursor < v <= base_v]
        feed = base_t.read_change_feed(
            cursor, to_version=base_v, chain=chain
        )
        if feed is None:
            new_agg = txn.read(self.name)
        else:
            diff = change_feed_to_diff(
                feed,
                self.key_cols,
                # data cols: everything the view needs from the base,
                # MINUS the keys (already in the struct — a group col
                # that is also a key would duplicate the field)
                sorted(
                    (set(self.group_cols) | set(self.sum_cols.values()))
                    - set(self.key_cols)
                ),
            )
            new_agg = apply_agg_delta(
                txn.read(self.name),
                diff,
                self.group_cols,
                self.sum_cols,
                count_col=self.count_col,
            )
        txn.write(
            self.name,
            new_agg,
            props={"mv_base": self.base, "mv_cursor": base_v},
        )
        return txn.commit()

    def read(self, snapshot=None) -> DataFrame:
        s = snapshot or self.catalog.snapshot()
        return s.read(self.name)


class MaterializedJoinView:
    """A materialized INNER JOIN of two catalog tables, incrementally
    maintained from BOTH bases' change feeds by delta-join algebra
    (operators/ivm.apply_join_delta) — the Materialize/DBSP incremental
    join on the engine's own storage.

    ``on`` is the equi-join as (a_col, b_col) pairs; ``a_cols`` /
    ``b_cols`` are each side's view columns (names must be disjoint,
    join columns included); ``a_key`` / ``b_key`` are each base's row
    identity (their union identifies a view row — key-preserving inner
    join). TWO refresh cursors (one per base) live in the view pin's
    props and flip atomically with the view content, so any catalog
    snapshot shows a view that exactly equals
    ``A(cursor_a) JOIN B(cursor_b)`` — the two-base torn-refresh
    invariant.

    Scale shape: a refresh joins each base against the OTHER base's
    changed rows (broadcast delta, zone-map-prunable base probe), nets
    signs over delta pairs only, and applies the net to the view with
    one anti-join — O(deltas + matched rows + view), never a rejoin of
    the bases.
    """

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        base_a: str,
        base_b: str,
        on: list[tuple[str, str]],
        a_cols: list[str],
        b_cols: list[str],
        a_key: list[str],
        b_key: list[str],
    ):
        self.catalog = catalog
        self.name = name
        self.base_a = base_a
        self.base_b = base_b
        self.on = list(on)
        self.a_cols = list(a_cols)
        self.b_cols = list(b_cols)
        self.a_key = list(a_key)
        self.b_key = list(b_key)

    def _props(self, va: int, vb: int) -> dict:
        return {
            "mv_join_a": self.base_a,
            "mv_join_b": self.base_b,
            "mv_cursor_a": va,
            "mv_cursor_b": vb,
        }

    def _compute_full(self, a: DataFrame, b: DataFrame) -> DataFrame:
        cond = [a[ac] == b[bc] for ac, bc in self.on]
        return a.join(b, cond).select(*self.a_cols, *self.b_cols)

    def create(self) -> int:
        txn = self.catalog.transaction()
        va = txn.snap.pinned_version(self.base_a)
        vb = txn.snap.pinned_version(self.base_b)
        txn.create_table(
            self.name,
            self._compute_full(
                txn.read(self.base_a).select(*self.a_cols),
                txn.read(self.base_b).select(*self.b_cols),
            ),
            partition_cols=(),
            stat_cols=(),
            props=self._props(va, vb),
        )
        return txn.commit()

    def staleness(self) -> int:
        """Unabsorbed pinned base commits across BOTH bases —
        metadata-only."""
        s = self.catalog.snapshot()
        p = s.props(self.name)
        return (
            s.pinned_version(self.base_a) - int(p["mv_cursor_a"])
        ) + (s.pinned_version(self.base_b) - int(p["mv_cursor_b"]))

    def _feed_diff(self, txn, base: str, cursor: int, to_v: int, cols):
        """Pinned-chain change feed of one base as a keyed_diff
        changelog; None when the base didn't move."""
        if to_v == cursor:
            return None
        t = txn.snap.table(base)
        pinned = sorted({tv for _, tv in self.catalog.pin_history(base)})
        chain = [cursor] + [v for v in pinned if cursor < v <= to_v]
        feed = t.read_change_feed(cursor, to_version=to_v, chain=chain)
        if feed is None:
            return None
        key = self.a_key if base == self.base_a else self.b_key
        return change_feed_to_diff(
            feed, key, sorted(set(cols) - set(key))
        )

    def refresh(self) -> int:
        """Absorb both bases' pinned change feeds in one delta-join
        pass and publish view + both cursors in ONE atomic pin flip.

        Template shared with MaterializedJoinAggView: the two-cursor
        bookkeeping (no-op abort, pinned-chain feeds, A-at-old-cursor /
        B-at-new-pin reads, atomic props flip) lives HERE once;
        subclasses override only :meth:`_apply_delta`."""
        txn = self.catalog.transaction()
        p = txn.snap.props(self.name)
        ca, cb = int(p["mv_cursor_a"]), int(p["mv_cursor_b"])
        va = txn.snap.pinned_version(self.base_a)
        vb = txn.snap.pinned_version(self.base_b)
        if va == ca and vb == cb:
            txn.abort()
            return txn.snap.version
        diff_a = self._feed_diff(txn, self.base_a, ca, va, self.a_cols)
        diff_b = self._feed_diff(txn, self.base_b, cb, vb, self.b_cols)
        # the identity needs A at the OLD cursor and B at the NEW pin
        a_old = txn.snap.table(self.base_a).read(version=ca).select(
            *self.a_cols
        )
        b_new = txn.snap.table(self.base_b).read(version=vb).select(
            *self.b_cols
        )
        new_view = self._apply_delta(
            txn.read(self.name), a_old, b_new, diff_a, diff_b
        )
        txn.write(self.name, new_view, props=self._props(va, vb))
        return txn.commit()

    def _apply_delta(self, old, a_old, b_new, diff_a, diff_b):
        return apply_join_delta(
            old,
            a_old,
            b_new,
            diff_a,
            diff_b,
            self.on,
            self.a_cols,
            self.b_cols,
            self.a_key + self.b_key,
        )

    def read(self, snapshot=None) -> DataFrame:
        s = snapshot or self.catalog.snapshot()
        return s.read(self.name)


class MaterializedJoinAggView(MaterializedJoinView):
    """A grouped SUM/COUNT aggregate OVER an inner join, incrementally
    maintained WITHOUT ever materializing the join — the Materialize
    core composition: signed pair deltas from the delta-join identity
    are aggregated straight to a per-group delta (operators/ivm.
    join_agg_delta), then merged into the (aggregate-sized) view.

    State is O(groups), refresh is O(deltas x matched base rows) — a
    100 TB fact joined to a dimension with a 10k-row daily delta
    refreshes a revenue-by-segment view by shuffling delta pairs only;
    the join view that a naive maintenance plan would store (as large
    as the fact) never exists anywhere.

    ``group_cols``/``sum_cols`` may draw from EITHER side's columns
    (names disjoint across sides); sums must be additive integers.
    Inherits the two-cursor atomic publish and staleness metadata from
    MaterializedJoinView.
    """

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        base_a: str,
        base_b: str,
        on: list[tuple[str, str]],
        a_cols: list[str],
        b_cols: list[str],
        a_key: list[str],
        b_key: list[str],
        group_cols: list[str],
        sum_cols: dict[str, str],
        count_col: str = "n_rows",
    ):
        super().__init__(
            catalog, name, base_a, base_b, on, a_cols, b_cols, a_key, b_key
        )
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)
        self.count_col = count_col

    def _compute_full(self, a: DataFrame, b: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        cond = [a[ac] == b[bc] for ac, bc in self.on]
        return (
            a.join(b, cond)
            .groupBy(*self.group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias(self.count_col),
                *[
                    F.sum(src).cast("long").alias(name)
                    for name, src in self.sum_cols.items()
                ],
            )
        )

    def _apply_delta(self, old, a_old, b_new, diff_a, diff_b):
        delta = join_agg_delta(
            a_old,
            b_new,
            diff_a,
            diff_b,
            self.on,
            self.group_cols,
            self.sum_cols,
        )
        if delta is None:
            return old
        return merge_agg_delta(
            old,
            delta,
            self.group_cols,
            list(self.sum_cols),
            self.count_col,
        )
