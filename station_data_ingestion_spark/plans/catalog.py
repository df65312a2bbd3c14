"""Multi-table atomic transactions: a versioned CATALOG over snapshot tables.

The snapshot store commits are atomic PER TABLE (one manifest rename).
A pipeline that maintains a fact table plus derived tables (a rollup, a
dedup index, a replica) needs writes to several tables to become visible
TOGETHER — otherwise a reader can join a new fact against a stale rollup
and get an answer no serial execution ever produced (a torn multi-table
read). Delta has no cross-table transactions; Iceberg gets them from the
REST catalog's multi-table commit. This module is that design over the
existing store:

- the catalog owns ONE commit log, ``<root>/_catalog/v{N}.json``; each
  version maps ``table name -> {path, version}`` — the PINNED snapshot
  version of every registered table
- table-level commits still publish table manifests as before, but a
  catalog reader never resolves "latest": it resolves the PIN. A table
  version that no catalog version pins is invisible (inert metadata,
  same as an Iceberg metadata file the catalog pointer never reached)
- a transaction stages all its table writes (publishing table-level
  versions, invisible through the catalog), then publishes ONE new
  catalog manifest flipping every touched pin at once — the same
  rename-without-overwrite CAS the tables use. Readers see all of the
  transaction's writes or none of them
- conflict rule (serializable at table granularity): if a rival catalog
  commit lands first, the transaction REBASES when the rival touched
  only disjoint tables (pin-merge, no data rewrite) and RAISES
  ``ConcurrentCommitError`` when any touched table overlaps — the
  caller re-reads through a fresh snapshot and redoes its computation,
  exactly like the single-table MERGE CAS.

Scale note: a catalog manifest is O(#tables) — driver-side JSON, no data
I/O. Snapshot resolution is ONE read regardless of how many tables the
query joins; at 100 TB this is the metadata plane, identical in shape to
an Iceberg REST catalog commit, and never touches the data plane.

[reference: README.md:41-43 — the rerunnable ingestion loop's "merge then
update derived state" step is what these transactions make atomic.]
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from station_data_ingestion_spark.plans.snapshot_store import (
    ConcurrentCommitError,
    SnapshotTable,
    _fs,
)

_CATDIR = "_catalog"
_MAX_TXN_ATTEMPTS = 20


class CatalogSnapshot:
    """An immutable view of the catalog: one version's pins.

    All reads through one snapshot are mutually consistent — they came
    from one atomic catalog commit, so no transaction is half-visible.
    """

    def __init__(self, catalog: "Catalog", version: int, pins: dict,
                 views: dict | None = None):
        self.catalog = catalog
        self.version = version
        self._pins = pins  # name -> {"path": str, "version": int, **opts}

        self._views = dict(views or {})

    def tables(self) -> list[str]:
        return sorted(self._pins)

    def pinned_version(self, name: str) -> int:
        return int(self._pins[name]["version"])

    def props(self, name: str) -> dict:
        """The pin's metadata dict (empty if none was ever set)."""
        return dict(self._pins[name].get("props", {}))

    def table(self, name: str) -> SnapshotTable:
        return self.catalog._table(self._pins[name])

    def read(self, name: str, **kw) -> DataFrame:
        """Read ``name`` AT ITS PINNED VERSION (kw forwarded to
        SnapshotTable.read — ranges/partition/point pruning all work)."""
        if name not in self._pins:
            raise KeyError(f"table '{name}' not in catalog v{self.version}")
        ent = self._pins[name]
        return self.catalog._table(ent).read(version=int(ent["version"]), **kw)

    def views(self) -> list[str]:
        return sorted(self._views)

    def read_view(self, name: str) -> DataFrame:
        """Execute a catalog VIEW at THIS snapshot: every referenced
        table resolves to its PINNED version (and referenced views
        expand recursively, creation order), so a view over N tables is
        transactionally consistent — the same guarantee a pinned
        multi-table read gives, now behind a name. Registers the
        snapshot's tables (and earlier views) as session temp views
        under their catalog names before parsing."""
        if name not in self._views:
            raise KeyError(f"no view '{name}' in catalog")
        for t in self.tables():
            self.read(t).createOrReplaceTempView(t)
        out = None
        for vname, spec in self._views.items():
            df = self.catalog.spark.sql(spec["sql"])
            df.createOrReplaceTempView(vname)
            if vname == name:
                out = df
        return out


class Catalog:
    """Versioned name->pinned-table-version mapping with atomic
    multi-table commits. ``root`` holds ``_catalog/`` plus (by default)
    one subdirectory per table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # -- commit-log plumbing (same CAS shape as SnapshotTable) -----------

    def _cat_path(self, version: int) -> str:
        return f"{self.root}/{_CATDIR}/v{version:012d}.json"

    def latest_version(self) -> int | None:
        fs, path, _ = _fs(self.spark, f"{self.root}/{_CATDIR}")
        if not fs.exists(path):
            return None
        best = None
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                try:
                    n = int(name[1:-5])
                except ValueError:
                    continue
                best = n if best is None else max(best, n)
        return best

    def _read_cat(self, version: int) -> dict:
        fs, path, jvm = _fs(self.spark, self._cat_path(version))
        stream = fs.open(path)
        try:
            text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        return json.loads(text)

    def _write_cat_exclusive(self, version: int, doc: dict) -> bool:
        fs, dest, jvm = _fs(self.spark, self._cat_path(version))
        fs.mkdirs(dest.getParent())
        if fs.exists(dest):
            return False
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{self.root}/{_CATDIR}/.tmp-{uuid.uuid4().hex}.json"
        )
        out = fs.create(tmp, False)
        try:
            out.write(json.dumps(doc, indent=1).encode("utf-8"))
        finally:
            out.close()
        ok = fs.rename(tmp, dest)
        if not ok:
            fs.delete(tmp, False)
        return bool(ok)

    def _table(self, ent: dict) -> SnapshotTable:
        opts = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in ent.get("opts", {}).items()
        }
        return SnapshotTable(self.spark, ent["path"], **opts)

    # -- public surface ---------------------------------------------------

    def init(self) -> int:
        """Create catalog version 0 with no tables (idempotent)."""
        v = self.latest_version()
        if v is not None:
            return v
        self._write_cat_exclusive(0, {"pins": {}})
        return 0

    def snapshot(self, version: int | None = None) -> CatalogSnapshot:
        v = self.latest_version() if version is None else version
        if v is None:
            raise ValueError("catalog has no versions — call init()")
        doc = self._read_cat(v)
        return CatalogSnapshot(
            self, v, doc["pins"], views=doc.get("views", {})
        )

    def transaction(self) -> "CatalogTransaction":
        return CatalogTransaction(self, self.snapshot())

    def pin_history(self, name: str) -> list[tuple[int, int]]:
        """(catalog_version, pinned_table_version) pairs for ``name``,
        ascending, one per catalog version that pins it. The distinct
        table versions here are the table's PINNED history — the only
        versions that were ever visible through the catalog (aborted
        transactions' dead-branch versions are absent). Driver-side
        JSON reads only."""
        out = []
        hi = self.latest_version()
        if hi is None:
            return out
        for cv in range(hi + 1):
            pins = self._read_cat(cv)["pins"]
            if name in pins:
                out.append((cv, int(pins[name]["version"])))
        return out


class CatalogTransaction:
    """Optimistic multi-table transaction. Usage:

        txn = cat.transaction()
        df = txn.read("fact")              # reads at the txn's snapshot
        txn.write("fact", new_fact)        # stages: invisible until commit
        txn.write("rollup", new_rollup)
        txn.commit()                       # ONE atomic pin flip

    ``write`` publishes a TABLE-level version immediately (data lands in
    the table's tree) but no catalog reader can see it until ``commit``
    publishes the new pin set. A lost-race commit rebases over rivals
    that touched disjoint tables and raises ConcurrentCommitError when a
    touched table overlaps (stale read-modify-write); failed or aborted
    transactions leave only unpinned table versions — inert, reaped by
    the tables' own ``vacuum``.
    """

    def __init__(self, catalog: Catalog, snap: CatalogSnapshot):
        self.catalog = catalog
        self.snap = snap
        self._new_pins: dict[str, dict] = {}
        self._new_views: dict[str, dict | None] = {}  # None = drop
        self._done = False

    def read(self, name: str, **kw) -> DataFrame:
        """Snapshot-isolated read; sees this txn's own staged writes."""
        if name in self._new_pins:
            ent = self._new_pins[name]
            return self.catalog._table(ent).read(
                version=int(ent["version"]), **kw
            )
        return self.snap.read(name, **kw)

    def create_table(
        self,
        name: str,
        df: DataFrame,
        path: str | None = None,
        props: dict | None = None,
        **table_opts,
    ) -> None:
        """Stage a brand-new table with df as its version-0 content.
        ``props``: arbitrary JSON metadata carried on the pin (e.g. a
        materialized view's refresh cursor) — versioned with the
        catalog, flipped atomically with the data."""
        if name in self.snap._pins or name in self._new_pins:
            raise ValueError(f"table '{name}' already exists")
        path = path or f"{self.catalog.root}/{name}"
        json_opts = {
            k: list(v) if isinstance(v, tuple) else v
            for k, v in table_opts.items()
        }
        ent = {"path": path, "opts": json_opts}
        if props:
            ent["props"] = dict(props)
        t = self.catalog._table(ent)
        ent["version"] = t.commit_overwrite_partitions(df)
        self._new_pins[name] = ent

    def write(
        self, name: str, df: DataFrame, props: dict | None = None, **commit_kw
    ) -> int:
        """Stage a partition-overwrite commit against ``name``.

        The staged TABLE version is just storage — invisible and
        unnamed until the catalog pin flips. Conflicts are detected at
        :meth:`commit` by comparing pins (catalog-level serializable,
        the Iceberg-REST-catalog model): a table-level CAS here would
        false-positive on unpinned versions abandoned by aborted or
        crashed transactions, wedging the table forever. ``props``
        replaces the pin's metadata when given (pass the full dict)."""
        if name in self._new_pins and "version" in self._new_pins[name]:
            base_ent = self._new_pins[name]
        elif name in self.snap._pins:
            base_ent = self.snap._pins[name]
        else:
            raise KeyError(f"table '{name}' not in catalog")
        t = self.catalog._table(base_ent)
        # content builds on the txn's PINNED version: untouched
        # partitions must come from what this txn read, never from a
        # dead-branch version an aborted txn left at a higher number
        v = t.commit_overwrite_partitions(
            df, content_base=int(base_ent["version"]), **commit_kw
        )
        ent = dict(base_ent)
        ent["version"] = v
        if props is not None:
            ent["props"] = dict(props)
        self._new_pins[name] = ent
        return v

    def create_view(self, name: str, sql: str) -> None:
        """Stage a logical VIEW: SQL text over catalog table (and
        earlier view) names, stored in the catalog document and flipped
        atomically with the pins. Validated HERE by resolving against
        this transaction's snapshot (including its own staged writes) —
        a typo'd column or table fails at create time, not first read."""
        if name in self.snap._pins or name in self._new_pins:
            raise ValueError(f"'{name}' already names a table")
        if name in self.snap._views or name in self._new_views:
            raise ValueError(f"view '{name}' already exists")
        for t in self.snap.tables():
            self.read(t).createOrReplaceTempView(t)
        for n in self._new_pins:
            self.read(n).createOrReplaceTempView(n)
        for vname, spec in {**self.snap._views,
                            **{k: v for k, v in self._new_views.items()
                               if v is not None}}.items():
            self.catalog.spark.sql(spec["sql"]).createOrReplaceTempView(
                vname
            )
        # parse + analyze now (schema forces resolution, no execution)
        self.catalog.spark.sql(sql).schema
        self._new_views[name] = {"sql": sql}

    def drop_view(self, name: str) -> None:
        if name not in self.snap._views and self._new_views.get(name) is None:
            raise KeyError(f"no view '{name}'")
        self._new_views[name] = None

    def commit(self) -> int:
        """Publish ONE catalog version flipping every staged pin.

        Retries through rival catalog commits that touched only OTHER
        tables (pin rebase — pure metadata); raises
        ConcurrentCommitError if a rival advanced any table this txn
        touched, because our writes were computed from stale reads.
        """
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        if not self._new_pins and not self._new_views:
            self._done = True
            return self.snap.version
        base = self.snap
        for _ in range(_MAX_TXN_ATTEMPTS):
            pins = dict(base._pins)
            pins.update(self._new_pins)
            views = dict(base._views)
            for vn, spec in self._new_views.items():
                if spec is None:
                    views.pop(vn, None)
                else:
                    views[vn] = spec
            doc = {"pins": pins}
            if views:
                doc["views"] = views
            if self.catalog._write_cat_exclusive(
                base.version + 1, doc
            ):
                self._done = True
                return base.version + 1
            # lost the race: diff rival's pins against OUR snapshot
            rival = self.catalog.snapshot()
            for name in self._new_pins:
                ours = self.snap._pins.get(name, {}).get("version")
                theirs = rival._pins.get(name, {}).get("version")
                if name in rival._pins and theirs != ours:
                    self._done = True
                    raise ConcurrentCommitError(
                        f"catalog: rival transaction advanced table "
                        f"'{name}' (v{ours} -> v{theirs}); re-read and "
                        "retry the transaction"
                    )
            for vn in self._new_views:
                if rival._views.get(vn) != self.snap._views.get(vn):
                    self._done = True
                    raise ConcurrentCommitError(
                        f"catalog: rival transaction changed view "
                        f"'{vn}'; re-read and retry"
                    )
            base = rival  # disjoint tables: rebase pins and re-CAS
        raise ConcurrentCommitError("catalog: too many commit attempts")

    def abort(self) -> None:
        """Drop staged pins. Staged table versions stay as inert,
        catalog-invisible metadata (vacuum reaps their files once the
        table's own retention passes)."""
        self._new_pins.clear()
        self._new_views.clear()
        self._done = True
