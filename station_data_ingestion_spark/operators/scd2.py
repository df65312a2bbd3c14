"""Slowly-changing-dimension type 2 merge: history-preserving upserts.

The reference's merge replaces changed documents in place
[reference: src/modules/ingestion_handler.py:196-199 — replace iff value
differs]; SCD2 is the lakehouse-standard alternative that KEEPS the old
row, closing its validity interval and appending the new version. One
distributed pass:

  full-outer join dim(current rows) with updates on the key ->
    unchanged / changed / new classification by null-safe struct
    equality (the same change predicate as operators/merge.py) ->
    changed rows emit TWO rows (closed old + open new), new keys one.

Scale: a single shuffle on the business key; history rows (is_current =
false) never join — only the current slice does, so the join input is
bounded by |dimension|, not |history|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_DUP_UPDATE_MSG = (
    "scd2_apply: conflicting duplicate update keys (same key, different "
    "tracked values) — each would open its own is_current row and corrupt "
    "the dimension for every later wave"
)


def _dedup_updates(u: DataFrame, key: list[str], tracked: list[str]) -> DataFrame:
    """Collapse EXACT duplicate update rows; raise on CONFLICTING ones.

    Same guard semantic (and same hash-window implementation notes) as
    operators/merge.py: duplicate update keys fanning through the
    full-outer join would emit multiple closed rows and multiple
    is_current=true rows per key — silent corruption. xxhash64 skips
    null inputs, so each column hashes together with its isNull flag.
    """
    h = F.xxhash64(*[e for c in tracked for e in (F.col(c), F.col(c).isNull())])
    w = Window.partitionBy(*key).orderBy("_h")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        u.withColumn("_h", h)
        .withColumn(
            "_conflict", F.min("_h").over(frame) != F.max("_h").over(frame)
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            F.when(
                F.col("_conflict"),
                F.raise_error(F.lit(_DUP_UPDATE_MSG)).cast("boolean"),
            ).otherwise(F.col("_rn") == 1)
        )
        .drop("_h", "_conflict", "_rn")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: list[str],
    tracked: list[str],
    effective_version: int,
) -> DataFrame:
    """Apply `updates` to an SCD2 dimension table.

    ``dim`` must carry `valid_from int, valid_to int|null, is_current
    boolean` alongside the key and tracked columns (an empty/initial dim
    may be built with :func:`scd2_init`). Returns the new full table:

    - current rows whose tracked values differ from their update: closed
      (valid_to = effective_version, is_current = false) PLUS a new open
      row carrying the update's values
    - update keys absent from dim: new open rows
    - unchanged / un-updated rows: passed through untouched
    """
    hist = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current"))
    updates = _dedup_updates(updates.select(*key, *tracked), key, tracked)
    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in key],
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
    )
    cond = [F.col(k) == F.col(f"__u_{k}") for k in key]
    j = cur.join(u, cond, "full_outer")

    old_struct = F.struct(*[F.col(c) for c in tracked])
    new_struct = F.struct(*[F.col(f"__u_{c}").alias(c) for c in tracked])
    matched = F.col(key[0]).isNotNull() & F.col(f"__u_{key[0]}").isNotNull()
    changed = matched & ~old_struct.eqNullSafe(new_struct)
    added = F.col(key[0]).isNull()

    passthrough = j.filter(~changed & ~added).select(*dim.columns)
    closed = j.filter(changed).select(
        *[F.col(c) for c in key + tracked],
        F.col("valid_from"),
        F.lit(effective_version).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(changed | added).select(
        *[F.coalesce(F.col(k), F.col(f"__u_{k}")).alias(k) for k in key],
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.lit(effective_version).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    cols = key + tracked + ["valid_from", "valid_to", "is_current"]
    return (
        hist.select(*cols)
        .unionByName(passthrough.select(*cols))
        .unionByName(closed)
        .unionByName(opened)
    )


def scd2_init(snapshot: DataFrame, key: list[str], tracked: list[str]) -> DataFrame:
    """Version-1 SCD2 table from an initial snapshot (all rows open)."""
    return snapshot.select(
        *key,
        *tracked,
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
