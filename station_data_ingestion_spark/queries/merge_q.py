"""MERGE/upsert exercised through the oracle gate.

Runs the engine's real merge operator (operators.merge.merge_plan) on a
deterministic scenario built from `orders`:

- target  = snapshot of orders with even keys
- updates = orders with keys divisible by 3, totalprice doubled

so keys divisible by 6 are matched-and-changed ('replace'), odd multiples
of 3 are new ('create'), the rest keep. The oracle states the same
semantics as one FULL OUTER JOIN -- proving the distributed merge program
equals the reference's per-document probe loop
[reference: src/modules/ingestion_handler.py:182-254].
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.merge import merge_plan
from station_data_ingestion_spark.queries.registry import load, query

_COLS = "o_custkey, o_orderstatus, o_totalprice, o_orderpriority"

_MERGE_ORACLE = f"""
WITH target AS (
  SELECT o_orderkey, {_COLS} FROM orders WHERE o_orderkey % 2 = 0
), updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(t.o_orderkey, u.o_orderkey) AS o_orderkey,
       COALESCE(u.o_custkey, t.o_custkey) AS o_custkey,
       COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
       CASE WHEN t.o_orderkey IS NULL OR u.o_orderkey IS NOT NULL
            THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
       COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority,
       CASE WHEN t.o_orderkey IS NULL THEN 'create'
            WHEN u.o_orderkey IS NULL THEN 'keep'
            WHEN u.o_totalprice IS DISTINCT FROM t.o_totalprice THEN 'replace'
            ELSE 'keep' END AS action
FROM target t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
"""


@query("merge_upsert_orders", _MERGE_ORACLE)
def merge_upsert_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    updates = o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = merge_plan(target, updates, ["o_orderkey"], replace=True)
    return merged.withColumnRenamed("_action", "action")


@query(
    "merge_scd2_customer_history",
    """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
)
SELECT c_custkey, c_mktsegment, cents,
       1 AS valid_from, CAST(NULL AS INT) AS valid_to, 1 AS is_current
FROM c WHERE c_custkey % 6 <> 0
UNION ALL
SELECT c_custkey, c_mktsegment, cents, 1, 2, 0
FROM c WHERE c_custkey % 6 = 0
UNION ALL
SELECT c_custkey, 'PROMO', cents, 2, CAST(NULL AS INT), 1
FROM c WHERE c_custkey % 6 = 0
UNION ALL
SELECT c_custkey + 10000000, 'NEW', cents, 2, CAST(NULL AS INT), 1
FROM c WHERE c_custkey % 1000 = 0
""",
)
def merge_scd2_customer_history(spark, sf_dir):
    """SCD type-2 merge (operators/scd2.py): history-preserving upsert.

    Deterministic scenario: customers with key % 6 == 0 change segment
    to PROMO (old row closed at v2 + new open row), key % 3 == 0 but
    % 6 != 0 arrive as genuine no-op updates (tracked values equal ->
    passthrough), key % 1000 == 0 also arrive key-shifted as brand-new
    NEW-segment members. The oracle enumerates the expected table
    directly — the operator must reproduce it from the generic
    full-outer-join program.
    """
    from station_data_ingestion_spark.operators.scd2 import scd2_apply, scd2_init

    c = load(spark, sf_dir, "customer")["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    dim = scd2_init(c, key=["c_custkey"], tracked=["c_mktsegment", "cents"])
    upd_existing = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 6 == 0, "PROMO")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "cents",
    )
    upd_new = c.filter(F.col("c_custkey") % 1000 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.lit("NEW").alias("c_mktsegment"),
        "cents",
    )
    out = scd2_apply(
        dim,
        upd_existing.unionByName(upd_new),
        key=["c_custkey"],
        tracked=["c_mktsegment", "cents"],
        effective_version=2,
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        "cents",
        "valid_from",
        "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
    )


@query(
    "merge_with_deletes_orders",
    """
WITH target AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 2 = 0
),
expected AS (
  -- deletes: even keys divisible by 10 vanish — UNLESS an upsert for the
  -- same key follows (delete-first composition => re-created)
  -- upserts: keys divisible by 6 get cents+1; odd multiples of 3 created
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 6 = 0
              THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1
              ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders
  WHERE (o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0 AND o_orderkey % 6 <> 0)
     OR (o_orderkey % 6 = 0)
     OR (o_orderkey % 2 = 1 AND o_orderkey % 3 = 0)
)
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM expected GROUP BY o_orderstatus
""",
)
def merge_with_deletes_orders(spark, sf_dir):
    """Three-branch MERGE (upsert/delete) under the gate: target = even
    orders; ops = DELETE every key divisible by 10, UPSERT cents+1 for
    keys divisible by 6 and all odd multiples of 3 (creates). Keys
    divisible by both 10 and 6 exercise the delete-then-upsert
    composition rule (re-created with the new value). The oracle
    enumerates the expected post-merge table directly."""
    from station_data_ingestion_spark.operators.merge import merge_apply_ops

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    upserts = o.filter(
        ((F.col("o_orderkey") % 6 == 0))
        | ((F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 3 == 0))
    ).withColumn(
        "cents",
        F.when(F.col("o_orderkey") % 6 == 0, F.col("cents") + 1).otherwise(
            F.col("cents")
        ),
    ).withColumn("_op", F.lit("upsert"))
    deletes = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_orderstatus", "cents"
    ).withColumn("_op", F.lit("delete"))
    merged = merge_apply_ops(
        target, upserts.unionByName(deletes), ["o_orderkey"]
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents"),
    )


@query(
    "merge_schema_evolution_orders",
    """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS prio
  FROM orders
),
t AS (SELECT k, cents FROM base WHERE k % 2 = 0),
u AS (SELECT k, cents * 2 AS cents, prio FROM base WHERE k % 3 = 0),
m AS (
  SELECT COALESCE(t.k, u.k) AS k,
         CASE WHEN t.k IS NULL THEN 'create'
              WHEN u.k IS NULL THEN 'keep'
              ELSE 'replace' END AS action,
         CASE WHEN u.k IS NOT NULL THEN u.cents ELSE t.cents END AS cents,
         CASE WHEN u.k IS NOT NULL THEN u.prio ELSE NULL END AS prio
  FROM t FULL OUTER JOIN u ON t.k = u.k
)
SELECT action, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS cents,
       COUNT(prio) AS n_with_priority
FROM m GROUP BY action
""",
)
def merge_schema_evolution_orders(spark, sf_dir):
    """MERGE with automatic schema evolution (Delta's
    mergeSchema-for-MERGE): updates carry a column the target never had
    (o_orderpriority); evolve_schema=True null-fills it on the target
    side, so kept rows read NULL, replaced/created rows carry the
    update's value — asserted by the per-action n_with_priority counts
    against the oracle's full-outer-join simulation."""
    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    target = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        (cents * 2).alias("cents"),
        F.col("o_orderpriority").alias("prio"),
    )
    merged = merge_plan(
        target, updates, ["k"], replace=True, evolve_schema=True
    )
    return merged.groupBy(F.col("_action").alias("action")).agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents"),
        F.count("prio").alias("n_with_priority"),
    )


@query(
    "merge_scd2_point_in_time_join",
    """
WITH c AS (
  SELECT c_custkey, c_mktsegment FROM customer
),
dim AS (
  SELECT c_custkey, c_mktsegment, 1 AS valid_from,
         CASE WHEN c_custkey % 6 = 0 THEN 2 ELSE NULL END AS valid_to
  FROM c
  UNION ALL
  SELECT c_custkey, 'PROMO', 2, NULL FROM c WHERE c_custkey % 6 = 0
),
facts AS (
  SELECT o_orderkey, o_custkey, (o_orderkey % 2) + 1 AS wave,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
joined AS (
  SELECT f.wave, d.c_mktsegment AS segment, f.cents
  FROM facts f JOIN dim d
    ON f.o_custkey = d.c_custkey
   AND d.valid_from <= f.wave
   AND (d.valid_to IS NULL OR f.wave < d.valid_to)
)
SELECT wave, segment, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM joined GROUP BY wave, segment
""",
)
def merge_scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (AS OF) lookup against an SCD2 dimension — the
    warehouse pattern SCD2 history exists FOR: each fact joins the
    dimension row whose validity interval covers the fact's version
    (valid_from <= t < valid_to, open-ended current rows). Facts at
    wave 1 must see pre-change segments, wave 2 the PROMO rows — a
    history mix-up (joining is_current only, or closed rows leaking)
    shifts the per-wave aggregates and fails the oracle. Dimension
    side broadcasts (dimension << facts); at larger dimensions the
    same predicate runs through range_join_bucketed on the version
    axis."""
    c = load(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_mktsegment"
    )
    changed = F.col("c_custkey") % 6 == 0
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(1).alias("valid_from"),
        F.when(changed, F.lit(2)).cast("int").alias("valid_to"),
    ).unionByName(
        c.where(changed).select(
            "c_custkey",
            F.lit("PROMO").alias("c_mktsegment"),
            F.lit(2).alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
        )
    )
    facts = load(spark, sf_dir, "orders")["orders"].select(
        "o_custkey",
        ((F.col("o_orderkey") % 2) + 1).alias("wave"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    joined = facts.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("wave"))
        & (F.col("valid_to").isNull() | (F.col("wave") < F.col("valid_to"))),
        "inner",
    )
    return joined.groupBy(
        "wave", F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("cents"),
    )


@query(
    "merge_cdf_orders",
    """
WITH t AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 2 = 0
), u AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 2 * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT 'insert' AS change_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(u.cents) AS BIGINT) AS cents
FROM u LEFT JOIN t ON t.o_orderkey = u.o_orderkey
WHERE t.o_orderkey IS NULL
UNION ALL
SELECT 'update_preimage', CAST(COUNT(*) AS BIGINT), CAST(SUM(t.cents) AS BIGINT)
FROM u JOIN t ON t.o_orderkey = u.o_orderkey WHERE u.cents <> t.cents
UNION ALL
SELECT 'update_postimage', CAST(COUNT(*) AS BIGINT), CAST(SUM(u.cents) AS BIGINT)
FROM u JOIN t ON t.o_orderkey = u.o_orderkey WHERE u.cents <> t.cents
""",
)
def merge_cdf_orders(spark, sf_dir):
    """MERGE with a recorded CHANGE DATA FEED: the upsert commits into
    the snapshot store with the row-level deltas (insert /
    update_preimage / update_postimage) captured from the merge's own
    full-outer join (operators/merge.py:merge_changes) — Delta's
    MERGE-with-CDF. A partition overwrite has no structurally derivable
    diff, so the recorded feed is what makes downstream incremental
    consumers possible. Apply-equivalence is asserted in-query: feed
    replayed onto the pre-merge snapshot == post-merge snapshot."""
    from station_data_ingestion_spark.operators.merge import merge_changes
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable
    from station_data_ingestion_spark.queries.snapshot_q import _tmpdir

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    updates = o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "cents", F.col("cents") * 2
    )
    t = SnapshotTable(
        spark,
        _tmpdir(prefix="merge_cdf_") + "/orders_m",
        partition_cols=(),
        stat_cols=("o_orderkey",),
    )
    t.commit_overwrite_partitions(target)
    v1 = t.latest_version()
    stored = t.read().select("o_orderkey", "cents")
    merged = merge_plan(stored, updates, ["o_orderkey"], replace=True).drop(
        "_action"
    )
    changes = merge_changes(stored, updates, ["o_orderkey"], replace=True)
    t.commit_overwrite_partitions(
        merged, expected_version=v1, changes=changes
    )
    v2 = t.latest_version()

    feed = t.read_change_feed(v1, to_version=v2)
    cols = ("o_orderkey", "cents")
    base = t.read(version=v1).select(*cols)
    plus = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select(*cols)
    minus = feed.filter(F.col("_change_type") == "update_preimage").select(*cols)
    applied = base.unionByName(plus).exceptAll(minus)
    final = t.read(version=v2).select(*cols)
    drift = applied.exceptAll(final).count() + final.exceptAll(applied).count()
    if drift:
        raise RuntimeError(f"merge change feed drifts by {drift} rows")
    return feed.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


_CDC_LATEST_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ops AS (
  SELECT k, 1 AS seq, 'upsert' AS op, cents + 111 AS cents
  FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT k, 2, 'delete', NULL FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT k, 1, 'delete', NULL
  FROM base WHERE k % 11 = 3 AND k % 7 <> 0
  UNION ALL
  SELECT k, 2, 'upsert', cents + 555
  FROM base WHERE k % 11 = 3 AND k % 7 <> 0
  UNION ALL
  SELECT k + 1000000000, 1, 'upsert', cents + 9
  FROM base WHERE k % 13 = 5
),
latest AS (
  SELECT k, op, cents FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM ops
  ) WHERE rn = 1
),
merged AS (
  SELECT b.k, b.cents FROM base b LEFT JOIN latest l ON b.k = l.k
  WHERE l.k IS NULL
  UNION ALL
  SELECT k, cents FROM latest WHERE op = 'upsert'
)
SELECT CAST(k % 4 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM merged GROUP BY 1
"""


@query("merge_cdc_latest_wins", _CDC_LATEST_ORACLE)
def merge_cdc_latest_wins(spark, sf_dir):
    """OUT-OF-ORDER CDC APPLY (the Debezium-batch shape): a change
    batch carries SEVERAL versions of the same key (upsert then delete,
    delete then upsert, brand-new keys) with a sequence number. The
    apply collapses each key to its LATEST version first — one
    row_number window over the (small) batch, never the target — then
    runs the engine's three-branch merge (operators/merge.py:
    merge_apply_ops: anti-join deletes + changed-only upserts). At
    100 TB the target is touched exactly once, by the merge's single
    key-join; ordering work is confined to the batch. Oracle: the same
    latest-wins collapse + merge semantics in plain SQL."""
    from station_data_ingestion_spark.operators.merge import (
        merge_apply_ops,
    )

    base = load(spark, sf_dir, "orders")["orders"].select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    mk = lambda df, seq, op, cents: df.select(  # noqa: E731
        "k",
        F.lit(seq).alias("seq"),
        F.lit(op).alias("_op"),
        cents.alias("cents") if cents is not None else F.lit(None).cast("long").alias("cents"),
    )
    b7 = base.filter(F.col("k") % 7 == 0)
    b11 = base.filter((F.col("k") % 11 == 3) & (F.col("k") % 7 != 0))
    b13 = base.filter(F.col("k") % 13 == 5).select(
        (F.col("k") + 1000000000).alias("k"), "cents"
    )
    ops = (
        mk(b7, 1, "upsert", F.col("cents") + 111)
        .unionByName(mk(b7, 2, "delete", None))
        .unionByName(mk(b11, 1, "delete", None))
        .unionByName(mk(b11, 2, "upsert", F.col("cents") + 555))
        .unionByName(mk(b13, 1, "upsert", F.col("cents") + 9))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        ops.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "_op", "cents")
    )
    merged = merge_apply_ops(base, latest, ["k"])
    return merged.groupBy(
        (F.col("k") % 4).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


@query(
    "merge_dv_merge_on_read",
    """
WITH target AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderkey % 4 AS VARCHAR) AS bucket
  FROM orders WHERE o_orderkey % 2 = 0
), updates AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) * 2 AS cents,
         CAST(o_orderkey % 4 AS VARCHAR) AS bucket
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(t.o_orderkey, u.o_orderkey) AS o_orderkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.cents
            ELSE t.cents END AS cents,
       COALESCE(t.bucket, u.bucket) AS bucket
FROM target t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
""",
)
def merge_dv_merge_on_read(spark, sf_dir):
    """MERGE-ON-READ MERGE (Iceberg MOR / Delta DV-update applied to
    the reference's core upsert): matched-and-changed rows are
    deletion-vectored out of their files and the update images land as
    appended files — ONE atomic commit, write volume O(affected rows),
    ZERO data files rewritten. The in-query asserts make the
    merge-on-read claim falsifiable: every pre-merge file must survive
    with its identity intact (a rewrite fails the gate), the commit
    must carry a DV, and the stats must show both creates and
    replaces. Same oracle semantics as merge_upsert_orders — two
    physical merge strategies (COW partition overwrite vs MOR
    DV+append), one certified answer."""
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable
    from station_data_ingestion_spark.queries.snapshot_q import _tmpdir

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 4).cast("string").alias("bucket"),
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    updates = o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "cents", F.col("cents") * 2
    )
    t = SnapshotTable(
        spark,
        _tmpdir(prefix="merge_mor_") + "/orders_mor",
        partition_cols=("bucket",),
        stat_cols=("o_orderkey",),
    )
    t.commit_overwrite_partitions(target)
    v1 = t.latest_version()
    files_before = {
        e["path"] for e in t._read_manifest(v1)["files"]
    }
    res = t.merge_dv(updates, ["o_orderkey"])
    m2 = t._read_manifest(res["version"])
    files_after = {e["path"] for e in m2["files"]}
    if not files_before <= files_after:
        raise RuntimeError(
            "merge-on-read rewrote data files: "
            f"{sorted(files_before - files_after)[:3]}"
        )
    if not m2.get("deletes"):
        raise RuntimeError("merge-on-read commit carries no deletion vector")
    if res["created"] == 0 or res["replaced"] == 0:
        raise RuntimeError(f"scenario must create AND replace: {res}")
    if res["version"] != v1 + 1:
        raise RuntimeError("merge-on-read must be ONE atomic commit")
    return t.read().select("o_orderkey", "cents", "bucket")


@query(
    "merge_not_matched_by_source_delete",
    """
WITH t AS (
  SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT)
           AS cents, o_orderdate AS d
  FROM orders
),
s AS (
  SELECT k, cents + 11 AS cents FROM t WHERE k % 7 IN (1, 2, 3)
  UNION ALL
  SELECT k + 10000000 AS k, cents FROM t WHERE k % 97 = 0
),
m AS (
  SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.cents, t.cents) AS cents,
         t.d, s.k IS NOT NULL AS in_src, t.k IS NOT NULL AS in_tgt
  FROM t FULL OUTER JOIN s ON t.k = s.k
)
SELECT k % 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM m
WHERE in_src OR (in_tgt AND NOT (d < DATE '1997-01-01'))
GROUP BY 1
""",
    doc="MERGE ... WHEN NOT MATCHED BY SOURCE AND <cond> THEN DELETE: "
    "stale unmatched target rows retired, recent ones kept, plus the "
    "standard update/insert branches.",
)
def merge_not_matched_by_source_delete(spark, sf_dir):
    """The Delta 2.3 MERGE branch the replace-only reference cannot
    express: the source carries updates (keys % 7 in 1-3, price + 11
    cents) and inserts (shifted keys), and every target row the source
    NO LONGER CARRIES is deleted iff it is stale (ordered before
    1997) — conditional not-matched-by-source delete, the
    sync-a-dimension shape. Unconditional delete would degenerate to
    'replace table with source'; the condition keeps recent unmatched
    rows alive, which is what the oracle checks row-for-row. Three
    shuffles on the one merge key (operators/merge.py:
    merge_not_matched_by_source)."""
    from station_data_ingestion_spark.operators.merge import (
        merge_not_matched_by_source,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    t = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").alias("d"),
    )
    s = (
        t.filter(F.col("k") % 7 <= 3)
        .filter(F.col("k") % 7 >= 1)
        .select("k", (F.col("cents") + 11).alias("cents"), "d")
        .unionByName(
            t.filter(F.col("k") % 97 == 0).select(
                (F.col("k") + 10000000).alias("k"), "cents", "d"
            )
        )
    )
    merged = merge_not_matched_by_source(
        t, s, ["k"], delete_condition=F.col("d") < F.lit("1997-01-01")
    )
    return merged.groupBy((F.col("k") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    )


@query(
    "merge_multi_clause_orders",
    """
WITH t AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 3 <> 0
), s AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + 37 AS src_cents,
         CASE WHEN o_custkey % 5 = 0 THEN 'retire' ELSE 'price' END AS src_kind
  FROM orders WHERE o_orderkey % 2 = 0
), merged AS (
  SELECT t.o_orderkey,
         CASE
           WHEN s.o_orderkey IS NOT NULL AND s.src_kind = 'price'
                AND s.src_cents > t.cents
             THEN 'REPRICED' ELSE t.status END AS status,
         CASE
           WHEN s.o_orderkey IS NOT NULL AND s.src_kind = 'price'
                AND s.src_cents > t.cents
             THEN s.src_cents ELSE t.cents END AS cents,
         CASE WHEN s.o_orderkey IS NOT NULL AND NOT (
                s.src_kind = 'price' AND s.src_cents > t.cents)
                AND s.src_kind = 'retire'
             THEN 1 ELSE 0 END AS deleted
  FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
), survivors AS (
  SELECT o_orderkey, status, cents FROM merged WHERE deleted = 0
), inserts AS (
  SELECT s.o_orderkey, 'NEW' AS status, s.src_cents AS cents
  FROM s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
  WHERE t.o_orderkey IS NULL
), final AS (
  SELECT * FROM survivors UNION ALL SELECT * FROM inserts
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM final GROUP BY status
""",
)
def merge_multi_clause_orders(spark, sf_dir):
    """MERGE with ORDERED multi-clause WHEN MATCHED (Delta semantics,
    first clause wins): clause 1 reprices rows whose source price beats
    the target (UPDATE two columns), clause 2 retires 'retire'-kind
    source matches that clause 1 did NOT claim (DELETE), matched rows
    claiming neither clause pass through, and unmatched source rows
    insert. The whole dispatch is ONE left join + one CASE projection +
    one anti-join — no per-clause scans. Clause ORDER is load-bearing
    (a 'retire' row with a better price reprices, not deletes) and the
    oracle replays exactly that precedence. [reference: multi-match
    RecordKeyError semantics src/modules/ingestion_handler.py:193-195,
    generalized to Delta's WHEN MATCHED AND chains]"""
    from station_data_ingestion_spark.operators.merge import (
        merge_when_clauses,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    target = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("long") + 37).alias(
            "cents"
        ),
        F.when(F.col("o_custkey") % 5 == 0, F.lit("retire"))
        .otherwise(F.lit("price"))
        .alias("kind"),
        F.lit("NEW").alias("status"),
    )
    merged = merge_when_clauses(
        target,
        source.select("o_orderkey", "cents", "kind", "status"),
        ["o_orderkey"],
        clauses=[
            (
                (F.col("src_kind") == "price")
                & (F.col("src_cents") > F.col("cents")),
                {
                    "status": F.lit("REPRICED"),
                    "cents": F.col("src_cents"),
                },
            ),
            (F.col("src_kind") == "retire", "delete"),
        ],
    )
    return merged.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
