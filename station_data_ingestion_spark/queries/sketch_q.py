"""Mergeable frequency sketches under the oracle gate.

Approximate sketches can't be hash-compared against an exact engine
directly, but their GUARANTEES can: space-saving with k counters
captures every item whose true frequency exceeds N/k, and a count-min
estimate never falls below the true count. So each gate query runs the
sketch as a CANDIDATE GENERATOR and then verifies candidates with exact
counts -- by the superset guarantee the verified output equals the plain
exact heavy-hitters SQL, making the sketch path hash-checkable without
weakening it to rows-only.

This is also the honest 100 TB shape: the sketch pass is one narrow
Arrow scan whose driver state is k counters per partition (space-saving)
or one d*w matrix (count-min) -- never a groupBy over the full key
space; the exact verification pass touches only the <= k candidate keys
(an IN-list semi-filter pushed into the scan).

Keys here are derived price buckets (o_totalprice DIV 80000 -- integer
arithmetic, identical in both engines; TPC-H columns are deliberately
uniform so raw keys have no heavy hitters to find, and the width is
picked so several buckets clear the N/8 bar at every test SF).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    space_saving_topk,
)
from station_data_ingestion_spark.queries.registry import load, query

_K = 8  # heavy-hitter threshold: count * _K > N  (i.e. freq > N/k)

_BUCKET_SQL = "CAST(FLOOR(o_totalprice) AS BIGINT) // 80000"
_BUCKET_SPARK = "cast(floor(o_totalprice) as bigint) div 80000"

_SS_ORACLE = f"""
SELECT bucket, cnt FROM (
  SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS cnt
  FROM orders GROUP BY 1
) WHERE cnt * {_K} > (SELECT COUNT(*) FROM orders)
"""


@query(
    "sketch_spacesaving_heavy_hitters",
    oracle=_SS_ORACLE,
    doc="Space-saving candidates -> exact-count verify; superset "
    "guarantee makes the output equal exact heavy-hitters SQL.",
)
def sketch_spacesaving_heavy_hitters(spark, sf_dir: str):
    orders = load(spark, sf_dir, "orders")["orders"]
    df = orders.select(F.expr(_BUCKET_SPARK).alias("bucket"))
    # one narrow scan: k-slot summaries + exact N ride the same pass
    cands, n = space_saving_topk(df, "bucket", k=_K, with_total=True)
    vals = [int(item) for item, _c, _o in cands]
    return (
        df.where(F.col("bucket").isin(vals))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * _K > F.lit(n))
    )


_CMS_ORACLE = f"""
SELECT event_type, cnt FROM (
  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1
) WHERE cnt * {_K} > (SELECT COUNT(*) FROM events)
"""


@query(
    "sketch_cms_verified_heavy_events",
    oracle=_CMS_ORACLE,
    doc="Count-min prefilter (estimate >= true, so never drops a real "
    "heavy hitter) -> exact-count verify over surviving candidates.",
)
def sketch_cms_verified_heavy_events(spark, sf_dir: str):
    ev = load(spark, sf_dir, "events")["events"].select("event_type")
    # candidate domain: the enum of event types (bounded; in production
    # this list comes from a catalog enum or the space-saving sketch)
    types = sorted(r[0] for r in ev.distinct().collect())
    matrix = cms_build(ev, "event_type")
    n = int(matrix[0].sum())  # row 0 of the CM matrix sums every row once
    ests = cms_estimate(matrix, types)
    cand = [t for t, e in zip(types, ests) if e * _K > n]
    return (
        ev.where(F.col("event_type").isin(cand))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * _K > F.lit(n))
    )


_KLL_PHIS = [0.25, 0.5, 0.75, 0.95]

# one SELECT per phi: DuckDB's QUANTILE only takes constant parameters
_KLL_ORACLE = "\nUNION ALL\n".join(
    f"SELECT CAST({phi} AS DOUBLE) AS phi, "
    f"quantile_disc(o_totalprice, {phi}) AS value FROM orders"
    for phi in (0.25, 0.5, 0.75, 0.95)
)


@query(
    "sketch_kll_quantiles",
    oracle=_KLL_ORACLE,
    doc="KLL sketch brackets each target rank; exact band-count verify "
    "+ histogram refinement produce the EXACT quantile_disc values.",
)
def sketch_kll_quantiles(spark, sf_dir: str):
    """Mergeable KLL quantile sketch -> exact quantiles
    (operators/kll.py): one Arrow pass builds per-partition compactor
    stacks, the driver merges them, and each target rank is bracketed
    by a sketch band that an exact counting pass verifies and narrows
    (full-range fallback if the sketch ever missed — correctness never
    depends on the sketch). Output = DuckDB quantile_disc exactly:
    the value at 1-indexed rank ceil(phi*n)."""
    from station_data_ingestion_spark.operators.kll import kll_exact_quantiles

    orders = load(spark, sf_dir, "orders")["orders"]
    rows = kll_exact_quantiles(
        orders, "o_totalprice", _KLL_PHIS, k=200, delta=0.05
    )
    return spark.createDataFrame(rows, "phi double, value double")


_KMV_K = 4096

_KMV_ORACLE = """
SELECT event_type AS key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events GROUP BY 1
UNION ALL
SELECT 'click|purchase' AS key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events WHERE event_type IN ('click', 'purchase')
"""


@query(
    "sketch_kmv_distinct_union",
    oracle=_KMV_ORACLE,
    doc="KMV bottom-k distinct sketches per event_type, plus the "
    "sketch-UNION answer for click|purchase — exact while NDV < k, "
    "so the oracle is plain COUNT(DISTINCT).",
)
def sketch_kmv_distinct_union(spark, sf_dir: str):
    """Mergeable KMV distinct-count sketches (operators/kmv.py): one
    narrow Arrow pass emits per-partition bottom-k hash sets per
    event_type (rows = partitions x groups, never keys), one
    sketch-sized shuffle folds them, and the driver — holding only
    5 groups x 32 KB — answers the cross-group DISTINCT-of-UNION
    question (users who clicked OR purchased) by merging two sketches
    instead of re-scanning events. Exactness: per-type NDV at every
    test SF sits far under k=4096, so the unsaturated sketch IS the
    exact distinct set and the gate compares bit-for-bit against
    COUNT(DISTINCT); at saturation the estimator degrades to
    +-1/sqrt(k) relative error (documented, not exercised here)."""
    import numpy as np

    from station_data_ingestion_spark.operators.kmv import (
        kmv_estimate,
        kmv_sketches,
        merge_hashes,
    )

    ev = load(spark, sf_dir, "events")["events"]
    sketches = {
        r["grp"]: np.frombuffer(r["hashes"], dtype=np.uint64)
        for r in kmv_sketches(ev, "user_id", "event_type", _KMV_K).collect()
    }
    out = [
        (g, kmv_estimate(arr, _KMV_K)) for g, arr in sorted(sketches.items())
    ]
    union = merge_hashes(
        [sketches["click"], sketches["purchase"]], _KMV_K
    )
    out.append(("click|purchase", kmv_estimate(union, _KMV_K)))
    return spark.createDataFrame(out, "key string, distinct_users long")
