"""Recursive / hierarchical queries: pointer-doubling AND the native
``WITH RECURSIVE`` operator Spark gained in 4.x.

Two execution strategies live here side by side, both oracle-gated
against DuckDB's recursive CTE so they certify each other:

1. POINTER-DOUBLING (``hierarchy_depth_pointer_doubling``) — each round,
   every node's ancestor
pointer jumps twice as far up the tree (ptr <- ptr(ptr), dist <- dist +
dist(ptr)), so a hierarchy of depth D resolves in ceil(log2(D)) rounds
-- NOT D rounds like naive parent-chasing. At 100 TB each round is one
shuffle join on node id over a table with exactly one row per node (the
frontier never grows, unlike a transitive-closure expansion), and
per-round lineage is truncated with localCheckpoint exactly like
operators/graph.py connected components. A 12-level hierarchy over 10^10
keys is 4 rounds.

2. NATIVE ``WITH RECURSIVE`` (``sql_recursive_*``) — Spark 4.x executes
   the recursion itself (UnionLoop), one anchor scan plus D iterative
   steps where each step's frontier is only the still-walking rows (the
   frontier SHRINKS as chains hit the root, unlike a transitive-closure
   expansion). D = log_FANOUT(keyspace), so even a 10^11-key hierarchy
   is ~12 steps; pointer doubling remains the scale path when per-step
   latency dominates (4 shuffle rounds vs 12), but the native operator
   keeps accumulator state (path sums, BOM quantity products) that
   pointer-doubling composition cannot carry without widening the
   per-node state vector.

The hierarchy is synthesized from customer keys (parent(node) = node DIV
7, node = c_custkey + 1 so ids start at 1 and 0 is the virtual root) --
deterministic, so the DuckDB oracle can re-derive it and walk it with a
real WITH RECURSIVE, giving the iterative Spark plan an exact
second-engine check. Convergence is asserted IN-PLAN (raise_error on any
unresolved pointer) rather than with a driver-side count action.

[reference: the reference engine has no recursive operator; this extends
the engine surface the way GraphFrames/Delta users expect hierarchy
rollups to work on Spark]
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query

_FANOUT = 7
# 5 rounds resolve depth <= 2^5 - 1 = 31, i.e. key spaces up to 7^31 --
# any realistic id range. The in-plan guard raises if that's ever wrong.
_ROUNDS = 5

_HIERARCHY_ORACLE = f"""
WITH RECURSIVE walk AS (
  SELECT c_custkey + 1 AS node, (c_custkey + 1) // {_FANOUT} AS anc,
         0 AS depth
  FROM customer
  UNION ALL
  SELECT node, anc // {_FANOUT}, depth + 1 FROM walk WHERE anc >= 1
),
final AS (SELECT node, depth FROM walk WHERE anc = 0)
SELECT depth, COUNT(*) AS n_nodes, MIN(node) AS min_key,
       MAX(node) AS max_key, CAST(SUM(node) AS BIGINT) AS sum_keys
FROM final GROUP BY depth
"""


@query(
    "hierarchy_depth_pointer_doubling",
    oracle=_HIERARCHY_ORACLE,
    doc="Ancestor-path depth via O(log D) pointer-doubling self-joins; "
    "DuckDB WITH RECURSIVE oracle walks the same synthesized hierarchy.",
)
def hierarchy_depth_pointer_doubling(spark, sf_dir: str):
    cust = load(spark, sf_dir, "customer")["customer"]
    state = cust.select(
        (F.col("c_custkey") + 1).alias("node"),
        F.expr(f"(c_custkey + 1) div {_FANOUT}").alias("ptr"),
        F.lit(1).cast("long").alias("dist"),
    ).unionAll(
        # virtual root 0: self-loop at distance 0 terminates every chain
        spark.range(1).select(
            F.lit(0).cast("long").alias("node"),
            F.lit(0).cast("long").alias("ptr"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    for _ in range(_ROUNDS):
        # ptr <- ptr(ptr); dist accumulates REAL edges only (the root
        # self-loop contributes 0), so dist converges to depth + 1
        hop = state.select(
            F.col("node").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("dist").alias("d2"),
        )
        state = (
            state.join(hop, "ptr")
            .select(
                "node",
                F.col("ptr2").alias("ptr"),
                (F.col("dist") + F.col("d2")).alias("dist"),
            )
            .localCheckpoint()  # truncate lineage: plan depth stays O(1)
        )
    depth = state.where(F.col("node") > 0).select(
        "node",
        F.when(
            F.col("ptr") != 0,
            F.raise_error(
                F.lit(
                    f"pointer doubling did not converge in {_ROUNDS} rounds"
                )
            ).cast("long"),
        )
        .otherwise(F.col("dist") - 1)
        .alias("depth"),
    )
    return depth.groupBy("depth").agg(
        F.count("*").alias("n_nodes"),
        F.min("node").alias("min_key"),
        F.max("node").alias("max_key"),
        F.sum("node").alias("sum_keys"),
    )


_PATH_SUM_ORACLE = f"""
WITH RECURSIVE walk AS (
  SELECT c_custkey + 1 AS node, (c_custkey + 1) // {_FANOUT} AS anc,
         CAST(c_custkey + 1 AS BIGINT) AS path_sum, 0 AS depth
  FROM customer
  UNION ALL
  SELECT node, anc // {_FANOUT}, path_sum + anc, depth + 1
  FROM walk WHERE anc >= 1
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(path_sum) AS BIGINT) AS sum_path_keys
FROM walk WHERE anc = 0 GROUP BY depth
"""


def _enable_recursion(spark) -> None:
    """Lift Spark's recursive-CTE safety limits where they exist.

    4.1 ships spark.sql.cteRecursionLevelLimit (default 100 — plenty:
    our walks are log_FANOUT(keyspace) deep) and a row limit that a
    full-table anchor multiplied by depth can exceed at larger SFs, so
    the row limit is raised; both sets are wrapped because the conf
    names are version-dependent."""
    for conf, val in (
        ("spark.sql.cteRecursionLevelLimit", "200"),
        ("spark.sql.cteRecursionRowLimit", "2000000000"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass


@query(
    "sql_recursive_cte_native",
    oracle=_PATH_SUM_ORACLE,
    doc="Native Spark 4.x WITH RECURSIVE ancestor walk carrying an "
    "additive path-sum accumulator; DuckDB recursive CTE oracle.",
)
def sql_recursive_cte_native(spark, sf_dir: str):
    """Ancestor walk via Spark's NATIVE ``WITH RECURSIVE`` (4.x
    UnionLoop operator), carrying a per-row accumulator (the sum of
    ancestor keys along the path) that the pointer-doubling variant
    cannot carry without extra state columns. The frontier shrinks
    every step (rows leave once their chain hits the virtual root),
    each step is one JVM-side projection+filter over the previous
    step's output, and the final aggregate is an ordinary two-phase
    hash agg on depth. Exact integer arithmetic end-to-end."""
    _enable_recursion(spark)
    load(spark, sf_dir, "customer")["customer"].createOrReplaceTempView(
        "customer_rcte"
    )
    return spark.sql(
        f"""
WITH RECURSIVE walk AS (
  SELECT c_custkey + 1 AS node, (c_custkey + 1) DIV {_FANOUT} AS anc,
         CAST(c_custkey + 1 AS BIGINT) AS path_sum, 0 AS depth
  FROM customer_rcte
  UNION ALL
  SELECT node, anc DIV {_FANOUT}, path_sum + anc, depth + 1
  FROM walk WHERE anc >= 1
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(path_sum) AS BIGINT) AS sum_path_keys
FROM walk WHERE anc = 0 GROUP BY depth
"""
    )


_BOM_FANOUT = 8

_BOM_ORACLE = f"""
WITH RECURSIVE bom AS (
  SELECT p_partkey AS component, p_partkey // {_BOM_FANOUT} AS anc,
         CAST(p_partkey % 3 + 1 AS BIGINT) AS qty, 0 AS depth
  FROM part
  UNION ALL
  SELECT component, anc // {_BOM_FANOUT}, qty * (anc % 3 + 1), depth + 1
  FROM bom WHERE anc >= 1
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(qty) AS BIGINT) AS total_required_qty,
       MIN(component) AS min_part, MAX(component) AS max_part
FROM bom WHERE anc = 0 GROUP BY depth
"""


@query(
    "sql_recursive_bom_rollup",
    oracle=_BOM_ORACLE,
    doc="Bill-of-materials explosion: native recursive CTE multiplying "
    "per-edge quantities along each component's path to the root.",
)
def sql_recursive_bom_rollup(spark, sf_dir: str):
    """Bill-of-materials explosion — the classic recursive-CTE workload:
    each component's total required quantity in the root assembly is the
    PRODUCT of per-edge quantities along its ancestor path (component
    qty-in-parent x parent qty-in-grandparent x ...). Multiplicative
    path state is exactly what makes this recursive rather than a
    groupBy: no fixed number of self-joins knows the depth, and the
    product cannot be decomposed into per-level aggregates. The
    hierarchy (parent = partkey DIV 8, edge qty = partkey % 3 + 1) is
    synthesized deterministically so DuckDB re-derives and walks the
    identical tree. Depth is log8(partkeys) so quantities stay far
    under bigint even at 100 TB key ranges."""
    _enable_recursion(spark)
    load(spark, sf_dir, "part")["part"].createOrReplaceTempView("part_rcte")
    return spark.sql(
        f"""
WITH RECURSIVE bom AS (
  SELECT p_partkey AS component, p_partkey DIV {_BOM_FANOUT} AS anc,
         CAST(p_partkey % 3 + 1 AS BIGINT) AS qty, 0 AS depth
  FROM part_rcte
  UNION ALL
  SELECT component, anc DIV {_BOM_FANOUT}, qty * (anc % 3 + 1), depth + 1
  FROM bom WHERE anc >= 1
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(qty) AS BIGINT) AS total_required_qty,
       MIN(component) AS min_part, MAX(component) AS max_part
FROM bom WHERE anc = 0 GROUP BY depth
"""
    )
