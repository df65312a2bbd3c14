"""Recursive / hierarchical queries: ancestor-path depth without a
recursive engine primitive.

Spark has no WITH RECURSIVE, but hierarchy walks are expressible as a
POINTER-DOUBLING loop of self-joins: each round, every node's ancestor
pointer jumps twice as far up the tree (ptr <- ptr(ptr), dist <- dist +
dist(ptr)), so a hierarchy of depth D resolves in ceil(log2(D)) rounds
-- NOT D rounds like naive parent-chasing. At 100 TB each round is one
shuffle join on node id over a table with exactly one row per node (the
frontier never grows, unlike a transitive-closure expansion), and
per-round lineage is truncated with localCheckpoint exactly like
operators/graph.py connected components. A 12-level hierarchy over 10^10
keys is 4 rounds.

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
